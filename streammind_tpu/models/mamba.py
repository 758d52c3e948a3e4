"""Mamba-1 block + VideoMamba stack (the temporal memory).

Reimplements, TPU-native, the math of mamba_ssm 2.2.2's Mamba module
(/root/reference/streammind/model/mamba_ssm/modules/mamba_simple.py:31-255)
and the prenorm Block + final-norm stack used by VideoMamba
(/root/reference/streammind/model/multimodal_projector/ssm.py:28-100,
 create_block defaults: LayerNorm, no fused_add_norm, residual fp32).

Two execution modes share one parameter tree:
  * ``mamba_forward``  — full-sequence scan (training / prefill)
  * ``mamba_step``     — O(1) carried-state update (streaming perception)
and the invariant `step∘step∘…  == forward` is tested directly.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MambaConfig
from ..ops.norms import layer_norm
from ..ops.scan import (
    causal_conv1d,
    causal_conv1d_update,
    selective_scan,
    selective_state_update,
)
from ..utils.params import normal_init, ones, torch_linear_init, zeros


class MambaState(NamedTuple):
    """Carried streaming state for one Mamba layer stack.

    conv: (n_layers, B, d_inner, d_conv) rolling conv window
    ssm:  (n_layers, B, d_inner, d_state) fp32 SSM state
    """

    conv: jax.Array
    ssm: jax.Array


def init_mamba_state(cfg: MambaConfig, batch: int, dtype=jnp.float32) -> MambaState:
    return MambaState(
        conv=jnp.zeros((cfg.n_layers, batch, cfg.d_inner, cfg.d_conv), dtype),
        ssm=jnp.zeros((cfg.n_layers, batch, cfg.d_inner, cfg.d_state), jnp.float32),
    )


def init_mamba_block_params(key, cfg: MambaConfig, dtype=jnp.float32):
    """One Mamba mixer: matches reference init (dt special init, S4D-real A)."""
    ks = jax.random.split(key, 7)
    d_in = cfg.d_inner
    dt_rank = cfg.dt_rank_

    # dt_proj: uniform(-std, std) weights; bias = softplus^-1(dt) with
    # dt ~ LogUniform(dt_min, dt_max) clamped at dt_init_floor
    # (mamba_simple.py:84-101).
    dt_std = dt_rank**-0.5
    dt_w = jax.random.uniform(ks[0], (d_in, dt_rank), dtype, -dt_std, dt_std)
    dt = jnp.exp(
        jax.random.uniform(ks[1], (d_in,), jnp.float32)
        * (math.log(cfg.dt_max) - math.log(cfg.dt_min))
        + math.log(cfg.dt_min)
    )
    dt = jnp.maximum(dt, cfg.dt_init_floor)
    inv_dt = dt + jnp.log(-jnp.expm1(-dt))

    # S4D-real: A[d, n] = -(n+1)  (stored as log).
    A_log = jnp.log(
        jnp.broadcast_to(jnp.arange(1, cfg.d_state + 1, dtype=jnp.float32), (d_in, cfg.d_state))
    )

    in_proj = {"weight": normal_init(ks[2], (2 * d_in, cfg.d_model), std=0.02, dtype=dtype)}
    if cfg.bias:
        in_proj["bias"] = zeros((2 * d_in,), dtype)
    out_proj = torch_linear_init(ks[3], cfg.d_model, d_in, bias=cfg.bias, dtype=dtype)

    # torch Conv1d default kaiming_uniform(a=sqrt(5)): bound = sqrt(1/fan_in)
    # with fan_in = d_conv for a depthwise kernel
    conv = {
        "weight": jax.random.uniform(
            ks[4], (d_in, cfg.d_conv), dtype,
            -math.sqrt(1.0 / cfg.d_conv),
            math.sqrt(1.0 / cfg.d_conv),
        )
    }
    if cfg.conv_bias:
        bound = 1.0 / math.sqrt(cfg.d_conv)
        conv["bias"] = jax.random.uniform(ks[5], (d_in,), dtype, -bound, bound)

    return {
        "in_proj": in_proj,
        "out_proj": out_proj,
        "conv1d": conv,
        "x_proj": {
            "weight": normal_init(ks[6], (dt_rank + 2 * cfg.d_state, d_in), std=0.02, dtype=dtype)
        },
        "dt_proj": {"weight": dt_w, "bias": inv_dt.astype(dtype)},
        "A_log": A_log,  # kept fp32
        "D": ones((d_in,), jnp.float32),
        "norm": {"weight": ones((cfg.d_model,), dtype), "bias": zeros((cfg.d_model,), dtype)},
    }


def init_video_mamba_params(key, cfg: MambaConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.n_layers + 1)
    return {
        "blocks": [init_mamba_block_params(keys[i], cfg, dtype) for i in range(cfg.n_layers)],
        "final_norm": {"weight": ones((cfg.d_model,), dtype), "bias": zeros((cfg.d_model,), dtype)},
    }


def _mixer_forward(
    bp, cfg: MambaConfig, x: jax.Array, impl: str,
    conv_state0: Optional[jax.Array] = None,
    ssm_state0: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple]:
    """Core Mamba mixer over (B, L, D) → (B, L, D) + final (conv, ssm) state.

    With conv_state0/ssm_state0 the block continues a stream mid-flight
    (chunked prefill): the conv sees the carried d_conv-1 input window and
    the scan starts from the carried SSM state.
    """
    b, l, _ = x.shape
    dt_rank = cfg.dt_rank_

    xz = x @ bp["in_proj"]["weight"].T.astype(x.dtype)  # (B, L, 2*Din)
    if "bias" in bp["in_proj"]:
        xz = xz + bp["in_proj"]["bias"].astype(x.dtype)
    xs, z = jnp.split(xz, 2, axis=-1)
    xs_t = xs.transpose(0, 2, 1)  # (B, Din, L)

    conv_w = bp["conv1d"]["weight"]
    conv_b = bp["conv1d"].get("bias")
    if conv_state0 is not None:
        # prepend the carried window, convolve valid, keep the last L steps
        hist = conv_state0[:, :, 1:].astype(xs_t.dtype)  # last d_conv-1 inputs
        ext = jnp.concatenate([hist, xs_t], axis=2)
        xconv = causal_conv1d(ext, conv_w, conv_b, activation="silu")[:, :, -l:]
        pad_src = ext
    else:
        xconv = causal_conv1d(xs_t, conv_w, conv_b, activation="silu")  # (B, Din, L)
        pad_src = xs_t

    # Final conv window state: last d_conv inputs (pre-activation), zero-padded.
    pad = jnp.pad(pad_src, ((0, 0), (0, 0), (max(cfg.d_conv - pad_src.shape[-1], 0), 0)))
    conv_state = pad[:, :, -cfg.d_conv:]

    x_dbl = xconv.transpose(0, 2, 1) @ bp["x_proj"]["weight"].T.astype(x.dtype)  # (B,L,R+2N)
    dt, Bc, Cc = jnp.split(x_dbl, [dt_rank, dt_rank + cfg.d_state], axis=-1)
    dt = dt @ bp["dt_proj"]["weight"].T.astype(x.dtype)  # (B, L, Din)

    A = -jnp.exp(bp["A_log"])  # (Din, N) fp32

    y, last_state = selective_scan(
        xconv,
        dt.transpose(0, 2, 1),
        A,
        Bc.transpose(0, 2, 1),
        Cc.transpose(0, 2, 1),
        D=bp["D"],
        z=z.transpose(0, 2, 1),
        delta_bias=bp["dt_proj"]["bias"],
        delta_softplus=True,
        return_last_state=True,
        h0=ssm_state0,
        impl=impl,
    )
    out = y.transpose(0, 2, 1) @ bp["out_proj"]["weight"].T.astype(x.dtype)
    if "bias" in bp["out_proj"]:
        out = out + bp["out_proj"]["bias"].astype(x.dtype)
    return out, (conv_state, last_state)


def _mixer_step(bp, cfg: MambaConfig, x: jax.Array, conv_state, ssm_state):
    """Single-token mixer step (B, D) → (B, D); the per-frame hot path."""
    dt_rank = cfg.dt_rank_
    xz = x @ bp["in_proj"]["weight"].T.astype(x.dtype)
    if "bias" in bp["in_proj"]:
        xz = xz + bp["in_proj"]["bias"].astype(x.dtype)
    xs, z = jnp.split(xz, 2, axis=-1)

    xc, conv_state = causal_conv1d_update(
        xs, conv_state, bp["conv1d"]["weight"], bp["conv1d"].get("bias")
    )

    x_dbl = xc @ bp["x_proj"]["weight"].T.astype(x.dtype)
    dt, Bc, Cc = jnp.split(x_dbl, [dt_rank, dt_rank + cfg.d_state], axis=-1)
    dt = dt @ bp["dt_proj"]["weight"].T.astype(x.dtype)
    A = -jnp.exp(bp["A_log"])

    y, ssm_state = selective_state_update(
        ssm_state, xc, dt, A, Bc, Cc,
        D=bp["D"], z=z, dt_bias=bp["dt_proj"]["bias"], dt_softplus=True,
    )
    out = y @ bp["out_proj"]["weight"].T.astype(x.dtype)
    if "bias" in bp["out_proj"]:
        out = out + bp["out_proj"]["bias"].astype(x.dtype)
    return out, conv_state, ssm_state


def video_mamba_forward(
    params,
    cfg: MambaConfig,
    x: jax.Array,  # (B, L, d_model)
    state: Optional[MambaState] = None,
    impl: str = "auto",
) -> Tuple[jax.Array, MambaState]:
    """VideoMamba: prenorm Block stack + residual + final LayerNorm.

    Block semantics (mamba_ssm block.py:11): residual accumulates in fp32;
    hidden = mixer(norm(residual)); VideoMamba then adds the last hidden to
    the residual and applies its own LayerNorm (ssm.py:80-91).
    """
    hidden = x
    residual = None
    conv_states, ssm_states = [], []
    for i, bp in enumerate(params["blocks"]):
        # residual accumulates in fp32 (mamba_ssm create_block
        # residual_in_fp32=True) — under bf16 params the stream would
        # otherwise drift from the reference across blocks
        residual = (hidden.astype(jnp.float32) if residual is None
                    else hidden.astype(jnp.float32) + residual)
        normed = layer_norm(
            residual, bp["norm"]["weight"], bp["norm"]["bias"], cfg.layer_norm_eps
        ).astype(x.dtype)
        hidden, (cs, ss) = _mixer_forward(
            bp, cfg, normed, impl,
            conv_state0=state.conv[i] if state is not None else None,
            ssm_state0=state.ssm[i] if state is not None else None,
        )
        conv_states.append(cs)
        ssm_states.append(ss)
    residual = (hidden.astype(jnp.float32) + residual
                if residual is not None else hidden.astype(jnp.float32))
    out = layer_norm(
        residual,
        params["final_norm"]["weight"],
        params["final_norm"]["bias"],
        cfg.layer_norm_eps,
    ).astype(x.dtype)
    new_state = MambaState(
        conv=jnp.stack(conv_states, 0), ssm=jnp.stack(ssm_states, 0)
    )
    return out, new_state


def video_mamba_step(
    params,
    cfg: MambaConfig,
    x: jax.Array,  # (B, d_model) one frame token
    state: MambaState,
) -> Tuple[jax.Array, MambaState]:
    """One streaming step through the block stack with carried state."""
    hidden = x
    residual = None
    conv_out, ssm_out = [], []
    for i, bp in enumerate(params["blocks"]):
        # fp32 residual stream — must match video_mamba_forward exactly
        # (the stream==scan invariant tests compare the two paths)
        residual = (hidden.astype(jnp.float32) if residual is None
                    else hidden.astype(jnp.float32) + residual)
        normed = layer_norm(
            residual[:, None, :], bp["norm"]["weight"], bp["norm"]["bias"], cfg.layer_norm_eps
        )[:, 0, :].astype(x.dtype)
        hidden, cs, ss = _mixer_step(bp, cfg, normed, state.conv[i], state.ssm[i])
        conv_out.append(cs)
        ssm_out.append(ss)
    residual = (hidden.astype(jnp.float32) + residual
                if residual is not None else hidden.astype(jnp.float32))
    out = layer_norm(
        residual[:, None, :],
        params["final_norm"]["weight"],
        params["final_norm"]["bias"],
        cfg.layer_norm_eps,
    )[:, 0, :].astype(x.dtype)
    return out, MambaState(conv=jnp.stack(conv_out, 0), ssm=jnp.stack(ssm_out, 0))
