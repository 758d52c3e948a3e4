"""Mamba-2 block (the vendored library's second SSM family).

Reference: mamba_ssm/modules/mamba2.py:35-63 — grouped B/C heads, per-head
scalar decay, xBC shared causal conv, gated RMSNorm before out_proj, and
the TP hooks (process_group/sequence_parallel) which here are sharding
rules instead.  Compute rides ops/ssd.py's chunked scan.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.scan import causal_conv1d, causal_conv1d_update
from ..ops.ssd import ssd_chunked, ssd_state_update
from ..utils.params import normal_init, ones, zeros


@dataclasses.dataclass(frozen=True)
class Mamba2Config:
    d_model: int = 256
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 64
    dt_min: float = 0.001
    dt_max: float = 0.1
    A_init_range: Tuple[float, float] = (1.0, 16.0)
    norm_eps: float = 1e-5

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def nheads(self) -> int:
        return self.d_inner // self.headdim

    @property
    def d_xbc(self) -> int:
        return self.d_inner + 2 * self.ngroups * self.d_state


class Mamba2State(NamedTuple):
    conv: jax.Array  # (B, d_xbc, d_conv)
    ssm: jax.Array   # (B, H, P, N)


def init_mamba2_state(cfg: Mamba2Config, batch: int) -> Mamba2State:
    return Mamba2State(
        conv=jnp.zeros((batch, cfg.d_xbc, cfg.d_conv), jnp.float32),
        ssm=jnp.zeros((batch, cfg.nheads, cfg.headdim, cfg.d_state), jnp.float32),
    )


def init_mamba2_params(key, cfg: Mamba2Config, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    d_in_proj = 2 * cfg.d_inner + 2 * cfg.ngroups * cfg.d_state + cfg.nheads
    lo, hi = cfg.A_init_range
    A = jax.random.uniform(ks[2], (cfg.nheads,), jnp.float32, lo, hi)
    dt = jnp.exp(
        jax.random.uniform(ks[3], (cfg.nheads,), jnp.float32)
        * (math.log(cfg.dt_max) - math.log(cfg.dt_min))
        + math.log(cfg.dt_min)
    )
    dt = jnp.maximum(dt, 1e-4)
    bound = 1.0 / math.sqrt(cfg.d_conv)
    return {
        "in_proj": {"weight": normal_init(ks[0], (d_in_proj, cfg.d_model), std=0.02, dtype=dtype)},
        "conv1d": {
            "weight": jax.random.uniform(ks[4], (cfg.d_xbc, cfg.d_conv), dtype, -bound, bound),
            "bias": zeros((cfg.d_xbc,), dtype),
        },
        "dt_bias": (dt + jnp.log(-jnp.expm1(-dt))).astype(jnp.float32),
        "A_log": jnp.log(A),
        "D": ones((cfg.nheads,), jnp.float32),
        "norm": {"weight": ones((cfg.d_inner,), dtype)},
        "out_proj": {"weight": normal_init(ks[5], (cfg.d_model, cfg.d_inner), std=0.02, dtype=dtype)},
    }


def _gated_rms_norm(x, z, weight, eps):
    """RMSNorm(x * silu(z)) * w — the layernorm_gated kernel's math."""
    y = x * jax.nn.silu(z.astype(jnp.float32))
    var = jnp.mean(jnp.square(y), axis=-1, keepdims=True)
    return (y * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(x.dtype)


def _split_proj(cfg: Mamba2Config, zxbcdt):
    return jnp.split(
        zxbcdt,
        [cfg.d_inner, cfg.d_inner + cfg.d_xbc],
        axis=-1,
    )  # z, xBC, dt


def mamba2_forward(
    params, cfg: Mamba2Config, u: jax.Array,  # (B, L, d_model)
    state: Optional[Mamba2State] = None,
    return_state: bool = False,
):
    b, l, _ = u.shape
    zxbcdt = u @ params["in_proj"]["weight"].T.astype(u.dtype)
    z, xBC, dt = _split_proj(cfg, zxbcdt)

    xBC_t = xBC.transpose(0, 2, 1)
    if state is not None:
        hist = state.conv[:, :, 1:].astype(xBC_t.dtype)
        ext = jnp.concatenate([hist, xBC_t], axis=2)
        xBC_conv = causal_conv1d(
            ext, params["conv1d"]["weight"], params["conv1d"]["bias"]
        )[:, :, -l:]
        pad_src = ext
        h0 = state.ssm
    else:
        xBC_conv = causal_conv1d(
            xBC_t, params["conv1d"]["weight"], params["conv1d"]["bias"]
        )
        pad_src = xBC_t
        h0 = None
    xBC_conv = xBC_conv.transpose(0, 2, 1)

    x, B, C = jnp.split(
        xBC_conv, [cfg.d_inner, cfg.d_inner + cfg.ngroups * cfg.d_state], axis=-1
    )
    x = x.reshape(b, l, cfg.nheads, cfg.headdim)
    B = B.reshape(b, l, cfg.ngroups, cfg.d_state)
    C = C.reshape(b, l, cfg.ngroups, cfg.d_state)
    dt_sp = jax.nn.softplus(dt.astype(jnp.float32) + params["dt_bias"][None, None])
    A = -jnp.exp(params["A_log"])

    # pad L to the chunk size for the chunked scan
    pad = (-l) % cfg.chunk_size
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt_sp = jnp.pad(dt_sp, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    y, last = ssd_chunked(
        x, dt_sp, A, B, C, chunk=cfg.chunk_size, D=params["D"], h0=h0,
        return_last_state=True,
    )
    y = y[:, :l].reshape(b, l, cfg.d_inner)

    y = _gated_rms_norm(y, z, params["norm"]["weight"], cfg.norm_eps)
    out = y @ params["out_proj"]["weight"].T.astype(y.dtype)
    if return_state:
        padc = jnp.pad(pad_src, ((0, 0), (0, 0), (max(cfg.d_conv - pad_src.shape[-1], 0), 0)))
        new_state = Mamba2State(conv=padc[:, :, -cfg.d_conv:], ssm=last)
        return out, new_state
    return out


def mamba2_step(
    params, cfg: Mamba2Config, u: jax.Array,  # (B, d_model)
    state: Mamba2State,
) -> Tuple[jax.Array, Mamba2State]:
    """Single-token recurrent step."""
    zxbcdt = u @ params["in_proj"]["weight"].T.astype(u.dtype)
    z, xBC, dt = _split_proj(cfg, zxbcdt)
    xBC_c, conv_state = causal_conv1d_update(
        xBC, state.conv, params["conv1d"]["weight"], params["conv1d"]["bias"]
    )
    b = u.shape[0]
    x, B, C = jnp.split(
        xBC_c, [cfg.d_inner, cfg.d_inner + cfg.ngroups * cfg.d_state], axis=-1
    )
    x = x.reshape(b, cfg.nheads, cfg.headdim)
    B = B.reshape(b, cfg.ngroups, cfg.d_state)
    C = C.reshape(b, cfg.ngroups, cfg.d_state)
    dt_sp = jax.nn.softplus(dt.astype(jnp.float32) + params["dt_bias"][None])
    A = -jnp.exp(params["A_log"])
    y, ssm = ssd_state_update(state.ssm, x, dt_sp, A, B, C, D=params["D"])
    y = y.reshape(b, cfg.d_inner)
    y = _gated_rms_norm(y[:, None, :], z[:, None, :], params["norm"]["weight"], cfg.norm_eps)[:, 0]
    out = y @ params["out_proj"]["weight"].T.astype(y.dtype)
    return out, Mamba2State(conv=conv_state, ssm=ssm)
