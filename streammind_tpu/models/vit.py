"""CLIP ViT vision tower (ViT-L/14-336), TPU-native.

Replaces the reference's frozen HF CLIPVisionModel
(/root/reference/streammind/model/multimodal_encoder/clip_encoder.py:7-60):
  - taps hidden layer ``select_layer`` (default -2)
  - drops the CLS token ("patch" feature select, clip_encoder.py:31-39)
  - output: (frames, 576, 1024)

TPU-first details: the patch embedding conv is expressed as a reshape +
matmul (one big MXU op instead of a strided conv), the layer loop is a
lax.scan over stacked layer params (single compiled block), and attention
goes through the shared attention dispatcher (flash kernel on TPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import VisionConfig
from ..ops.attention import attention
from ..ops.norms import layer_norm
from ..utils.params import (
    linear,
    normal_init,
    ones,
    stack_layers,
    torch_linear_init,
    zeros,
)


def quick_gelu(x):
    """OpenAI CLIP activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def init_vit_params(key, cfg: VisionConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 4)
    d = cfg.hidden_size
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    num_pos = cfg.num_patches + 1

    def layer_init(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": {"weight": ones((d,), dtype), "bias": zeros((d,), dtype)},
            "q": torch_linear_init(ks[0], d, d, dtype=dtype),
            "k": torch_linear_init(ks[1], d, d, dtype=dtype),
            "v": torch_linear_init(ks[2], d, d, dtype=dtype),
            "o": torch_linear_init(ks[3], d, d, dtype=dtype),
            "ln2": {"weight": ones((d,), dtype), "bias": zeros((d,), dtype)},
            "fc1": torch_linear_init(ks[4], cfg.intermediate_size, d, dtype=dtype),
            "fc2": torch_linear_init(ks[5], d, cfg.intermediate_size, dtype=dtype),
        }

    return {
        "class_embedding": normal_init(keys[0], (d,), std=d**-0.5, dtype=dtype),
        "patch_embedding": normal_init(keys[1], (d, patch_dim), std=0.02, dtype=dtype),
        "position_embedding": normal_init(keys[2], (num_pos, d), std=0.02, dtype=dtype),
        "pre_layernorm": {"weight": ones((d,), dtype), "bias": zeros((d,), dtype)},
        "layers": stack_layers(
            [layer_init(keys[4 + i]) for i in range(cfg.num_layers)]
        ),
    }


def _embed(params, cfg: VisionConfig, pixel_values: jax.Array) -> jax.Array:
    """(B, 3, H, W) → (B, 1+P, D): patchify as reshape+matmul, prepend CLS."""
    b = pixel_values.shape[0]
    p = cfg.patch_size
    g = cfg.image_size // p
    x = pixel_values.reshape(b, 3, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, 3 * p * p)
    x = x @ params["patch_embedding"].T.astype(x.dtype)  # (B, P, D)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype)[None, None], (b, 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["position_embedding"].astype(x.dtype)[None]


def _linear_q(x, p):
    """Encoder-layer linear.  Full-precision weights defer to utils.linear;
    int8 leaves (utils.quantize.quantize_vit_params) run the matmul on the
    int8 MXU path (2x peak on v5e): activations are dynamically quantized
    PER TOKEN (symmetric absmax over the feature axis — the row-local
    reduce fuses with the quantize into a single pass over the
    activations, where a per-sample absmax forced a second full pass; it
    is also a strictly finer grid, so accuracy improves), int8xint8→int32,
    then the rank-1 rescale act_scale ⊗ weight_scale fuses into the
    matmul epilogue."""
    if "w_int8" not in p:
        return linear(x, p)
    x32 = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    ax = jnp.maximum(ax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x32 / ax), -127, 127).astype(jnp.int8)
    y = jnp.einsum("bsd,od->bso", xq, p["w_int8"], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * ax * p["scale"].astype(jnp.float32)[None, None, :]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def fuse_vit_qkv(vit_params: dict) -> dict:
    """Concatenate each layer's q/k/v projections into one (3D, D) weight.

    Bit-identical to the three separate matmuls: every output column of a
    GEMM is an independent dot over the SAME contraction axis, so fusing
    along the output dim changes no sum order.  Saves two reads of the
    ln1 activations per layer — and on the int8 tier two of the three
    dynamic-quantize passes.  Works on full-precision and int8-quantized
    trees alike (leaves are layer-stacked: weight/w_int8 (L, out, in),
    scale/bias (L, out)).  Serving-path transform (StreamMindEngine);
    training and checkpoint I/O keep the separate q/k/v layout."""
    layers = vit_params.get("layers", {})
    if "q" not in layers:
        return vit_params
    out = dict(vit_params)
    layers = dict(layers)
    q, k, v = layers.pop("q"), layers.pop("k"), layers.pop("v")
    fused = {}
    wkey = "w_int8" if "w_int8" in q else "weight"
    fused[wkey] = jnp.concatenate([q[wkey], k[wkey], v[wkey]], axis=-2)
    if "scale" in q:
        fused["scale"] = jnp.concatenate([q["scale"], k["scale"], v["scale"]], axis=-1)
    if "bias" in q:
        fused["bias"] = jnp.concatenate([q["bias"], k["bias"], v["bias"]], axis=-1)
    layers["qkv"] = fused
    out["layers"] = layers
    return out


def _encoder_layer(x, lp, cfg: VisionConfig, attn_impl: str):
    b, s, d = x.shape
    h = cfg.num_heads
    hd = cfg.head_dim
    res = x
    y = layer_norm(x, lp["ln1"]["weight"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    if "qkv" in lp:
        qkv = _linear_q(y, lp["qkv"]).reshape(b, s, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:
        q = _linear_q(y, lp["q"]).reshape(b, s, h, hd)
        k = _linear_q(y, lp["k"]).reshape(b, s, h, hd)
        v = _linear_q(y, lp["v"]).reshape(b, s, h, hd)
    o = attention(q, k, v, causal=False, impl=attn_impl).reshape(b, s, d)
    x = res + _linear_q(o, lp["o"])
    res = x
    y = layer_norm(x, lp["ln2"]["weight"], lp["ln2"]["bias"], cfg.layer_norm_eps)
    y = _linear_q(quick_gelu(_linear_q(y, lp["fc1"])), lp["fc2"])
    return res + y


def vit_forward(
    params,
    cfg: VisionConfig,
    pixel_values: jax.Array,
    attn_impl: str = "auto",
    unroll=1,
) -> jax.Array:
    """Frames → patch features at the selected hidden layer.

    pixel_values: (B, 3, H, W) → (B, 576, hidden) with select_feature='patch'.

    unroll: lax.scan unroll factor over the layer stack; "full" unrolls
    every layer.  At small batch the tower is weight-bandwidth bound and
    the rolled scan serializes each layer's HBM weight fetch behind the
    previous layer's compute — full unroll lets XLA software-pipeline the
    fetches (measured on v5e B=1: 4.8 -> 2.8 ms bf16, 2.9 -> 2.2 ms int8;
    B=8 is compute-bound and unaffected).  Same math either way — output
    differs from the rolled scan only at bf16 fusion-rounding level,
    within the bf16-vs-fp32 noise floor.  Keep the default (rolled) for
    training: full unroll multiplies compile time and remat granularity.
    """
    x = _embed(params, cfg, pixel_values)
    x = layer_norm(
        x,
        params["pre_layernorm"]["weight"],
        params["pre_layernorm"]["bias"],
        cfg.layer_norm_eps,
    )

    # hidden_states[select_layer] with -2 == run all but the last encoder
    # layer; the tap point is static, so slice the stacked params and scan
    # only the layers that contribute (no wasted final block).
    n_run = cfg.num_layers + cfg.select_layer + 1 if cfg.select_layer < 0 else cfg.select_layer
    layers = jax.tree.map(lambda a: a[:n_run], params["layers"])

    def body(h, lp):
        return _encoder_layer(h, lp, cfg, attn_impl), None

    x, _ = jax.lax.scan(
        body, x, layers, unroll=n_run if unroll == "full" else unroll
    )

    if cfg.select_feature == "patch":
        return x[:, 1:]
    if cfg.select_feature == "cls_patch":
        return x
    raise ValueError(f"Unexpected select feature: {cfg.select_feature}")
