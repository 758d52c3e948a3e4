"""Weight-only int8 quantization for serving.

The per-frame gate LM is weight-read-bound (~2 GB/frame single-stream);
storing its matmul weights as int8 with per-output-channel scales lets XLA
fuse the dequant into the dot's operand read — measured 1.46x on a v5e
matvec.  Quantized leaves become {"w_int8": (out, in) int8,
"scale": (out,) fp32}; utils.params.linear dispatches on the key.

(The reference's quantization story is bitsandbytes nf4 for QLoRA loading,
model/builder.py:43-52 — a different role; this is the serving-path
optimization BASELINE.json's 100 fps budget motivates.)
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def quantize_linear_weight(w: jax.Array) -> dict:
    """(..., out, in) float → int8 + per-out-channel scale (symmetric absmax).
    Works on single weights (out, in) and stacked layers (L, out, in) alike —
    the reduction is always over the input (last) axis."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"w_int8": q, "scale": scale[..., 0]}


def dequantize_linear_weight(p: dict, dtype=jnp.float32) -> jax.Array:
    return (p["w_int8"].astype(jnp.float32) * p["scale"][..., None]).astype(dtype)


def quantize_vit_params(vit_params: dict) -> dict:
    """int8-MXU quantization of the ViT encoder (the fast_vision="int8"
    serving tier).  Unlike the weight-only gate quant, the ViT is
    COMPUTE-bound at serving batch sizes, so the win is the v5e's 2x int8
    MXU throughput: activations are dynamically quantized per sample and the
    matmul runs int8xint8→int32 (models/vit.py dispatches on "w_int8").
    Measured on one v5e chip: 4.46 → 3.10 ms per ViT-L/14-336 frame (B=1),
    24.4 → 14.5 ms at B=8; features within 2.2% rms of bf16 (cos > 0.9997).
    Embeddings and layer norms stay full precision."""
    out = dict(vit_params)
    layers = dict(out["layers"])
    for name in ("q", "k", "v", "o", "fc1", "fc2"):
        leaf = layers[name]
        q = quantize_linear_weight(leaf["weight"])
        if "bias" in leaf:
            q["bias"] = leaf["bias"]
        layers[name] = q
    out["layers"] = layers
    return out


def quantize_gate_params(cls_net_params: dict) -> dict:
    """Quantize every attention/MLP projection of the gate LM in place
    (embeddings, norms and the 2-way lm_head stay full precision)."""
    def quant(leaf: dict) -> dict:
        q = quantize_linear_weight(leaf["weight"])
        if "bias" in leaf:  # qkv-bias backbones (Qwen2): bias stays fp
            q["bias"] = leaf["bias"]
        return q

    out = dict(cls_net_params)
    layers = dict(out["layers"])
    for name in ("q", "k", "v", "o"):
        layers[name] = quant(layers[name])
    if "mlp" in layers:
        mlp = dict(layers["mlp"])
        for name in ("gate", "up", "down"):
            mlp[name] = quant(mlp[name])
        layers["mlp"] = mlp
    out["layers"] = layers
    return out
