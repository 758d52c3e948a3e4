"""LoRA fine-tuning as a parameterization over the base tree.

Replaces the reference's peft integration (train_new_stream.py:813-829,
lora_enable path) with a functional formulation: a mirror tree of {A, B}
pairs for every attention/MLP projection in the decoder, merged on the fly
inside the loss (W_eff = W + alpha/r * B @ A); only the LoRA leaves train.
Merging for export reuses the same math.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# decoder projections peft targets by default for Mistral-family models
_TARGETS = ("q", "k", "v", "o")
_MLP_TARGETS = ("gate", "up", "down")


def _leaf_shape(leaf: Dict) -> Tuple[int, int, int]:
    """(L, out, in) of a projection leaf — full-precision, int8, or packed
    int4 base (QLoRA: LoRA factors over a quantized frozen weight)."""
    if "weight" in leaf:
        return leaf["weight"].shape
    if "w_int8" in leaf:
        return leaf["w_int8"].shape
    L, out_f, half_in = leaf["w_int4"].shape
    return (L, out_f, half_in * 2)


def init_lora_params(key, text_params, r: int = 128, dtype=jnp.float32) -> Dict:
    """LoRA trees for stacked decoder layers.  A ~ N(0, 0.02), B = 0 (so the
    initial delta is zero, matching peft)."""
    lora = {"layers": {}}
    layers = text_params["layers"]
    keys = jax.random.split(key, len(_TARGETS) + len(_MLP_TARGETS))
    ki = 0
    for name in _TARGETS:
        L, out_f, in_f = _leaf_shape(layers[name])
        lora["layers"][name] = {
            "A": jax.random.normal(keys[ki], (L, r, in_f), dtype) * 0.02,
            "B": jnp.zeros((L, out_f, r), dtype),
        }
        ki += 1
    if "mlp" in layers:
        lora["layers"]["mlp"] = {}
        for name in _MLP_TARGETS:
            L, out_f, in_f = _leaf_shape(layers["mlp"][name])
            lora["layers"]["mlp"][name] = {
                "A": jax.random.normal(keys[ki], (L, r, in_f), dtype) * 0.02,
                "B": jnp.zeros((L, out_f, r), dtype),
            }
            ki += 1
    return lora


def _base_weight(leaf):
    """Full-precision view of a projection leaf's base weight — quantized
    (int8/int4) bases dequantize first, so a QLoRA run (--bits + lora) can
    still EXPORT merged weights (previously KeyError 'weight')."""
    if "weight" in leaf:
        return leaf["weight"]
    if "w_int8" in leaf:
        from ..utils.quantize import dequantize_linear_weight

        return dequantize_linear_weight(leaf)
    if "w_int4" in leaf:
        from ..utils.quantize import dequantize_linear_weight_int4

        return dequantize_linear_weight_int4(leaf)
    if "w_int4pc" in leaf:
        from ..utils.quantize import dequantize_linear_weight_int4_pc

        return dequantize_linear_weight_int4_pc(leaf)
    raise KeyError(f"no base weight in leaf with keys {sorted(leaf)}")


def _merged_leaf(leaf, ab, scaling):
    w = _base_weight(leaf)
    delta = jnp.einsum("lor,lri->loi", ab["B"].astype(w.dtype),
                       ab["A"].astype(w.dtype))
    out = {k: v for k, v in leaf.items()
           if k in ("bias",)}  # drop quantized leaves: merged W is fp
    out["weight"] = w + scaling * delta
    return out


def apply_lora(text_params, lora, scaling: float):
    """Return a new text-param tree with W + scaling * B @ A merged in.
    Runs inside jit — XLA fuses the small matmuls into the update.
    Quantized bases are dequantized into full-precision merged weights
    (the export path; training over quantized bases uses attach_lora)."""
    out = dict(text_params)
    layers = dict(text_params["layers"])
    for name, ab in lora["layers"].items():
        if name == "mlp":
            mlp = dict(layers["mlp"])
            for mname, mab in ab.items():
                mlp[mname] = _merged_leaf(mlp[mname], mab, scaling)
            layers["mlp"] = mlp
        else:
            layers[name] = _merged_leaf(layers[name], ab, scaling)
    out["layers"] = layers
    return out


def attach_lora(text_params, lora, scaling: float):
    """Matmul-time LoRA: return a text tree whose projection leaves carry
    the {A, B} factors next to the base weight; utils.params.linear adds
    x@Aᵀ@Bᵀ·scaling at apply time.  Unlike apply_lora this never
    materializes a merged weight tree — the base may rest quantized
    (int8/int4), which is the QLoRA memory model (reference bits+lora,
    train_new_stream.py:694-712 + :813-829).  The attached leaves reference
    the SAME arrays as `lora`, so gradients flow to the lora tree."""

    def attach(leaf, ab):
        # (L,)-shaped scale: stacked decoder layers go through lax.scan,
        # which slices every leaf along the leading layer axis
        s = jnp.full((ab["A"].shape[0],), scaling, jnp.float32)
        return {**leaf, "lora_a": ab["A"], "lora_b": ab["B"], "lora_scale": s}

    out = dict(text_params)
    layers = dict(text_params["layers"])
    for name, ab in lora["layers"].items():
        if name == "mlp":
            mlp = dict(layers["mlp"])
            for mname, mab in ab.items():
                mlp[mname] = attach(mlp[mname], mab)
            layers["mlp"] = mlp
        else:
            layers[name] = attach(layers[name], ab)
    out["layers"] = layers
    return out


def merge_lora_into_params(params, lora, r: int, alpha: float):
    """Permanent merge for export (reference merge_and_unload,
    model/builder.py:105-108)."""
    scaling = alpha / r
    out = dict(params)
    out["text"] = apply_lora(params["text"], lora, scaling)
    return out
