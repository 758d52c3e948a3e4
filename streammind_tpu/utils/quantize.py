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


def quantize_linear_weight_int4(w: jax.Array, group: int = 64) -> dict:
    """(..., out, in) float → packed int4 with group-wise scales.

    The TPU-native analogue of the reference's bitsandbytes nf4 loading
    (model/builder.py:43-52, BitsAndBytesConfig bnb_4bit_quant_type='nf4'):
    a memory-footprint loader path — weights live at 4 bits + one fp32 scale
    per `group` inputs, dequantized on the fly at matmul time.  Symmetric
    int4 (±7) instead of the nf4 codebook (no LUT gathers on the VPU), two
    nibbles per int8 byte (this platform has no native S4 storage).
    """
    w32 = w.astype(jnp.float32)
    din = w32.shape[-1]
    if din % 2 != 0:
        # nibble packing needs an even input dim; keep such (rare) layers
        # full precision rather than mispacking
        return {"weight": w}
    if din % group != 0:
        group = din  # fall back to per-channel
    wg = w32.reshape(*w32.shape[:-1], din // group, group)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-1) / 7.0, 1e-8)  # (..., out, n_groups)
    q = jnp.clip(jnp.round(wg / scale[..., None]), -7, 7).astype(jnp.int8)
    q = q.reshape(*w32.shape[:-1], din)
    lo = q[..., 0::2]
    hi = q[..., 1::2]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)), jnp.left_shift(hi, 4)
    ).astype(jnp.int8)  # (..., out, in//2)
    return {"w_int4": packed, "scale4": scale}


def dequantize_linear_weight_int4(p: dict, dtype=jnp.float32) -> jax.Array:
    packed = p["w_int4"]
    # sign-extend each nibble: arithmetic shifts on int8
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    q = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)  # (..., out, in)
    scale = p["scale4"]
    n_groups = scale.shape[-1]
    group = q.shape[-1] // n_groups
    w = q.reshape(*q.shape[:-1], n_groups, group).astype(jnp.float32) * scale[..., None]
    return w.reshape(*q.shape).astype(dtype)


def quantize_linear_weight_int4_pc(w: jax.Array) -> dict:
    """(out, in) float → per-channel symmetric int4, COLUMN-HALVED nibble
    pack: low nibbles hold input columns [0, in/2), high nibbles
    [in/2, in) — the layout ops.int4_matvec unpacks with two half-dots and
    no lane interleave.  One f32 scale per output row (coarser than the
    group-64 memory tier; gated by the gate-decision tolerance test).
    Stacked (L, out, in) weights quantize layerwise the same way."""
    w32 = w.astype(jnp.float32)
    din = w32.shape[-1]
    if din % 2 != 0:
        return {"weight": w}
    absmax = jnp.max(jnp.abs(w32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale), -7, 7).astype(jnp.int8)
    lo = q[..., : din // 2]
    hi = q[..., din // 2:]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)), jnp.left_shift(hi, 4)
    ).astype(jnp.int8)
    return {"w_int4pc": packed, "scale": scale[..., 0]}


def dequantize_linear_weight_int4_pc(p: dict, dtype=jnp.float32) -> jax.Array:
    packed = p["w_int4pc"]
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    return (q * p["scale"][..., None]).astype(dtype)


def quantize_text_params(text_params: dict, bits: int = 8,
                         free_source: bool = False,
                         scheme: str = "group") -> dict:
    """Quantized decoder loading — the reference's load_8bit / load_4bit
    flags (model/builder.py:43-52) as a TPU-native loader transform: every
    attention/MLP projection of the text tower stored int8 (per-channel) or
    packed int4 (group-64); embeddings, norms and lm_head stay full
    precision.  7B bf16 14.5 GB → ~7.3 GB (int8) / ~3.7 GB (int4) at rest.

    int8 is ALSO a decode-speed tier: the decode step is weight-bandwidth
    bound, and the int8→bf16 convert fuses into the dot's operand read —
    measured 21 → 12.4 ms/token at 7B on one v5e chip.

    free_source=True drops each source weight right after quantizing it
    (MUTATES the input tree) so peak HBM is one full-precision tree plus ONE
    layer, not two trees — required to quantize a 7B load on a 16 GB chip.

    scheme (bits=4 only): "group" = group-64 scales, packed at REST (the
    bnb load_in_4bit parity tier — XLA's dequant-on-read materializes the
    full weight, so it is a fit-bigger-models option, not a speed tier);
    "pc" = per-channel scales with the column-halved pack that the fused
    Pallas matvec (ops/int4_matvec.py) unpacks in VMEM right before the
    MXU dot — a decode SPEED tier: 1-token forwards read half the int8
    tier's weight bytes (~3.7 GB vs 7.3 at 7B).
    """
    def quant(leaf: dict) -> dict:
        w = leaf.pop("weight") if free_source else leaf["weight"]
        if bits == 8:
            q = quantize_linear_weight(w)
        elif bits == 4 and scheme == "pc":
            q = quantize_linear_weight_int4_pc(w)
        elif bits == 4:
            q = quantize_linear_weight_int4(w)
        else:
            raise ValueError(f"bits must be 4 or 8, got {bits}")
        del w
        if "bias" in leaf:
            q["bias"] = leaf["bias"]
        return q

    out = dict(text_params)
    layers = dict(out["layers"])
    for name in ("q", "k", "v", "o"):
        layers[name] = quant(layers[name])
    if "mlp" in layers:
        mlp = dict(layers["mlp"])
        for name in ("gate", "up", "down"):
            mlp[name] = quant(mlp[name])
        layers["mlp"] = mlp
    if "experts" in layers:
        # Mixtral expert banks (L, E, F, D): quantized along the input (last)
        # axis like any linear — _moe_mlp consumes the same {"w_int8"/
        # "w_int4", scale} leaves via utils.params.linear.  The router stays
        # full precision (it is tiny and decides routing).
        orig = layers["experts"]  # the INPUT tree's inner dict (shared)
        experts = {}
        for name in ("gate", "up", "down"):
            src = orig[name]
            if isinstance(src, dict):
                experts[name] = quant(src)
                continue
            if free_source:
                # experts are ~90% of a Mixtral's weights: pop the raw bank
                # out of the input tree BEFORE quantizing so peak HBM is
                # one bank, not two (mirrors the per-leaf pop above)
                orig.pop(name)
            experts[name] = quant({"weight": src})
            del src
        layers["experts"] = experts
    out["layers"] = layers
    return out


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


def quantize_gate_params(cls_net_params: dict, bits: int = 8) -> dict:
    """Quantize every attention/MLP projection of the gate LM
    (embeddings, norms and the 2-way lm_head stay full precision).

    bits=8: the int8 text transform (134 → 160 fps measured).
    bits=4: per-channel int4 with the column-halved pack consumed by the
    fused Pallas matvec (ops/int4_matvec.py) — half the gate weight
    bytes again; decisions gated by the same probability-tolerance test."""
    if bits == 8:
        return quantize_text_params(cls_net_params, bits=8)
    if bits != 4:
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def quant(leaf: dict) -> dict:
        q = quantize_linear_weight_int4_pc(leaf["weight"])
        if "bias" in leaf:
            q["bias"] = leaf["bias"]
        return q

    out = dict(cls_net_params)
    layers = dict(out["layers"])
    for name in ("q", "k", "v", "o"):
        layers[name] = quant(layers[name])
    mlp = dict(layers["mlp"])
    for name in ("gate", "up", "down"):
        mlp[name] = quant(mlp[name])
    layers["mlp"] = mlp
    out["layers"] = layers
    return out


def synth_quantized_text_params(cfg, bits: int = 8, scheme: str = "group"):
    """Build a synthetic text tree directly at its QUANTIZED shapes.

    Benchmarks/sweeps need a 7B-shaped quantized tree whose VALUES don't
    matter (dense matmul time is value-independent).  Materializing the
    bf16 source first and quantizing it OOMs a 16 GB chip: the full tree is
    ~14.5 GB and quantize_linear_weight's fp32 copy of one stacked
    (L, out, in) leaf adds up to ~3.8 GB on top (observed on-chip, r5).
    Instead, eval_shape the init→quantize composition (abstract — zero HBM)
    and fill the quantized shapes directly: int leaves get ones, float
    leaves 0.01.  Peak HBM is just the quantized tree (~7.3 GB int8 at 7B).
    """
    import jax

    from ..models import mistral as lm

    shapes = jax.eval_shape(
        lambda k: quantize_text_params(
            lm.init_text_params(k, cfg, jnp.bfloat16), bits=bits, scheme=scheme
        ),
        jax.random.PRNGKey(0),
    )

    def fill(s):
        if jnp.issubdtype(s.dtype, jnp.integer):
            return jnp.ones(s.shape, s.dtype)
        return jnp.full(s.shape, 0.01, s.dtype)

    return jax.tree.map(fill, shapes)
