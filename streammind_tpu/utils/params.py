"""Parameter-tree helpers: initializers, tree math, counting.

Models in this framework are pure functions over nested dicts of jnp arrays
("param trees").  Weight layout convention for linear layers is
``(out_features, in_features)`` — the same as torch — so converted
checkpoints drop in without transposition, and matmuls are written
``x @ W.T`` (XLA canonicalizes the transpose away).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_init(key, out_features: int, in_features: int, bias: bool = True,
                      dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) weights → bound
    = gain*sqrt(3/fan_in) with gain = sqrt(2/(1+5)) = 1/sqrt(3), i.e. the
    bound is exactly sqrt(1/fan_in); uniform bias with the same bound."""
    wkey, bkey = jax.random.split(key)
    bound_w = math.sqrt(1.0 / in_features)
    w = jax.random.uniform(wkey, (out_features, in_features), dtype,
                           minval=-bound_w, maxval=bound_w)
    out = {"weight": w}
    if bias:
        bound_b = 1.0 / math.sqrt(in_features)
        out["bias"] = jax.random.uniform(bkey, (out_features,), dtype,
                                         minval=-bound_b, maxval=bound_b)
    return out


def normal_init(key, shape, std: float = 0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def linear(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """x @ W.T + b with (out, in)-layout weights.

    Also accepts weight-only int8 leaves ({"w_int8", "scale"} from
    utils.quantize): the int8→compute-dtype convert fuses into the dot's
    operand read, halving the weight bandwidth of the serve-path gate.
    """
    if "w_int8" in p:
        # (out,) scale broadcasts over all leading dims
        y = (x @ p["w_int8"].T.astype(x.dtype)) * p["scale"].astype(x.dtype)
    elif "w_int4" in p:
        # packed-int4 loader path (utils.quantize.quantize_text_params,
        # bits=4): weights rest at 4 bits + group scales, dequantized on
        # the fly (the reference's bnb load_in_4bit role)
        from .quantize import dequantize_linear_weight_int4

        y = x @ dequantize_linear_weight_int4(p, x.dtype).T
    elif "w_int4pc" in p:
        # gate int4 SPEED tier: per-channel scales + column-halved pack —
        # on TPU the nibble unpack fuses into the matmul inside a Pallas
        # kernel (ops/int4_matvec.py; XLA's dequant-on-read materializes
        # the full weight and measured 6.7x slower than int8)
        import jax as _jax

        lead = x.shape[:-1]
        t = 1
        for d in lead:
            t *= d
        if (_jax.default_backend() == "tpu" and t <= 8
                # Mosaic needs the packed input dim lane-aligned (128) —
                # tiny configs fall back to the dequant path (same class of
                # constraint as the paged kernels, found by on-chip drives)
                and p["w_int4pc"].shape[-1] % 128 == 0):
            from ..ops.int4_matvec import int4_matvec

            y = int4_matvec(
                x.reshape(t, x.shape[-1]), p["w_int4pc"], p["scale"]
            ).reshape(*lead, -1)
        else:
            from .quantize import dequantize_linear_weight_int4_pc

            y = x @ dequantize_linear_weight_int4_pc(p, x.dtype).T
    else:
        y = x @ p["weight"].T.astype(x.dtype)
    if "lora_a" in p:
        # matmul-time LoRA (train/lora.py::attach_lora): the low-rank delta
        # is applied as x@Aᵀ@Bᵀ·s instead of merging W+sBA — no merged-weight
        # materialization, so the base may rest quantized (QLoRA)
        y = y + (
            (x @ p["lora_a"].T.astype(x.dtype)) @ p["lora_b"].T.astype(x.dtype)
        ) * p["lora_scale"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def flatten_with_paths(tree, prefix: str = "") -> Iterator[Tuple[str, Any]]:
    """Yield ('a.b.c', leaf) pairs for a nested dict tree."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten_with_paths(v, f"{prefix}{k}." if prefix or k else k)
    else:
        yield prefix.rstrip("."), tree


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def stack_layers(layer_params: list):
    """Stack a list of identical param trees along a new leading axis so the
    layer loop can be a lax.scan (compile-once for N layers)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layer_params)
