"""Normalization layers.

The reference fuses these with Triton (mamba_ssm ops/triton/layer_norm.py);
on TPU, XLA fuses plain jnp element-wise chains into the surrounding matmuls,
so these stay as simple fp32-accumulated functions.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm with fp32 statistics (Mistral/Llama convention)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return (x32 * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm with fp32 statistics."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = x32 * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def add_norm(
    x: jax.Array,
    residual: Optional[jax.Array],
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
    rms: bool = False,
):
    """Fused residual-add + norm (the layer_norm_fn(residual=...) pattern).

    Returns (normed, new_residual) with the residual kept in fp32.
    """
    res = x.astype(jnp.float32)
    if residual is not None:
        res = res + residual.astype(jnp.float32)
    if rms:
        normed = rms_norm(res, weight, eps)
    else:
        normed = layer_norm(res, weight, bias, eps)
    return normed.astype(x.dtype), res
