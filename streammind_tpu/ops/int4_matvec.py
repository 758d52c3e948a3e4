"""Fused int4 weight-only matvec for the gate tier.

The per-frame gate LM is pure weight bandwidth (1.32 ms of the 4.9 ms
fast-tier perception step is gate matmuls at int8).  int4 halves the
weight bytes again — but only if the nibble unpack FUSES into the matmul
operand read: the XLA dequant-on-read path materializes a full-precision
weight first and measured 6.7x SLOWER than int8 (PARITY.md).  This kernel
does the unpack in VMEM right before the MXU dot, so HBM traffic is the
packed int4 bytes plus one f32 scale per output channel.

Pack layout (quantize.quantize_linear_weight_int4_pc): COLUMN-HALVED, not
interleaved — low nibbles hold input columns [0, in/2), high nibbles
[in/2, in).  Unpacking then needs no element interleave (a lane-dim
relayout Mosaic would charge for): the kernel computes two half dots
  y = x[:, :in/2] @ unpack_lo(W).T + x[:, in/2:] @ unpack_hi(W).T
and scales per output channel.

Scales are PER-CHANNEL (one f32 per output row).  This is coarser than
the group-64 scales of the int4 memory tier (utils.quantize
quantize_linear_weight_int4) — acceptable for the gate because its
product contract is the 2-way decision, gated by the same probability
tolerance test as the int8 tier.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_utils import interpret_mode


def _int4_matvec_kernel(x_ref, w_ref, s_ref, o_ref):
    # x (B, in) f32/bf16; w (OUT_T, in/2) int8 packed; s (1, OUT_T) f32
    w32 = w_ref[:].astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(w32, 4)
    half = x_ref.shape[1] // 2
    xl = x_ref[:, :half].astype(jnp.float32)
    xh = x_ref[:, half:].astype(jnp.float32)
    acc = jax.lax.dot_general(
        xl, lo.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        xh, hi.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc * s_ref[0][None, :]


@functools.partial(jax.jit, static_argnames=("out_tile",))
def int4_matvec(x: jax.Array, packed: jax.Array, scale: jax.Array,
                out_tile: int = 512) -> jax.Array:
    """y = x @ unpack(packed).T * scale, fused.

    x: (B, in) with small B (the matvec/decode regime); packed:
    (out, in//2) int8 column-halved nibbles; scale: (out,) f32.
    Returns (B, out) in x.dtype.
    """
    b, din = x.shape
    out = packed.shape[0]
    if out % out_tile != 0:
        out_tile = next(
            t for t in (256, 128, 64, 32, 16, 8, 1) if out % t == 0
        )
    grid = (out // out_tile,)
    y = pl.pallas_call(
        _int4_matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, din), lambda i: (0, 0)),
            pl.BlockSpec((out_tile, din // 2), lambda i: (i, 0)),
            pl.BlockSpec((1, out_tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b, out_tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, out), jnp.float32),
        interpret=interpret_mode(),
    )(x, packed, scale.reshape(1, out).astype(jnp.float32))
    return y.astype(x.dtype)
