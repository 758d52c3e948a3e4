"""Fused int8 weight-only matvec for the decode regime.

1-token decode forwards are pure weight bandwidth (~7 GB/token at 7B
int8).  XLA's convert-on-read int8 dot measured ~420 GB/s device-time on
a v5e chip vs ~690 GB/s for plain bf16 reads (tools/_probe_int4_native.py)
— the s8→bf16 convert on the VPU throttles the stream to ~half the HBM
peak, which is why 7B int8 decode sits at ~12 ms/token against an
8.6 ms full-bandwidth floor.  This kernel streams the int8 tiles into
VMEM (Pallas double-buffers grid blocks), converts there, and feeds the
MXU — HBM traffic is exactly the packed int8 bytes plus one f32 scale
per output channel.

Numerics: finer than the XLA path, not identical — one fp32 accumulate
and a single rounding to x.dtype instead of a bf16 dot output followed
by a bf16 scale multiply.  Both decode tiers are gated by the same
decision/token-level tolerance tests as the int8 tier itself
(serving-path optimization of BASELINE.json's latency budget; the
reference's analogous role is the bnb int8 load, model/builder.py:43-52).

Tiling: the weight block is (out_tile, in) with out_tile chosen so the
block stays ≤4 MB — double-buffered that is ≤8 MB of the 16 MB scoped
VMEM (a 2048-row tile at in=4096 plus padding measured just OVER the
16 MB stack limit on-chip, hence the hard cap).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

from .pallas_utils import interpret_mode

_MAX_TILE_BYTES = 4 * 1024 * 1024


def _int8_matvec_kernel(x_ref, w_ref, s_ref, o_ref):
    # x (B, in) f32/bf16; w (OUT_T, in) int8; s (1, OUT_T) f32
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc * s_ref[0][None, :]


def _pick_out_tile(out: int, din: int) -> int:
    limit = max(1, _MAX_TILE_BYTES // din)
    tile = 1
    t = 8
    while t <= limit and out % t == 0:
        tile = t
        t *= 2
    return tile


@functools.partial(jax.jit, static_argnames=())
def int8_matvec(x: jax.Array, w_int8: jax.Array, scale: jax.Array) -> jax.Array:
    """y = x @ w_int8.T * scale with the s8→bf16 convert fused in VMEM.

    x: (B, in) with small B (the matvec/decode regime); w_int8: (out, in)
    int8; scale: (out,) f32 per-output-channel.  Returns (B, out) in
    x.dtype.  Caller guards alignment (in % 128 == 0, out % 8 == 0).
    """
    b, din = x.shape
    out = w_int8.shape[0]
    out_tile = _pick_out_tile(out, din)
    y = pl.pallas_call(
        _int8_matvec_kernel,
        grid=(out // out_tile,),
        in_specs=[
            pl.BlockSpec((b, din), lambda i: (0, 0)),
            pl.BlockSpec((out_tile, din), lambda i: (i, 0)),
            pl.BlockSpec((1, out_tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b, out_tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, out), jnp.float32),
        interpret=interpret_mode(),
    )(x, w_int8, scale.reshape(1, out).astype(jnp.float32))
    return y.astype(x.dtype)
