"""Attention ops: reference jnp MHA/GQA and a Pallas flash-attention kernel.

Replaces flash-attn 2.5.8 (reference requirements.txt:87, engaged via
attn_implementation="flash_attention_2" at train_flash_attn_score.py:13).

  * ``mha_reference``    — plain jnp softmax attention (GQA-aware); the
                           training path (XLA fuses + rematerializes well at
                           the 2k context the reference trains with).
  * ``flash_attention``  — blockwise online-softmax Pallas kernel with the
                           running (m, l, acc) in VMEM; prefill/inference.
  * ``decode_attention`` — single-token query against a static KV cache with
                           a length mask; bandwidth-bound, left to XLA.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_utils import interpret_mode

NEG_INF = -1e30


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """(B, S, Hkv, D) -> (B, S, Hkv*n_rep, D) by head repetition."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def mha_reference(
    q: jax.Array,  # (B, Sq, H, D)
    k: jax.Array,  # (B, Sk, Hkv, D)
    v: jax.Array,  # (B, Sk, Hkv, D)
    causal: bool = False,
    bias: Optional[jax.Array] = None,        # (B, 1|H, Sq, Sk) additive
    kv_mask: Optional[jax.Array] = None,     # (B, Sk) bool, True == valid
    q_offset: int | jax.Array = 0,           # causal offset: q position i is at i+q_offset
    softmax_scale: Optional[float] = None,
) -> jax.Array:
    """Reference softmax attention with fp32 logits/softmax."""
    b, sq, h, d = q.shape
    hkv = k.shape[2]
    k = _repeat_kv(k, h // hkv)
    v = _repeat_kv(v, h // hkv)
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        sk = k.shape[1]
        qpos = jnp.arange(sq)[:, None] + q_offset
        kpos = jnp.arange(sk)[None, :]
        logits = jnp.where(kpos <= qpos, logits, NEG_INF)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------
def _flash_kernel(meta_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_scr, m_scr, l_scr,
                  *, block_k: int, causal: bool, scale: float):
    """Grid: (batch*heads, num_q_blocks).  Blocks:
      q_ref: (1, BQ, D); k_ref/v_ref: (1, Sk, D); o_ref: (1, BQ, D)
      meta_ref: (B*H, 2) scalar-prefetch — [valid kv length, q position
      offset] per row (dynamic offsets let cached prefill reuse one program).
    """
    qb = pl.program_id(1)
    block_q = q_ref.shape[1]
    seq_k = k_ref.shape[1]
    kv_len = meta_ref[pl.program_id(0), 0]
    q_offset = meta_ref[pl.program_id(0), 1]

    m_scr[:, :] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:, :] = jnp.zeros_like(l_scr)
    acc_scr[:, :] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
    q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_offset

    num_kb = pl.cdiv(seq_k, block_k)

    def body(kb, _):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # (BQ, BK)

        k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = k_pos < kv_len
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:, :] = l_scr[:, :] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:, :] = acc_scr[:, :] * alpha + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        m_scr[:, :] = m_new
        return 0

    if causal:
        # Only iterate k blocks that can be visible to this q block.
        max_kb = jnp.minimum(
            num_kb,
            pl.cdiv(jnp.minimum((qb + 1) * block_q + q_offset, kv_len), block_k),
        )
    else:
        max_kb = jnp.minimum(num_kb, pl.cdiv(kv_len, block_k))
    jax.lax.fori_loop(0, max_kb, body, 0)

    denom = jnp.maximum(l_scr[:, :], 1e-30)
    o_ref[0] = (acc_scr[:, :] / denom).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,  # (B, Sq, H, D)
    k: jax.Array,  # (B, Sk, Hkv, D)
    v: jax.Array,
    causal: bool = False,
    kv_len: Optional[jax.Array] = None,  # scalar or (B,) valid kv length
    q_offset=0,  # int or (B,) array — query position offset (cached prefill)
    softmax_scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Blockwise flash attention forward.  GQA via head repetition indices.

    Static shapes; padding handled by kv_len masking so streaming callers can
    keep one compiled program for a ring buffer of fixed capacity.
    """
    b, sq, h, d = q.shape
    _, sk, hkv, _ = k.shape
    n_rep = h // hkv
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    # Pad sequence dims to block multiples.
    sq_p = -(-sq // block_q) * block_q
    sk_p = -(-sk // block_k) * block_k
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))

    if kv_len is None:
        kv_len_arr = jnp.full((b,), sk, jnp.int32)
    else:
        kv_len_arr = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    q_off_arr = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))

    # Flatten (B, H) into the grid's first axis; map each head to its kv head.
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq_p, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * hkv, sk_p, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * hkv, sk_p, d)
    meta = jnp.stack(
        [jnp.repeat(kv_len_arr, h), jnp.repeat(q_off_arr, h)], axis=1
    )

    kernel = functools.partial(
        _flash_kernel,
        block_k=block_k,
        causal=causal,
        scale=scale,
    )

    grid = (b * h, sq_p // block_q)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qb, kvl: (bh, qb, 0)),
                # kv head index = (bh % h) // n_rep within batch bh // h
                pl.BlockSpec(
                    (1, sk_p, d),
                    lambda bh, qb, kvl: ((bh // h) * hkv + (bh % h) // n_rep, 0, 0),
                ),
                pl.BlockSpec(
                    (1, sk_p, d),
                    lambda bh, qb, kvl: ((bh // h) * hkv + (bh % h) // n_rep, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qb, kvl: (bh, qb, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        interpret=interpret_mode(),
    )(meta, qf, kf, vf)

    out = out.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)
    return out[:, :sq]


def decode_attention(
    q: jax.Array,        # (B, 1, H, D)
    k_cache: jax.Array,  # (B, Smax, Hkv, D)
    v_cache: jax.Array,
    cache_len: jax.Array,  # (B,) valid entries
    softmax_scale: Optional[float] = None,
) -> jax.Array:
    """Single-token decode against a fixed-capacity KV cache."""
    smax = k_cache.shape[1]
    kv_mask = jnp.arange(smax)[None, :] < cache_len[:, None]
    return mha_reference(
        q, k_cache, v_cache, causal=False, kv_mask=kv_mask, softmax_scale=softmax_scale
    )


def attention(
    q, k, v,
    causal: bool = False,
    kv_mask: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    q_offset=0,
    impl: str = "auto",
):
    """Dispatcher.  'auto' → reference (differentiable) path; 'flash' → Pallas.

    kv_mask and kv_len are interchangeable here: padding in this codebase is
    always right-side contiguous, so a mask converts to a length (flash path)
    and a length to a mask (reference path) without information loss.
    """
    if impl == "flash":
        if kv_len is None and kv_mask is not None:
            kv_len = jnp.sum(kv_mask, axis=-1).astype(jnp.int32)
        return flash_attention(q, k, v, causal=causal, kv_len=kv_len, q_offset=q_offset)
    if impl == "bf16":
        # serve-path fast mode: softmax in the input dtype (bf16) — ~20%
        # faster ViT blocks on v5e; ~2% feature error vs fp32 softmax.
        h, hkv = q.shape[2], k.shape[2]
        k = _repeat_kv(k, h // hkv)
        v = _repeat_kv(v, h // hkv)
        scale = 1.0 / math.sqrt(q.shape[-1])
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if causal:
            sq, sk = q.shape[1], k.shape[1]
            qpos = jnp.arange(sq)[:, None] + q_offset
            s = jnp.where(jnp.arange(sk)[None, :] <= qpos, s, NEG_INF)
        if kv_mask is not None:
            s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)
    if kv_mask is None and kv_len is not None:
        sk = k.shape[1]
        kv_len_arr = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (k.shape[0],))
        kv_mask = jnp.arange(sk)[None, :] < kv_len_arr[:, None]
    return mha_reference(q, k, v, causal=causal, kv_mask=kv_mask, q_offset=q_offset)
