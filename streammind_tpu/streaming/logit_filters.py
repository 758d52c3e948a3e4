"""Top-k / top-p / temperature sampling filters for the jitted decode loops.

Parity target: the reference decode engine's logit filters
(/root/reference/streammind/model/mamba_ssm/utils/generation.py:37-119) —
top-k mask, then temperature scaling, then nucleus (top-p) filtering over
the SCALED logits, then categorical sampling — and the serving worker's
`top_p` request parameter (reference serve/model_worker.py:250,275), which
the HF generate path forwards as sampling kwargs.

All three knobs are traced scalars (or per-row (K,) vectors in the batched
decode loops), never static — changing them at request time re-runs the
SAME compiled decode program.  Conventions:

  temperature <= 0    -> greedy argmax (filters ignored)
  top_k <= 0          -> no top-k filter
  top_p <= 0 or >= 1  -> no nucleus filter

Ties exactly at the top-k / top-p boundary are all kept (value-threshold
formulation); torch's positional scatter instead drops an arbitrary subset
of equal-valued logits — a measure-zero difference for real model logits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _col(v, x):
    """Broadcast a scalar-or-(K,) knob against (..., V) logits rows."""
    v = jnp.asarray(v)
    return v[..., None] if v.ndim else v


def filtered_logits(logits, temperature, top_k, top_p):
    """fp32 logits masked to the top-k, scaled by temperature, then masked
    to the nucleus — the reference's filter order (generation.py:84-119:
    topk -> /temperature -> top_p over the scaled values).  Last axis is the
    vocab; leading axes are decode rows."""
    x = logits.astype(jnp.float32)
    V = x.shape[-1]
    top_k = jnp.asarray(top_k, jnp.int32)
    top_p = jnp.asarray(top_p, jnp.float32)
    temperature = jnp.asarray(temperature, jnp.float32)

    # top-k: keep values >= the k-th largest (generation.py:47-50)
    desc = jnp.flip(jnp.sort(x, axis=-1), axis=-1)
    k = jnp.clip(top_k, 1, V)
    kth = jnp.take_along_axis(
        desc, jnp.broadcast_to(_col(k - 1, x), x.shape[:-1] + (1,)), axis=-1
    )
    x = jnp.where((_col(top_k, x) > 0) & (x < kth), _NEG_INF, x)

    x = x / jnp.maximum(_col(temperature, x), 1e-6)

    # nucleus: drop the descending-order tail whose PRECEDING prefix mass
    # already reaches top_p; top-1 is always kept (generation.py:55-69
    # keeps ascending-cumsum > 1 - top_p, which is the same set)
    desc2 = jnp.flip(jnp.sort(x, axis=-1), axis=-1)
    probs = jax.nn.softmax(desc2, axis=-1)
    before = jnp.cumsum(probs, axis=-1) - probs
    keep = before < _col(top_p, x)  # prefix property: monotone in sort order
    min_kept = jnp.min(jnp.where(keep, desc2, jnp.inf), axis=-1, keepdims=True)
    nucleus = jnp.where(x < min_kept, _NEG_INF, x)
    apply_p = (_col(top_p, x) > 0.0) & (_col(top_p, x) < 1.0)
    return jnp.where(apply_p, nucleus, x)


def sample_token(key, logits, temperature, top_k, top_p):
    """One sampled (or greedy) int32 token id per row of `logits` (..., V).
    temperature <= 0 rows take the plain argmax (filters ignored), matching
    the engines' previous greedy path bit-for-bit."""
    greedy = jnp.argmax(logits, axis=-1)
    samp = jax.random.categorical(
        key, filtered_logits(logits, temperature, top_k, top_p), axis=-1
    )
    return jnp.where(jnp.asarray(temperature) > 0, samp, greedy).astype(jnp.int32)


# Host-callable compiled version for first-token sampling after prefill
# (the decode loops inline sample_token inside their own jitted programs).
_sample_jit = jax.jit(sample_token)


def sample_first_token(key, logits, temperature=0.0, top_k=0, top_p=0.0):
    """Sample the first post-prefill token(s): logits (V,) or (K, V)."""
    return _sample_jit(
        key, logits, jnp.asarray(temperature, jnp.float32),
        jnp.asarray(top_k, jnp.int32), jnp.asarray(top_p, jnp.float32),
    )


# (per-row knob-vector building for the batched decode loops lives in
# engine._knob_rows — the single builder all batched paths share)
