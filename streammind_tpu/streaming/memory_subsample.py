"""Memory-token subsampling before the LLM splice.

Reference videollama2_arch.py:595-611 (flags sample_type='log'/'similarity',
sample_per; wired through stream kwargs at videollama2_mistral.py:166-167):
  - exponential_sampling: keep ~percentage of tokens at linearly spaced
    indices (the "log" flag name survives from an older log-spaced variant)
  - similarity_sampling: keep the tokens most cosine-similar to the newest
    memory token, in temporal order
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def exponential_sampling(tokens: jax.Array, percentage: float = 0.6) -> jax.Array:
    """tokens: (T, D) → (k, D) with k = max(int(percentage*T), 1), linearly
    spaced indices including both ends."""
    n = tokens.shape[0]
    k = int(percentage * n)
    k = 1 if k == 0 else k
    idx = np.linspace(0, n - 1, k).astype(np.int32)
    return tokens[jnp.asarray(idx)]


def similarity_sampling(tokens: jax.Array, percentage: float = 0.6) -> jax.Array:
    """Keep the top-percentage tokens by cosine similarity to the last token,
    re-sorted into temporal order."""
    n = tokens.shape[0]
    k = max(int(percentage * n), 1)
    t32 = tokens.astype(jnp.float32)
    last = t32[-1]
    sims = (t32 @ last) / (
        jnp.linalg.norm(t32, axis=1) * jnp.linalg.norm(last) + 1e-8
    )
    top = jnp.argsort(-sims)[:k]
    idx = jnp.sort(top)
    return tokens[idx]


def subsample_memory(tokens: jax.Array, sample_type: str = "all",
                     sample_per: float = 0.6) -> jax.Array:
    """Dispatch on the reference's sample_type flag ('all' | 'log' |
    'similarity')."""
    if sample_type == "log":
        return exponential_sampling(tokens, sample_per)
    if sample_type == "similarity":
        return similarity_sampling(tokens, sample_per)
    return tokens


def subsample_span_indices(n: int, sample_type: str, sample_per: float,
                           values=None) -> np.ndarray:
    """Host-side index form of subsample_memory for the streaming product
    path: which of a turn's n memory slots survive.  The splice plans are
    built from host-side span index lists already, so subsampling the
    INDICES keeps every jitted program's shapes static — only the (already
    variable) span length changes.

    values: (n, D) span token values, required for 'similarity' (cosine
    similarity to the newest token, reference videollama2_arch.py:603-611);
    'log' is value-free linear spacing (:595-601)."""
    if sample_type in (None, "all") or n <= 1:
        return np.arange(n, dtype=np.int32)
    k = int(sample_per * n)
    k = 1 if k == 0 else k
    if sample_type == "log":
        return np.linspace(0, n - 1, k).astype(np.int32)
    if sample_type == "similarity":
        if values is None:
            raise ValueError("similarity subsampling needs the span values")
        v = np.asarray(values, np.float32)
        last = v[-1]
        sims = (v @ last) / (
            np.linalg.norm(v, axis=1) * np.linalg.norm(last) + 1e-8
        )
        top = np.argsort(-sims, kind="stable")[:k]
        return np.sort(top).astype(np.int32)
    raise ValueError(f"unknown sample_type {sample_type!r} "
                     "(expected 'all', 'log' or 'similarity')")


def subsample_span(span: list, memory_row, sample_type: str,
                   sample_per: float) -> list:
    """Subsample a cognition turn's span (absolute memory-ring indices).
    memory_row: the (1, M, D) ring — only pulled to host for 'similarity'
    (a few hundred rows per fired turn at most)."""
    if sample_type in (None, "all") or len(span) <= 1:
        return list(span)
    values = None
    if sample_type == "similarity":
        values = np.asarray(memory_row[0, np.asarray(span)])
    keep = subsample_span_indices(len(span), sample_type, sample_per, values)
    return [span[int(i)] for i in keep]
