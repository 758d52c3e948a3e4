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
