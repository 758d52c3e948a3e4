"""Top-k/top-p/temperature sampling-filter parity tests.

Cross-checks streaming/logit_filters.py against an independent torch mirror of the
reference decode engine's filters
(/root/reference/streammind/model/mamba_ssm/utils/generation.py:37-119):
top-k mask -> temperature scaling -> nucleus filtering over the scaled
logits.  The comparison is on the filtered DISTRIBUTION (kept-set mask +
renormalized probabilities), which pins the semantics without depending on
RNG implementation details.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from streammind_tpu.streaming.logit_filters import (
    filtered_logits,
    sample_first_token,
    sample_token,
)


def torch_reference_filter(logits: np.ndarray, temperature, top_k, top_p):
    """The reference's sample() filter pipeline (generation.py:84-119),
    reimplemented on torch for an independent cross-check; returns the
    final (renormalized) sampling distribution."""
    x = torch.asarray(logits, dtype=torch.float64).clone()
    if top_k > 0:
        k = min(top_k, x.size(-1))
        kth = torch.topk(x, k)[0][..., -1, None]
        x.masked_fill_(x < kth, float("-inf"))
    if temperature != 1.0:
        x = x / temperature
    if 0.0 < top_p < 1.0:
        sorted_logits, sorted_indices = torch.sort(x, descending=False)
        cumulative_probs = sorted_logits.softmax(dim=-1).cumsum(dim=-1)
        sorted_remove = cumulative_probs <= (1 - top_p)
        remove = sorted_remove.scatter(-1, sorted_indices, sorted_remove)
        x.masked_fill_(remove, float("-inf"))
    return torch.softmax(x, dim=-1).numpy()


@pytest.mark.parametrize("top_k,top_p,temperature", [
    (0, 0.0, 1.0),      # pure temperature
    (5, 0.0, 1.0),      # top-k only
    (0, 0.9, 1.0),      # nucleus only
    (10, 0.7, 0.8),     # both, cool
    (3, 0.5, 1.5),      # both, hot
    (1, 0.0, 1.0),      # top-1: degenerate to argmax support
    (1000, 0.999, 1.0), # k > V, p ~ 1: no-op filters
])
def test_filtered_distribution_matches_torch(rng, top_k, top_p, temperature):
    logits = rng.standard_normal((4, 50)) * 3.0
    ours = np.asarray(jax.nn.softmax(filtered_logits(
        jnp.asarray(logits), jnp.float32(temperature), jnp.int32(top_k),
        jnp.float32(top_p)), axis=-1))
    ref = torch_reference_filter(logits, temperature, top_k, top_p)
    # Elements whose cumulative mass sits within fp32 cumsum resolution of
    # the nucleus boundary can legitimately land on either side (ours runs
    # in fp32, the mirror in fp64); exclude only those knife-edge slots.
    ambiguous = np.zeros_like(ours, bool)
    if 0.0 < top_p < 1.0:
        x = logits.copy()
        if top_k > 0:
            kth = np.sort(x, axis=-1)[:, -min(top_k, x.shape[-1]), None]
            x = np.where(x < kth, -np.inf, x)
        x = x / temperature
        p64 = np.exp(x - x.max(axis=-1, keepdims=True))
        p64 /= p64.sum(axis=-1, keepdims=True)
        order = np.argsort(-x, axis=-1)
        before = np.take_along_axis(
            np.cumsum(np.take_along_axis(p64, order, -1), axis=-1)
            - np.take_along_axis(p64, order, -1), np.argsort(order, -1), -1)
        ambiguous = np.abs(before - top_p) < 1e-6
    ok = ~ambiguous
    np.testing.assert_allclose(ours[ok], ref[ok], atol=1e-3)
    np.testing.assert_array_equal(ours[ok] > 0, ref[ok] > 0)
    assert ambiguous.mean() < 0.05  # the escape hatch stays a knife-edge set


def test_per_row_knobs(rng):
    """Batched decode rows carry their own sampling params."""
    logits = rng.standard_normal((3, 40)) * 2.0
    temps, ks, ps = [1.0, 0.5, 2.0], [0, 5, 3], [0.0, 0.9, 0.6]
    batched = np.asarray(jax.nn.softmax(filtered_logits(
        jnp.asarray(logits), jnp.asarray(temps, jnp.float32),
        jnp.asarray(ks, jnp.int32), jnp.asarray(ps, jnp.float32)), axis=-1))
    for r in range(3):
        ref = torch_reference_filter(logits[r][None], temps[r], ks[r], ps[r])
        np.testing.assert_allclose(batched[r][None], ref, atol=1e-5)


def test_greedy_shortcircuit(rng):
    """temperature <= 0 -> plain argmax regardless of filters."""
    logits = jnp.asarray(rng.standard_normal((6, 30)))
    tok = sample_token(jax.random.PRNGKey(0), logits, jnp.float32(0.0),
                       jnp.int32(3), jnp.float32(0.5))
    np.testing.assert_array_equal(np.asarray(tok), np.argmax(logits, axis=-1))


def test_topk1_sampling_equals_greedy(rng):
    """top_k=1 with temperature > 0 can only ever draw the argmax."""
    logits = jnp.asarray(rng.standard_normal((8, 25)))
    for seed in range(3):
        tok = sample_token(jax.random.PRNGKey(seed), logits, jnp.float32(1.3),
                           jnp.int32(1), jnp.float32(0.0))
        np.testing.assert_array_equal(np.asarray(tok), np.argmax(logits, axis=-1))


def test_nucleus_support_respected(rng):
    """Draws under a tight top_p never leave the nucleus."""
    logits = jnp.asarray(rng.standard_normal((50,)) * 4.0)
    dist = np.asarray(jax.nn.softmax(filtered_logits(
        logits, jnp.float32(1.0), jnp.int32(0), jnp.float32(0.3)), axis=-1))
    support = set(np.flatnonzero(dist > 0))
    assert 0 < len(support) < 50
    for seed in range(20):
        tok = int(sample_first_token(jax.random.PRNGKey(seed), logits,
                                     temperature=1.0, top_p=0.3))
        assert tok in support


def test_mixed_greedy_and_sampled_rows(rng):
    """A (K,) temperature vector with zero rows keeps those rows greedy."""
    logits = jnp.asarray(rng.standard_normal((4, 20)))
    temps = jnp.asarray([0.0, 1.0, 0.0, 0.7], jnp.float32)
    tok = np.asarray(sample_token(jax.random.PRNGKey(1), logits, temps,
                                  jnp.int32(0), jnp.float32(0.0)))
    am = np.argmax(np.asarray(logits), axis=-1)
    assert tok[0] == am[0] and tok[2] == am[2]


def test_engine_decode_with_filters():
    """End-to-end: the jitted decode loop accepts filters; top_k=1 sampled
    output token-for-token equals the greedy decode."""
    from streammind_tpu.config import tiny_streammind_config
    from streammind_tpu.models.meta import init_streammind_params
    from streammind_tpu.streaming import StreamMindEngine
    from streammind_tpu.models.meta import build_splice_plan
    from streammind_tpu.constants import VIDEO_TOKEN_INDEX

    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    engine = StreamMindEngine(params, cfg, eos_token_id=2,
                              prefill_buckets=(32, 64))
    ids = [1, 5, 6, VIDEO_TOKEN_INDEX, 7, 8]
    plan = build_splice_plan(ids, [3], VIDEO_TOKEN_INDEX, 32)
    memory = jnp.zeros((1, cfg.max_stream_frames, cfg.text.hidden_size))

    def run(**kw):
        cache = engine.new_kv_cache()
        last, cache = engine.prefill(plan, memory, cache)
        toks, _ = engine.generate_from_prefill(
            last, cache, max_new_tokens=8,
            rng_key=jax.random.PRNGKey(3), **kw)
        return toks

    greedy = run(temperature=0.0)
    forced = run(temperature=0.9, top_k=1)
    assert forced == greedy
    filtered = run(temperature=0.9, top_k=5, top_p=0.8)
    assert len(filtered) <= 8
