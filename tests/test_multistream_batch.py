"""Continuous-batched cognition: K slots firing on one tick share one
batched prefill + one lockstep decode loop (VERDICT r1 item 4; reference
hard-part per SURVEY §7 — heterogeneous work batched without head-of-line
blocking).  Contract: batched == sequential texts/caches, and the decode
loop runs max(len_k) device steps, not sum(len_k)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.constants import VIDEO_TOKEN_INDEX
from streammind_tpu.models.meta import build_splice_plan, init_streammind_params
from streammind_tpu.streaming import StreamMindEngine
from streammind_tpu.streaming.engine import split_kv_cache, stack_kv_caches
from streammind_tpu.streaming.multistream import MultiStreamServer


class FakeTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    eos_token = "</s>"

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        ids = [self.bos_token_id] + [3 + (ord(c) % 200) for c in text][:20]
        return self._Out(ids)

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    engine = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32, 64))
    return cfg, params, engine


def _plan_and_memory(cfg, engine, rng, seed_ids):
    memory = jnp.asarray(
        rng.standard_normal((1, cfg.max_stream_frames, cfg.text.hidden_size)),
        jnp.float32,
    )
    plan = build_splice_plan(seed_ids, [3], VIDEO_TOKEN_INDEX, 32)
    return plan, memory


def test_prefill_batch_matches_single(setup, rng):
    """K independent prefill rows through one batched program == K single
    prefills (logits + per-row cache advancement)."""
    cfg, params, engine = setup
    plans, memories, singles = [], [], []
    for k, ids in enumerate(
        [[1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [1, 8, VIDEO_TOKEN_INDEX, 6],
         [1, VIDEO_TOKEN_INDEX, 13, 14, 15]]
    ):
        plan, memory = _plan_and_memory(cfg, engine, rng, ids)
        plans.append(plan)
        memories.append(memory)
        cache = engine.new_kv_cache()
        last, cache = engine.prefill(plan, memory, cache)
        singles.append((np.asarray(last), np.asarray(cache.length)))

    cache_b = stack_kv_caches([engine.new_kv_cache() for _ in plans])
    last_b, cache_b = engine.prefill_batch(
        plans, jnp.concatenate(memories, axis=0), cache_b
    )
    for k, (last_1, len_1) in enumerate(singles):
        np.testing.assert_allclose(
            np.asarray(last_b[k : k + 1]), last_1, rtol=1e-4, atol=1e-4
        )
        assert int(cache_b.length[k]) == int(len_1[0]) == plans[k].length


def test_batched_decode_matches_single_and_runs_lockstep(setup, rng):
    """Batched greedy decode == per-row single decode; device step count is
    max(len_k), the continuous-batching win."""
    cfg, params, engine = setup
    ids_rows = [[1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [1, 8, VIDEO_TOKEN_INDEX, 6]]
    plans, memories, expect = [], [], []
    for ids in ids_rows:
        plan, memory = _plan_and_memory(cfg, engine, rng, ids)
        plans.append(plan)
        memories.append(memory)
        cache = engine.new_kv_cache()
        last, cache = engine.prefill(plan, memory, cache)
        toks, cache = engine.generate_from_prefill(last, cache, max_new_tokens=8)
        expect.append((toks, int(cache.length[0])))

    cache_b = stack_kv_caches([engine.new_kv_cache() for _ in plans])
    last_b, cache_b = engine.prefill_batch(
        plans, jnp.concatenate(memories, axis=0), cache_b
    )
    tok_lists, steps, cache_b = engine.generate_from_prefill_batch(
        last_b, cache_b, 8
    )
    lens = []
    for k, (toks, cache_len) in enumerate(expect):
        assert tok_lists[k] == toks, (k, tok_lists[k], toks)
        assert int(cache_b.length[k]) == cache_len
        lens.append(len(toks))
    # lockstep: the loop ran max over rows (+1 when a row hit max_new with a
    # non-eos continuation pending — same accounting as the single program)
    assert steps <= max(lens) + 1
    # per-row split restores standalone caches
    parts = split_kv_cache(cache_b, len(plans))
    for k, (toks, cache_len) in enumerate(expect):
        assert int(parts[k].length[0]) == cache_len
        assert parts[k].k.shape[1] == 1


def test_batched_decode_per_row_limits_and_padding(setup, rng):
    """Per-row max_new_tokens and inactive padding rows are honored."""
    cfg, params, engine = setup
    plan, memory = _plan_and_memory(cfg, engine, rng, [1, 5, VIDEO_TOKEN_INDEX, 4])
    plans = [plan, plan, plan]
    mem = jnp.concatenate([memory] * 3, axis=0)
    cache_b = stack_kv_caches([engine.new_kv_cache() for _ in plans])
    last_b, cache_b = engine.prefill_batch(plans, mem, cache_b)
    tok_lists, steps, cache_b = engine.generate_from_prefill_batch(
        last_b, cache_b, [6, 2, 0], active=[True, True, False]
    )
    assert len(tok_lists[0]) <= 6
    assert len(tok_lists[1]) <= 2
    assert tok_lists[2] == []
    # rows 0 and 1 decode the same distribution → row 1 is a prefix of row 0
    assert tok_lists[0][: len(tok_lists[1])] == tok_lists[1]
    # the inactive row's cache never advanced past its prefill
    assert int(cache_b.length[2]) == plan.length


def test_multistream_batched_cognition_equals_sequential(setup, rng):
    """Two streams whose gates fire on the SAME tick: the batched server
    produces the same texts, caches, and carried state as batch_cognition
    disabled (which runs the original per-slot sequential path)."""
    cfg, params, engine = setup
    size = cfg.vision.image_size
    frames = [
        {sid: np.asarray(rng.standard_normal((1, 3, size, size)), np.float32)
         for sid in ("a", "b", "c")}
        for _ in range(3)
    ]

    def run(batch_cognition):
        tok = FakeTokenizer()
        server = MultiStreamServer(engine, capacity=4,
                                   batch_cognition=batch_cognition)
        # gate_threshold=-1 → every fed tick fires (worst-case concurrency)
        server.add_stream("a", tok, prompt_ids=[1, 10, VIDEO_TOKEN_INDEX, 12],
                          gate_threshold=-1.0, max_new_tokens=4)
        server.add_stream("b", tok, prompt_ids=[1, 11, VIDEO_TOKEN_INDEX, 13],
                          gate_threshold=-1.0, max_new_tokens=6)
        server.add_stream("c", tok, prompt_ids=[1, 14, VIDEO_TOKEN_INDEX, 15],
                          gate_threshold=-1.0, max_new_tokens=4)
        outs = [server.step(f) for f in frames]
        lens = {s.stream_id: int(s.cache.length[0])
                for s in server.slots if s is not None}
        turns = {s.stream_id: list(s.turns) for s in server.slots if s is not None}
        fires = {s.stream_id: list(s.interval_ids)
                 for s in server.slots if s is not None}
        return outs, lens, turns, fires

    outs_b, lens_b, turns_b, fires_b = run(True)
    outs_s, lens_s, turns_s, fires_s = run(False)
    assert outs_b == outs_s
    assert lens_b == lens_s
    assert turns_b == turns_s
    assert fires_b == fires_s
    # sanity: every tick produced three utterances
    assert all(all(v is not None for v in o.values()) for o in outs_b)
