"""In-decode stop-keyword termination (VERDICT r2 item 4).

The reference's KeywordsStoppingCriteria (mm_utils.py:616) halts HF
generate at the conversation separator; previously this repo decoded to
EOS/max and trimmed host-side — same text, wasted decode steps.  Contract:
with stop_ids set, the jitted decode loops (single, batched, paged) stop
within one step of emitting a stop sequence, the stop tokens are present in
the returned ids (so host trimming still sees them), and outputs elsewhere
are unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.constants import VIDEO_TOKEN_INDEX
from streammind_tpu.models.meta import (
    SplicePlan,
    build_splice_plan,
    init_streammind_params,
)
from streammind_tpu.streaming import StreamMindEngine
from streammind_tpu.streaming.engine import (
    merge_stop_ids,
    stack_kv_caches,
    stop_id_matrix,
)
from streammind_tpu.streaming.paged import PagedDialogues


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    engine = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32, 64))
    return cfg, params, engine


def _plan(ids, span, bucket=32):
    plan = build_splice_plan(ids, [len(span)], VIDEO_TOKEN_INDEX, bucket)
    mem_index = plan.mem_index.copy()
    mem_index[plan.use_mem] = np.asarray(span, np.int32)
    return SplicePlan(token_ids=plan.token_ids, mem_index=mem_index,
                      use_mem=plan.use_mem, attn_mask=plan.attn_mask,
                      labels=plan.labels, length=plan.length)


def _memory(cfg, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(
            (1, cfg.max_stream_frames, cfg.text.hidden_size)),
        jnp.float32,
    )


def test_stop_id_matrix_shapes():
    class Tok:
        bos_token_id = 1

        class _Out:
            def __init__(self, ids):
                self.input_ids = ids

        def __call__(self, text):
            return self._Out([1] + [ord(c) % 50 + 5 for c in text.strip()][:6])

    mat = stop_id_matrix(Tok(), ["ab", "wxyz"])
    assert mat.shape[1] == 4 and (mat[:, 0] == -1).any()
    assert stop_id_matrix(Tok(), []) is None
    merged = merge_stop_ids([mat, stop_id_matrix(Tok(), ["q"])])
    assert merged.shape[1] == 4
    assert merge_stop_ids([None, None]) is None


def _first_bigram(seq, bigram):
    for j in range(len(seq) - 1):
        if (seq[j], seq[j + 1]) == bigram:
            return j
    return None


def test_single_decode_stops_on_keyword(setup):
    """Pick a bigram of the greedy continuation as the stop sequence: the
    rerun must return exactly the prefix THROUGH the bigram's FIRST
    occurrence (within one step of the match)."""
    cfg, params, engine = setup
    memory = _memory(cfg)
    plan = _plan([1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [0, 1, 2])

    cache = engine.new_kv_cache()
    last, cache = engine.prefill(plan, memory, cache)
    base, _ = engine.generate_from_prefill(last, cache, max_new_tokens=12)
    assert len(base) >= 6, "greedy run too short to carve a stop bigram from"

    bigram = (base[3], base[4])
    stop = np.asarray([list(bigram)], np.int32)
    cache = engine.new_kv_cache()
    last, cache = engine.prefill(plan, memory, cache)
    out, _ = engine.generate_from_prefill(
        last, cache, max_new_tokens=12, stop_ids=stop
    )
    j = _first_bigram(base, bigram)
    assert out == base[: j + 2], (out, base)

    # no-stop behavior unchanged by the feature (plumbing default path)
    cache = engine.new_kv_cache()
    last, cache = engine.prefill(plan, memory, cache)
    again, _ = engine.generate_from_prefill(last, cache, max_new_tokens=12)
    assert again == base


def test_batched_decode_stops_per_row(setup):
    """Row A stops at its keyword while row B decodes to its full length —
    per-row done flags, shared lockstep loop."""
    cfg, params, engine = setup
    plans = [
        _plan([1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [0, 1, 2]),
        _plan([1, 8, VIDEO_TOKEN_INDEX, 6], [1, 2]),
    ]
    memories = jnp.concatenate([_memory(cfg, 0), _memory(cfg, 1)], axis=0)

    def run(stop_ids=None):
        cache = stack_kv_caches([engine.new_kv_cache() for _ in plans])
        last, cache = engine.prefill_batch(plans, memories, cache)
        outs, steps, _ = engine.generate_from_prefill_batch(
            last, cache, 10, stop_ids=stop_ids
        )
        return outs, steps

    base, base_steps = run()
    assert len(base[0]) >= 5 and len(base[1]) >= 2

    bigram = (base[0][1], base[0][2])
    stop = np.asarray([list(bigram)], np.int32)
    outs, steps = run(stop_ids=stop)
    j = _first_bigram(base[0], bigram)
    assert outs[0] == base[0][: j + 2], (outs[0], base[0])
    # row B unaffected unless the same bigram appears in its stream
    jb = _first_bigram(base[1], bigram)
    assert outs[1] == (base[1] if jb is None else base[1][: jb + 2])


def test_paged_decode_stops_on_keyword(setup):
    cfg, params, engine = setup
    memory = _memory(cfg)
    plan = _plan([1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [0, 1, 2])

    pd = PagedDialogues(engine, num_pages=32, page_size=8)
    pd.open("a")
    base = pd.run_turn("a", plan, memory, max_new_tokens=12)
    assert len(base) >= 6

    bigram = (base[2], base[3])
    stop = np.asarray([list(bigram)], np.int32)
    pd2 = PagedDialogues(engine, num_pages=32, page_size=8)
    pd2.open("a")
    out = pd2.run_turn("a", plan, memory, max_new_tokens=12, stop_ids=stop)
    j = _first_bigram(base, bigram)
    assert out == base[: j + 2], (out, base)
    # lengths advance only by FED tokens: the stop-completing token is
    # buffered for trimming but never entered the cache
    assert pd2.lengths["a"] - plan.length == len(out) - 1


def test_session_stop_strings_trim(setup):
    """StreamSession(stop_strings=...) plumbs the matrix and trims text."""
    cfg, params, engine = setup
    from sp_like_tokenizer import SPLikeTokenizer
    from streammind_tpu.streaming.engine import StreamSession

    tok = SPLikeTokenizer()
    s = StreamSession(engine, tok, stop_strings=["[INST]"])
    assert s.stop_ids is not None and s.stop_ids.ndim == 2
    blob = s.export_state()
    s2 = StreamSession.resume(engine, tok, blob)
    assert s2.stop_strings == ["[INST]"] and s2.stop_ids is not None
