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
    stack_stop_ids,
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


def test_stack_stop_ids_shapes():
    a = np.asarray([[5, 6], [7, 8]], np.int32)
    b = np.asarray([[9, 10, 11]], np.int32)
    st = stack_stop_ids([a, None, b])
    assert st.shape == (3, 2, 3)
    assert (st[1] == -1).all()            # None row is all-pad
    assert list(st[0, 0]) == [-1, 5, 6]   # left-padded to shared width
    assert list(st[2, 0]) == [9, 10, 11]
    assert stack_stop_ids([None, None]) is None


def test_batched_decode_per_row_stop_isolation(setup):
    """A stop sequence assigned to row A only (stack_stop_ids) must NOT
    terminate row B even when row B's stream contains it — heterogeneous
    tokenizers across batched streams (the merge_stop_ids union could halt
    a row on another row's token ids)."""
    cfg, params, engine = setup
    plans = [
        _plan([1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [0, 1, 2]),
        _plan([1, 8, VIDEO_TOKEN_INDEX, 6], [1, 2]),
    ]
    memories = jnp.concatenate([_memory(cfg, 0), _memory(cfg, 1)], axis=0)

    def run(stop_ids=None):
        cache = stack_kv_caches([engine.new_kv_cache() for _ in plans])
        last, cache = engine.prefill_batch(plans, memories, cache)
        outs, _, _ = engine.generate_from_prefill_batch(
            last, cache, 10, stop_ids=stop_ids
        )
        return outs

    base = run()
    assert len(base[1]) >= 4

    # carve the stop from ROW B's stream, assign it to ROW A only
    bigram = (base[1][1], base[1][2])
    row_a_stop = np.asarray([list(bigram)], np.int32)
    outs = run(stop_ids=stack_stop_ids([row_a_stop, None]))
    # row B keeps decoding through its own bigram (isolation); with the
    # merged/shared matcher it would have stopped at index 3
    assert outs[1] == base[1]
    # row A stops only if the bigram happens in ITS stream
    ja = _first_bigram(base[0], bigram)
    assert outs[0] == (base[0] if ja is None else base[0][: ja + 2])


def test_paged_decode_per_row_stop_isolation(setup):
    """Same isolation contract through the paged batched decode loop."""
    cfg, params, engine = setup
    plans = [
        _plan([1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [0, 1, 2]),
        _plan([1, 8, VIDEO_TOKEN_INDEX, 6], [1, 2]),
    ]
    mems = [_memory(cfg, 0), _memory(cfg, 1)]

    def run(stop_ids=None):
        pd = PagedDialogues(engine, num_pages=32, page_size=8)
        pd.open("a"), pd.open("b")
        return pd.run_turns(["a", "b"], plans, mems, max_new_tokens=10,
                            stop_ids=stop_ids)

    base = run()
    assert len(base[1]) >= 4
    bigram = (base[1][1], base[1][2])
    row_a_stop = np.asarray([list(bigram)], np.int32)
    outs = run(stop_ids=stack_stop_ids([row_a_stop, None]))
    assert outs[1] == base[1]
    ja = _first_bigram(base[0], bigram)
    assert outs[0] == (base[0] if ja is None else base[0][: ja + 2])


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
