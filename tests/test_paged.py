"""Paged KV cache (VERDICT r1 item 8): many dialogues share one page pool.

Contracts: (1) paged prefill+decode == the dense static-ring engine path,
token for token, including multi-turn continuation; (2) N dialogues fit a
pool SMALLER than N dense rings (the density win); (3) exhaustion raises and
close() reclaims pages."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.constants import VIDEO_TOKEN_INDEX
from streammind_tpu.models.meta import SplicePlan, build_splice_plan, init_streammind_params
from streammind_tpu.streaming import StreamMindEngine
from streammind_tpu.streaming.paged import PagedDialogues, PagePoolExhausted


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


def test_paged_matches_dense_two_turns(setup, rng):
    cfg, params, engine = setup
    memory = jnp.asarray(
        rng.standard_normal((1, cfg.max_stream_frames, cfg.text.hidden_size)),
        jnp.float32,
    )
    plan1 = _plan([1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [0, 1, 2])
    plan2 = _plan([2, 20, VIDEO_TOKEN_INDEX, 21], [3, 4])

    # dense reference: persistent ring across two turns
    cache = engine.new_kv_cache()
    last, cache = engine.prefill(plan1, memory, cache)
    toks1_d, cache = engine.generate_from_prefill(last, cache, max_new_tokens=6)
    last, cache = engine.prefill(plan2, memory, cache)
    toks2_d, cache = engine.generate_from_prefill(last, cache, max_new_tokens=6)

    # paged: same dialogue on a shared pool (page_size 8 → page-boundary
    # crossings inside both the prefill block and the decode loop)
    pd = PagedDialogues(engine, num_pages=32, page_size=8)
    pd.open("a")
    toks1_p = pd.run_turn("a", plan1, memory, max_new_tokens=6)
    toks2_p = pd.run_turn("a", plan2, memory, max_new_tokens=6)

    assert toks1_p == toks1_d, (toks1_p, toks1_d)
    assert toks2_p == toks2_d, (toks2_p, toks2_d)
    assert pd.lengths["a"] == int(cache.length[0])


def test_paged_density_many_dialogues(setup, rng):
    """6 dialogues on a pool holding 256 tokens total — a dense ring per
    dialogue at kv_capacity (>=96 here) would need >= 576; the pool admits
    them because pages track ACTUAL usage."""
    cfg, params, engine = setup
    memory = jnp.asarray(
        rng.standard_normal((1, cfg.max_stream_frames, cfg.text.hidden_size)),
        jnp.float32,
    )
    pd = PagedDialogues(engine, num_pages=32, page_size=8)  # 256 tokens total
    plan = _plan([1, 5, VIDEO_TOKEN_INDEX, 4], [0])

    expect = None
    for i in range(6):
        did = f"d{i}"
        pd.open(did)
        toks = pd.run_turn(did, plan, memory, max_new_tokens=4)
        if expect is None:
            # identical inputs → identical outputs regardless of which pool
            # pages the dialogue landed on
            cache = engine.new_kv_cache()
            last, cache = engine.prefill(plan, memory, cache)
            expect, _ = engine.generate_from_prefill(last, cache, max_new_tokens=4)
        assert toks == expect, (did, toks, expect)
    # each dialogue pinned its own pages
    used = sum(len(t) for t in pd.tables.values())
    # all 32 advertised pages are allocatable (the write-sink page is an
    # extra physical page, not carved out of the advertised pool)
    assert used + pd.free_pages() == 32
    assert len({p for t in pd.tables.values() for p in t}) == used  # disjoint

    # exhaustion: a 7th long turn must raise, and closing dialogues reclaims
    pd.open("hog")
    with pytest.raises(PagePoolExhausted):
        pd.ensure_capacity("hog", 8 * pd.free_pages() + 1)
    before = pd.free_pages()
    pd.close("d0")
    assert pd.free_pages() > before
    toks = pd.run_turn("hog", plan, memory, max_new_tokens=4)
    assert toks == expect


def test_paged_batched_turns_match_sequential(setup, rng):
    """run_turns: K dialogues' turns batched over the shared pool produce
    exactly the sequential run_turn results (paged continuous batching)."""
    cfg, params, engine = setup
    mem = lambda seed: jnp.asarray(
        np.random.default_rng(seed).standard_normal(
            (1, cfg.max_stream_frames, cfg.text.hidden_size)), jnp.float32)
    plans = [_plan([1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4], [0, 1, 2]),
             _plan([1, 8, VIDEO_TOKEN_INDEX, 6], [1, 2]),
             _plan([1, VIDEO_TOKEN_INDEX, 13], [0])]
    memories = [mem(i) for i in range(3)]

    # sequential reference
    pd_seq = PagedDialogues(engine, num_pages=48, page_size=8)
    seq = []
    for i, (plan, m) in enumerate(zip(plans, memories)):
        pd_seq.open(f"d{i}")
        seq.append(pd_seq.run_turn(f"d{i}", plan, m, max_new_tokens=5))

    # batched: same three turns in one prefill + one decode loop
    pd_bat = PagedDialogues(engine, num_pages=48, page_size=8)
    for i in range(3):
        pd_bat.open(f"d{i}")
    bat = pd_bat.run_turns([f"d{i}" for i in range(3)], plans, memories,
                           max_new_tokens=5)
    assert bat == seq, (bat, seq)
    for i in range(3):
        assert pd_bat.lengths[f"d{i}"] == pd_seq.lengths[f"d{i}"]

    # a second batched round continues each dialogue correctly
    plans2 = [_plan([2, 20, VIDEO_TOKEN_INDEX, 21], [3, 4])] * 3
    bat2 = pd_bat.run_turns([f"d{i}" for i in range(3)], plans2, memories,
                            max_new_tokens=5)
    seq2 = [pd_seq.run_turn(f"d{i}", plans2[i], memories[i], max_new_tokens=5)
            for i in range(3)]
    assert bat2 == seq2


def test_out_of_range_decode_write_goes_to_sink(setup):
    """A finished batched row keeps writing at its frozen length; when that
    position is past the row's table (or in zero-padded table entries) the
    write must land in the reserved sink page 0 — never in another
    dialogue's (or its own) live KV."""
    import jax.numpy as jnp

    from streammind_tpu.streaming.paged import PagedDialogues, _write_block

    cfg, params, engine = setup
    pd = PagedDialogues(engine, num_pages=8, page_size=8)
    assert 0 not in pd._free  # page 0 reserved at construction
    pd.open("a")
    pd.ensure_capacity("a", 16)  # 2 real pages
    assert 0 not in pd.tables["a"]

    tcfg = engine.cfg.text
    k_new = jnp.full((1, 1, tcfg.num_kv_heads, tcfg.head_dim), 7.0, jnp.float32)
    table = jnp.asarray(
        [pd.tables["a"] + [0] * (pd.max_pages - len(pd.tables["a"]))], jnp.int32
    )
    pool_k, pool_v = pd.pool.k[0], pd.pool.v[0]

    for pos in (pd.max_pages * pd.page_size,  # beyond the table entirely
                2 * pd.page_size):            # in-table but unallocated → padding 0
        nk, nv = _write_block(
            pool_k, pool_v, k_new, k_new, table,
            jnp.asarray([pos], jnp.int32), pd.page_size,
        )
        changed = np.where(np.any(np.asarray(nk) != np.asarray(pool_k),
                                  axis=(0, 2, 3)))[0]
        assert set(changed.tolist()) <= {0}, (pos, changed)
