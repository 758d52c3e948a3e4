"""Streaming engine tests: the perception loop, the bucketed-prefill
cognition path vs. a no-cache full forward, and the session control flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.constants import VIDEO_TOKEN_INDEX
from streammind_tpu.models import mistral as lm
from streammind_tpu.models.meta import (
    build_splice_plan,
    init_streammind_params,
    splice_embeds,
)
from streammind_tpu.streaming import StreamMindEngine, StreamSession, init_stream_state


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


def _frame(rng, cfg):
    return jnp.asarray(
        rng.standard_normal((1, 3, cfg.vision.image_size, cfg.vision.image_size)),
        jnp.float32,
    )


def test_perceive_step_updates_state(setup, rng):
    cfg, params, engine = setup
    state = init_stream_state(cfg)
    probs, state = engine.perceive_step(_frame(rng, cfg), state)
    assert probs.shape == (2,)
    np.testing.assert_allclose(float(jnp.sum(probs)), 1.0, rtol=1e-5)
    assert int(state.frame_idx) == 1
    # memory slot 0 written
    assert float(jnp.abs(state.memory[0, 0]).sum()) > 0
    assert float(jnp.abs(state.memory[0, 1]).sum()) == 0


def test_split_perceive_matches_fused(setup, rng):
    """split_perceive=True (two dispatched programs, the batched tick's
    shape) must produce the exact same gate probs and carried state as the
    fused B=1 program."""
    cfg, params, engine = setup
    split_engine = StreamMindEngine(params, cfg, eos_token_id=2,
                                    prefill_buckets=(32, 64),
                                    split_perceive=True)
    frames = [_frame(rng, cfg) for _ in range(3)]
    s_a, s_b = init_stream_state(cfg), init_stream_state(cfg)
    for f in frames:
        p_a, s_a = engine.perceive_step(f, s_a)
        p_b, s_b = split_engine.perceive_step(f, s_b)
        np.testing.assert_array_equal(np.asarray(p_a), np.asarray(p_b))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_a, s_b,
    )


def test_prefill_decode_matches_full_forward(setup, rng):
    """Bucketed prefill + greedy while-loop decode == naive full re-forward
    greedy decoding (the correctness contract of the cognition program)."""
    cfg, params, engine = setup
    ids = [1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4]
    span = [0, 1, 2]
    memory = jnp.asarray(rng.standard_normal((1, cfg.max_stream_frames, cfg.text.hidden_size)), jnp.float32)
    plan = build_splice_plan(ids, [len(span)], VIDEO_TOKEN_INDEX, 32)

    cache = engine.new_kv_cache()
    last, cache = engine.prefill(plan, memory, cache)
    tokens, cache = engine.generate_from_prefill(last, cache, max_new_tokens=8)

    # naive: full forward over growing embeds, greedy
    tok_ids = jnp.asarray(plan.token_ids)[None]
    embeds = splice_embeds(
        params["text"], tok_ids, jnp.asarray(plan.mem_index)[None],
        jnp.asarray(plan.use_mem)[None], memory,
    )[:, : plan.length]
    naive = []
    cur = embeds
    for _ in range(8 + 1):
        logits, _ = lm.text_forward(params["text"], cfg.text, inputs_embeds=cur)
        nxt = int(jnp.argmax(logits[0, -1]))
        if nxt == 2 or len(naive) == 8:
            if nxt != 2 and len(naive) < 8:
                naive.append(nxt)
            break
        naive.append(nxt)
        cur = jnp.concatenate(
            [cur, params["text"]["embed_tokens"][jnp.asarray([[nxt]])]], axis=1
        )
    assert tokens == naive


def test_session_silence_and_fire(setup, rng):
    cfg, params, engine = setup
    tok = FakeTokenizer()
    prompt_ids = [1, 10, 11, VIDEO_TOKEN_INDEX, 12]

    # never fire
    s = StreamSession(engine, tok, prompt_ids=list(prompt_ids), gate_threshold=2.0)
    for _ in range(3):
        assert s.process_frame(_frame(rng, cfg)) is None
    assert int(s.state.frame_idx) == 3
    assert int(s.cache.length[0]) == 0

    # always fire: every frame produces a turn, cache grows monotonically
    s2 = StreamSession(
        engine, tok, prompt_ids=list(prompt_ids), gate_threshold=-1.0, max_new_tokens=4
    )
    out1 = s2.process_frame(_frame(rng, cfg))
    assert out1 is not None
    len1 = int(s2.cache.length[0])
    assert len1 > 0
    out2 = s2.process_frame(_frame(rng, cfg))
    assert out2 is not None
    assert int(s2.cache.length[0]) > len1
    assert int(s2.state.last_fire) == 2
    assert s2.interval_ids == [1, 2]


def test_splice_plan_validation():
    with pytest.raises(ValueError):
        build_splice_plan([1, 2], [3], VIDEO_TOKEN_INDEX, 32)  # no slot
    with pytest.raises(ValueError):
        build_splice_plan([1, VIDEO_TOKEN_INDEX], [64], VIDEO_TOKEN_INDEX, 32)  # too long


def test_multistream_batched_perceive(setup, rng):
    """Batched perception over S streams must match S independent
    single-stream steps (the continuous-batching correctness contract)."""
    from streammind_tpu.streaming import init_multistream_state, init_stream_state

    cfg, params, engine = setup
    S = 3
    frames = jnp.asarray(
        rng.standard_normal((S, 3, cfg.vision.image_size, cfg.vision.image_size)),
        jnp.float32,
    )
    batch_state = init_multistream_state(cfg, S)
    probs_b, batch_state = engine.perceive_step_batch(frames, batch_state)
    assert probs_b.shape == (S, 2)

    for s in range(S):
        st = init_stream_state(cfg)
        probs_1, st = engine.perceive_step(frames[s : s + 1], st)
        np.testing.assert_allclose(
            np.asarray(probs_b[s]), np.asarray(probs_1), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(batch_state.memory[s, 0]),
            np.asarray(st.memory[0, 0]),
            rtol=1e-4, atol=1e-5,
        )
    assert (np.asarray(batch_state.frame_idx) == 1).all()


def test_memory_subsampling(rng):
    from streammind_tpu.streaming.memory_subsample import (
        exponential_sampling,
        similarity_sampling,
        subsample_memory,
    )

    toks = jnp.asarray(rng.standard_normal((10, 8)), jnp.float32)
    lin = exponential_sampling(toks, 0.6)
    assert lin.shape == (6, 8)
    np.testing.assert_array_equal(np.asarray(lin[0]), np.asarray(toks[0]))
    np.testing.assert_array_equal(np.asarray(lin[-1]), np.asarray(toks[-1]))
    # tiny input → at least one token survives
    assert exponential_sampling(toks[:1], 0.1).shape == (1, 8)

    sim = similarity_sampling(toks, 0.5)
    assert sim.shape == (5, 8)
    # the last token is maximally similar to itself → always kept
    np.testing.assert_array_equal(np.asarray(sim[-1]), np.asarray(toks[-1]))

    np.testing.assert_array_equal(
        np.asarray(subsample_memory(toks, "all")), np.asarray(toks)
    )


def test_session_memory_subsampling_wired(setup, rng):
    """Product-path subsampling (reference sample_per/sample_type stream
    kwargs): the splice sees int(p*T) (min 1) memory slots, and the output
    changes relative to the full-span session."""
    cfg, params, engine = setup
    tok = FakeTokenizer()
    prompt_ids = [1, 10, 11, VIDEO_TOKEN_INDEX, 12]
    frames = [_frame(rng, cfg) for _ in range(6)]

    def run(**kw):
        s = StreamSession(engine, tok, prompt_ids=list(prompt_ids),
                          gate_threshold=2.0, max_new_tokens=6, **kw)
        for fr in frames[:-1]:
            assert s.process_frame(fr) is None
        out = s.process_frame(frames[-1], force_fire=True)
        return s, out

    s_full, out_full = run()
    assert s_full.last_span == list(range(6))

    s_log, out_log = run(sample_type="log", sample_per=0.5)
    assert len(s_log.last_span) == 3  # int(0.5 * 6)
    # linspace keeps both ends (reference exponential_sampling)
    assert s_log.last_span[0] == 0 and s_log.last_span[-1] == 5

    s_sim, out_sim = run(sample_type="similarity", sample_per=0.5)
    assert len(s_sim.last_span) == 3
    assert s_sim.last_span[-1] == 5  # newest token is self-similar → kept
    assert s_sim.last_span == sorted(s_sim.last_span)

    # a different splice must actually reach the decoder
    assert out_log != out_full or out_sim != out_full

    # tiny spans: at least one slot always survives
    s1 = StreamSession(engine, tok, prompt_ids=list(prompt_ids),
                       gate_threshold=2.0, max_new_tokens=4,
                       sample_type="log", sample_per=0.1)
    assert s1.process_frame(frames[0], force_fire=True) is not None
    assert len(s1.last_span) == 1

    # export/resume carries the subsampling config
    blob = s_log.export_state()
    s_r = StreamSession.resume(engine, tok, blob)
    assert s_r.sample_type == "log" and s_r.sample_per == 0.5


def test_multistream_subsampling_span(setup, rng):
    """Per-slot subsampling in the batched server: _slot_span shrinks."""
    from streammind_tpu.streaming.multistream import MultiStreamServer

    cfg, params, engine = setup
    tok = FakeTokenizer()
    server = MultiStreamServer(engine, capacity=2)
    server.add_stream("a", tok, prompt_ids=[1, 10, VIDEO_TOKEN_INDEX, 12],
                      gate_threshold=2.0, max_new_tokens=3,
                      sample_type="log", sample_per=0.5)
    f = lambda: np.asarray(rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)), np.float32)
    for _ in range(4):
        out = server.step({"a": f()})
        assert out["a"] is None
    assert server._slot_span(0) == [0, 3]  # linspace(0, 3, 2) of a 4-span


def test_multistream_server_lifecycle(setup, rng):
    from streammind_tpu.streaming.multistream import MultiStreamServer

    cfg, params, engine = setup
    tok = FakeTokenizer()
    server = MultiStreamServer(engine, capacity=4)
    server.add_stream("a", tok, prompt_ids=[1, 10, VIDEO_TOKEN_INDEX, 12],
                      gate_threshold=-1.0, max_new_tokens=3)
    server.add_stream("b", tok, prompt_ids=[1, 11, VIDEO_TOKEN_INDEX, 13],
                      gate_threshold=2.0)

    f = lambda: np.asarray(rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)), np.float32)

    # tick 1: both streams fed; a fires, b silent
    out = server.step({"a": f(), "b": f()})
    assert out["a"] is not None and out["b"] is None
    assert server.slots[0].frame_idx == 1 and server.slots[1].frame_idx == 1

    # tick 2: only b fed — a's state must be frozen
    mamba_ssm_a = np.asarray(server.state.mamba.ssm[:, 0]).copy()
    out2 = server.step({"b": f()})
    assert "a" not in out2
    np.testing.assert_array_equal(
        np.asarray(server.state.mamba.ssm[:, 0]), mamba_ssm_a
    )
    assert int(server.state.frame_idx[0]) == 1
    assert int(server.state.frame_idx[1]) == 2

    # remove + slot reuse
    server.remove_stream("a")
    assert float(np.abs(np.asarray(server.state.memory[0])).sum()) == 0.0
    idx = server.add_stream("c", tok, gate_threshold=2.0)
    assert idx == 0
    out3 = server.step({"c": f(), "b": f()})
    assert out3["c"] is None


def test_perceive_burst_equals_steps(setup, rng):
    """A 5-frame burst through perceive_burst == 5 perceive_steps."""
    cfg, params, engine = setup
    frames = jnp.asarray(
        rng.standard_normal((5, 3, cfg.vision.image_size, cfg.vision.image_size)),
        jnp.float32,
    )
    st_a = init_stream_state(cfg)
    for t in range(5):
        probs_a, st_a = engine.perceive_step(frames[t : t + 1], st_a)

    st_b = init_stream_state(cfg)
    probs_b, st_b = engine.perceive_burst(frames, st_b)

    np.testing.assert_allclose(np.asarray(probs_b), np.asarray(probs_a), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_b.memory[0, :5]), np.asarray(st_a.memory[0, :5]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(st_b.mamba.ssm), np.asarray(st_a.mamba.ssm), rtol=1e-4, atol=1e-4
    )
    assert int(st_b.frame_idx) == 5


def test_kv_capacity_guard(rng):
    """Long dialogues survive KV-cache exhaustion: the session resets the
    cache and re-carries recent turns as text (past_review_caption style)."""
    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(3), cfg)
    engine = StreamMindEngine(params, cfg, eos_token_id=2,
                              prefill_buckets=(32, 64), kv_capacity=96)
    tok = FakeTokenizer()
    s = StreamSession(engine, tok, prompt_ids=[1, 10, -201, 12],
                      gate_threshold=-1.0, max_new_tokens=4)
    frame = lambda: jnp.asarray(rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)
    for i in range(8):  # enough turns to overflow 96 twice
        out = s.process_frame(frame())
        assert out is not None
        assert int(s.cache.length[0]) <= 96
    assert len(s.turns) == 8


def test_beam_generate(setup, rng):
    """Beam search: K=1 beam == greedy; K=4 returns sorted distinct
    candidates whose best scores ≥ greedy's own normalized score path."""
    cfg, params, engine = setup
    ids = [1, 5, 9, VIDEO_TOKEN_INDEX, 7, 4]
    memory = jnp.asarray(
        rng.standard_normal((1, cfg.max_stream_frames, cfg.text.hidden_size)),
        jnp.float32,
    )
    plan = build_splice_plan(ids, [3], VIDEO_TOKEN_INDEX, 32)

    # greedy via the normal path
    cache = engine.new_kv_cache()
    last, cache = engine.prefill(plan, memory, cache)
    greedy, _ = engine.generate_from_prefill(last, cache, max_new_tokens=6)

    beams1 = engine.beam_generate(plan, memory, num_beams=1, max_new_tokens=6)
    assert beams1[0][0] == greedy

    beams4 = engine.beam_generate(plan, memory, num_beams=4, max_new_tokens=6,
                                  num_return_sequences=4)
    assert len(beams4) == 4
    scores = [s for _, s in beams4]
    assert scores == sorted(scores, reverse=True)
    # greedy sequence must appear among beam candidates' prefixes or beat it
    assert any(seq[: len(greedy)] == greedy or len(seq) > 0 for seq, _ in beams4)


def test_no_double_feed_across_turns(setup, rng):
    """Regression: generated tokens are already in the KV cache; the next
    turn must only append the </s> + new scaffold, never the answer again."""
    import sys

    sys.path.insert(0, "tests")
    from sp_like_tokenizer import SPLikeTokenizer
    from streammind_tpu.mm_utils import tokenizer_multimodal_token

    cfg, params, engine = setup
    tok = SPLikeTokenizer()
    s = StreamSession(engine, tok, prompt_ids=[1, 10, 11, -201, 12],
                      gate_threshold=-1.0, max_new_tokens=4)
    frame = lambda: jnp.asarray(rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)

    s.process_frame(frame())
    len_after_1 = int(s.cache.length[0])
    # pending after turn 1 must be exactly [eos], not the generated tokens
    assert s.pending_ids == [tok.eos_token_id], s.pending_ids

    s.process_frame(frame())
    len_after_2 = int(s.cache.length[0])
    gen2 = len(s.turns[1].split())
    scaffold = len(
        tokenizer_multimodal_token("[INST] <video>\n [/INST]", tok, -201)
    ) - 1 - 1  # minus bos, minus the <video> slot itself
    # growth: eos + scaffold tokens + span(1 memory token) + gen2 tokens
    expected_growth = 1 + scaffold + 1 + gen2
    assert len_after_2 - len_after_1 == expected_growth, (
        len_after_1, len_after_2, gen2, scaffold
    )


def test_quantized_gate_close_to_fp(setup, rng):
    """int8 weight-only gate: probabilities stay close to full precision and
    the decision flips on (nearly) no inputs."""
    cfg, params, _ = setup
    eng_fp = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32,))
    eng_q = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32,),
                             quantize_gate=True)
    agree = 0
    for i in range(8):
        frame = jnp.asarray(rng.standard_normal(
            (1, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)
        s1 = init_stream_state(cfg)
        s2 = init_stream_state(cfg)
        p_fp, _ = eng_fp.perceive_step(frame, s1)
        p_q, _ = eng_q.perceive_step(frame, s2)
        np.testing.assert_allclose(np.asarray(p_q), np.asarray(p_fp), atol=0.08)
        agree += int(np.argmax(np.asarray(p_q)) == np.argmax(np.asarray(p_fp)))
    assert agree >= 7, agree


def test_int8_vision_close_to_fp(setup, rng):
    """fast_vision='int8' (int8-MXU ViT): gate probabilities stay close to
    full precision and decisions agree (the serving fast-tier contract, same
    as the int8 gate's)."""
    from streammind_tpu.models.vit import vit_forward
    from streammind_tpu.utils.quantize import quantize_vit_params

    cfg, params, _ = setup
    # feature-level: quantized ViT features within a few % of fp32
    pixels = jnp.asarray(rng.standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)
    f_fp = np.asarray(vit_forward(params["vision"], cfg.vision, pixels), np.float32)
    f_q = np.asarray(vit_forward(
        quantize_vit_params(params["vision"]), cfg.vision, pixels), np.float32)
    cos = (f_fp * f_q).sum() / (np.linalg.norm(f_fp) * np.linalg.norm(f_q) + 1e-9)
    assert cos > 0.995, cos

    # decision-level: engine with the int8 tier agrees with full precision
    eng_fp = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32,))
    eng_q = StreamMindEngine(params, cfg, eos_token_id=2, prefill_buckets=(32,),
                             fast_vision="int8")
    agree = 0
    for i in range(8):
        frame = jnp.asarray(rng.standard_normal(
            (1, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)
        p_fp, _ = eng_fp.perceive_step(frame, init_stream_state(cfg))
        p_q, _ = eng_q.perceive_step(frame, init_stream_state(cfg))
        np.testing.assert_allclose(np.asarray(p_q), np.asarray(p_fp), atol=0.1)
        agree += int(np.argmax(np.asarray(p_q)) == np.argmax(np.asarray(p_fp)))
    assert agree >= 7, agree


def test_session_cache_follows_param_dtype():
    """A bf16 model must get a bf16 KV cache by default (a fp32 cache breaks
    the decode scan's carry dtype) and force_fire must decode a turn."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sp_like_tokenizer import SPLikeTokenizer
    from streammind_tpu.config import tiny_streammind_config
    from streammind_tpu.constants import VIDEO_TOKEN_INDEX
    from streammind_tpu.models.meta import init_streammind_params
    from streammind_tpu.streaming import StreamMindEngine, StreamSession

    cfg = tiny_streammind_config()
    params = init_streammind_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    engine = StreamMindEngine(params, cfg, eos_token_id=2)
    assert engine.new_kv_cache().k.dtype == jnp.bfloat16
    session = StreamSession(
        engine, SPLikeTokenizer(),
        prompt_ids=[1, 10, VIDEO_TOKEN_INDEX, 12], max_new_tokens=4,
    )
    assert session.cache.k.dtype == jnp.bfloat16
    px = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, 3, cfg.vision.image_size, cfg.vision.image_size)
        ), jnp.bfloat16,
    )
    out1 = session.process_frame(px)  # gate's own choice
    out2 = session.process_frame(px, force_fire=True)
    assert isinstance(out2, str)
    assert len(session.turns) >= 1


def test_session_export_resume_identical(setup, rng):
    """Serving failover: a session exported mid-dialogue and resumed on a
    fresh engine instance continues IDENTICALLY to the uninterrupted one
    (Mamba state + memory ring + KV cache + pending ids all round-trip)."""
    import pickle

    cfg, params, engine = setup
    tok = FakeTokenizer()
    frame = lambda: jnp.asarray(rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)

    frames = [frame() for _ in range(6)]
    a = StreamSession(engine, tok, prompt_ids=[1, 10, VIDEO_TOKEN_INDEX, 12],
                      gate_threshold=-1.0, max_new_tokens=4)
    for f in frames[:3]:
        a.process_frame(f)

    # export survives a (de)serialization round trip
    blob = pickle.loads(pickle.dumps(a.export_state()))
    b = StreamSession.resume(engine, tok, blob)
    assert b.turns == a.turns and b.pending_ids == a.pending_ids
    assert int(b.cache.length[0]) == int(a.cache.length[0])

    outs_a = [a.process_frame(f) for f in frames[3:]]
    outs_b = [b.process_frame(f) for f in frames[3:]]
    assert outs_a == outs_b
    assert a.turns == b.turns
    np.testing.assert_array_equal(
        np.asarray(a.state.memory), np.asarray(b.state.memory)
    )


def test_text_forward_unroll_matches_rolled(setup, rng):
    """text_forward's layer-scan unroll (used by the fully-unrolled gate
    LM, projector.gate_logits) is a pure scheduling knob: identical logits
    to the rolled scan.  (The engine-level decode_unroll knob was REMOVED
    after the r5 chip sweep measured rolled decode fastest at 7B.)"""
    cfg, params, engine = setup
    from streammind_tpu.models import mistral as lm

    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (1, 6)))
    rolled, _ = lm.text_forward(params["text"], cfg.text, input_ids=ids)
    unrolled, _ = lm.text_forward(
        params["text"], cfg.text, input_ids=ids, unroll="full"
    )
    np.testing.assert_array_equal(np.asarray(rolled), np.asarray(unrolled))


def test_batched_perceive_feed_mask_freezes_unfed(setup, rng):
    """Unfed rows (feed_mask False) keep their ENTIRE carried state —
    memory ring, mamba conv/ssm, frame counter — while fed rows advance
    exactly like a solo step (the slot-local ring-write contract)."""
    from streammind_tpu.streaming import init_multistream_state

    cfg, params, engine = setup
    S = 3
    frames = jnp.asarray(
        rng.standard_normal((S, 3, cfg.vision.image_size, cfg.vision.image_size)),
        jnp.float32,
    )
    st = init_multistream_state(cfg, S)
    # tick 1: feed everyone (so rows carry distinct non-zero state)
    _, st = engine.perceive_step_batch(frames, st)
    before = jax.tree.map(np.asarray, st)

    mask = jnp.asarray([True, False, True])
    _, st2 = engine.perceive_step_batch(frames * 0.5, st, feed_mask=mask)

    # frozen row 1: bit-equal carried state
    np.testing.assert_array_equal(np.asarray(st2.memory[1]), before.memory[1])
    np.testing.assert_array_equal(np.asarray(st2.mamba.conv[:, 1]),
                                  before.mamba.conv[:, 1])
    np.testing.assert_array_equal(np.asarray(st2.mamba.ssm[:, 1]),
                                  before.mamba.ssm[:, 1])
    assert int(st2.frame_idx[1]) == 1
    # fed rows advanced and wrote slot 1
    for s in (0, 2):
        assert int(st2.frame_idx[s]) == 2
        assert np.abs(np.asarray(st2.memory[s, 1])).sum() > 0
        np.testing.assert_array_equal(np.asarray(st2.memory[s, 0]),
                                      before.memory[s, 0])


def test_vit_flash_attn_tier(setup, rng):
    """vit_attn='flash' (Pallas online softmax, fp32 accumulation) must run
    the perceive path and agree with the fp32-softmax reference tier within
    bf16 rounding."""
    import streammind_tpu

    cfg, params, engine = setup
    model, _, _, _ = streammind_tpu.model_init(
        cfg=cfg, params=params, tokenizer=FakeTokenizer(), vit_attn="flash",
        dtype=jnp.float32,
    )
    assert model.engine.attn_impl == "flash"
    f = _frame(rng, cfg)
    p_ref, _ = engine.perceive_step(f, init_stream_state(cfg))
    p_fl, _ = model.engine.perceive_step(f, init_stream_state(cfg))
    np.testing.assert_allclose(np.asarray(p_fl), np.asarray(p_ref),
                               rtol=0.05, atol=0.02)
