"""Batched session broker: concurrent HTTP-style callers share one
MultiStreamServer tick (the serving-plane half of continuous batching)."""
import threading
import time

import jax
import numpy as np
import pytest

import streammind_tpu
from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.constants import VIDEO_TOKEN_INDEX
from streammind_tpu.serve.broker import BatchedSessionBroker
from streammind_tpu.serve.model_worker import ModelWorker


@pytest.fixture(scope="module")
def model():
    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    m, _, _, _ = streammind_tpu.model_init(cfg=cfg, tokenizer=tok,
                                           dtype=jax.numpy.float32)
    return cfg, tok, m


def test_broker_batches_concurrent_streams(model, rng):
    cfg, tok, m = model
    broker = BatchedSessionBroker(m.engine, capacity=4, max_wait_ms=60.0)
    try:
        for sid in ("a", "b", "c"):
            broker.add(sid, tok, prompt_ids=[1, 10, VIDEO_TOKEN_INDEX, 12],
                       gate_threshold=-1.0, max_new_tokens=3)
        size = cfg.vision.image_size
        n_rounds = 3
        results = {sid: [] for sid in ("a", "b", "c")}
        barrier = threading.Barrier(3)

        def run(sid):
            r = np.random.default_rng(hash(sid) % 1000)
            for _ in range(n_rounds):
                barrier.wait()  # all three submit together
                frame = r.standard_normal((1, 3, size, size)).astype(np.float32)
                results[sid].append(broker.submit(sid, frame))

        threads = [threading.Thread(target=run, args=(sid,))
                   for sid in ("a", "b", "c")]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(not t.is_alive() for t in threads)

        for sid, outs in results.items():
            assert len(outs) == n_rounds
            # gate_threshold=-1 → every frame fires and decodes a turn
            assert all(o["fire"] and isinstance(o["text"], str) for o in outs), outs
            assert [o["frame_idx"] for o in outs] == [1, 2, 3]
        # batching: 9 frames landed in fewer ticks than 9 (barrier-synced
        # submissions; exact tick count depends on scheduler timing)
        assert broker.frames_seen == 9
        assert broker.ticks < 9, broker.ticks

        out = broker.remove("a")
        assert len(out["turns"]) == n_rounds
        with pytest.raises(KeyError):
            broker.submit("a", np.zeros((1, 3, size, size), np.float32))
    finally:
        broker.shutdown()


def test_worker_multistream_sessions(model, rng):
    """ModelWorker(multistream_capacity=N): the /stream_session API is
    served by the shared batched server instead of per-session objects."""
    cfg, tok, m = model
    worker = ModelWorker(
        controller_addr="", worker_addr="", model_path="", model_name="tiny",
        model=m, tokenizer=tok, no_register=True, multistream_capacity=4,
    )
    size = cfg.vision.image_size
    s1 = worker.stream_session_start({"prompt": "[INST] <video>\n [/INST]",
                                      "gate_threshold": 2.0})
    s2 = worker.stream_session_start({"gate_threshold": -1.0,
                                      "max_new_tokens": 3})
    f = lambda: rng.standard_normal((1, 3, size, size)).tolist()

    o1 = worker.stream_session_frame({"session_id": s1["session_id"], "pixels": f()})
    o2 = worker.stream_session_frame({"session_id": s2["session_id"], "pixels": f()})
    assert o1["error_code"] == 0 and not o1["fire"]
    assert o2["error_code"] == 0 and o2["fire"] and o2["text"]

    bad = worker.stream_session_frame({"session_id": "nope", "pixels": f()})
    assert bad["error_code"] == 4

    stop = worker.stream_session_stop({"session_id": s2["session_id"]})
    assert stop["error_code"] == 0 and len(stop["turns"]) == 1
    worker.broker.shutdown()


def test_broker_eviction_and_error_isolation(model, rng):
    cfg, tok, m = model
    size = cfg.vision.image_size
    broker = BatchedSessionBroker(m.engine, capacity=2, max_wait_ms=5.0)
    try:
        broker.add("a", tok, gate_threshold=2.0)
        broker.add("b", tok, gate_threshold=2.0)
        # pool full; a is idle → adding c evicts the oldest idle session
        broker.add("c", tok, gate_threshold=2.0)
        assert broker.active() == 2
        with pytest.raises(KeyError):
            broker.submit("a", np.zeros((1, 3, size, size), np.float32))

        # a malformed frame fails ITS caller but the tick thread survives
        out = broker.submit("b", np.zeros((2, 2), np.float32))
        assert "error" in out
        ok = broker.submit(
            "b", rng.standard_normal((1, 3, size, size)).astype(np.float32))
        assert "error" not in ok and ok["frame_idx"] >= 1
    finally:
        broker.shutdown()


def test_worker_prewarm_compiles_before_serving(model, rng):
    """--prewarm runs one synthetic silent tick through server.step at
    startup so first-tick compilation doesn't land on a client frame."""
    cfg, tok, m = model
    worker = ModelWorker(
        controller_addr="", worker_addr="", model_path="", model_name="tiny",
        model=m, tokenizer=tok, no_register=True, multistream_capacity=2,
        kv_mode="paged", num_pages=32, page_size=8, prewarm=True,
    )
    try:
        assert worker.broker.active() == 0  # warm slot removed
        s = worker.stream_session_start({"gate_threshold": -1.0,
                                         "max_new_tokens": 3})
        size = cfg.vision.image_size
        out = worker.stream_session_frame({
            "session_id": s["session_id"],
            "pixels": rng.standard_normal((1, 3, size, size)).tolist(),
        })
        assert out["error_code"] == 0 and out["fire"]
    finally:
        worker.broker.shutdown()


def test_session_id_reuse_after_stop(model, rng):
    """stop() posts a closed sentinel; re-opening a session with the SAME
    client-chosen id must not serve that stale sentinel to the new
    session's first frame."""
    cfg, tok, m = model
    broker = BatchedSessionBroker(m.engine, capacity=2, max_wait_ms=5.0)
    try:
        size = cfg.vision.image_size
        frame = lambda: np.zeros((1, 3, size, size), np.float32)
        broker.add("reuse", tok, gate_threshold=2.0)
        assert not broker.submit("reuse", frame()).get("closed")
        broker.remove("reuse")  # leaves an unclaimed closed sentinel
        broker.add("reuse", tok, gate_threshold=2.0)
        out = broker.submit("reuse", frame())
        assert not out.get("closed") and out["frame_idx"] == 1, out
    finally:
        broker.shutdown()
