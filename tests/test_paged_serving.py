"""Paged KV pool wired into the serving plane (VERDICT r2 item 1).

Contract: MultiStreamServer(kv_mode="paged") — the worker's
--multistream-capacity default — serves N concurrent dialogues from ONE
shared page pool (streaming/paged.py) with
  (a) outputs identical to the dense-ring path, end to end over real HTTP,
  (b) density: many dialogues on a pool far smaller than N dense rings,
  (c) reset + text re-carry (dense ensure_turn_capacity semantics)
      preserved under pool pressure.
Reference bearing: the one-dialogue past_key_values demo
(/root/reference/streammind/model/language_model/videollama2_mistral.py:385-439)
scaled to BASELINE config 5 (one chip, many dialogues).
"""
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

import streammind_tpu
from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.serve.model_worker import ModelWorker, serve_worker
from streammind_tpu.streaming.engine import rebuild_history_pending
from streammind_tpu.streaming.multistream import MultiStreamServer


@pytest.fixture(scope="module")
def model():
    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    m, _, _, _ = streammind_tpu.model_init(cfg=cfg, tokenizer=tok,
                                           dtype=jax.numpy.float32)
    return cfg, tok, m


def _tick_frames(rng, cfg, n_streams, n_ticks):
    size = cfg.vision.image_size
    return [
        [rng.standard_normal((1, 3, size, size)).astype(np.float32)
         for _ in range(n_streams)]
        for _ in range(n_ticks)
    ]


def test_multistream_paged_matches_dense(model, rng):
    """Same frames through a dense-ring server and a paged-pool server →
    identical per-tick utterances and turn histories (multi-fire ticks run
    the batched paged cognition; a lone fire runs the sequential one)."""
    cfg, tok, m = model
    n_streams, n_ticks = 3, 4
    frames = _tick_frames(rng, cfg, n_streams, n_ticks)
    outs = {}
    for mode in ("dense", "paged"):
        srv = MultiStreamServer(m.engine, capacity=4, kv_mode=mode,
                                num_pages=64, page_size=8)
        for s in range(n_streams):
            srv.add_stream(f"s{s}", tok, gate_threshold=-1.0, max_new_tokens=4)
        log = []
        for t in range(n_ticks):
            out = srv.step({f"s{s}": frames[t][s] for s in range(n_streams)})
            log.append([out[f"s{s}"] for s in range(n_streams)])
        turns = {}
        for s in range(n_streams):
            slot = next(sl for sl in srv.slots
                        if sl is not None and sl.stream_id == f"s{s}")
            turns[f"s{s}"] = list(slot.turns)
            srv.remove_stream(f"s{s}")
        outs[mode] = (log, turns)
    assert outs["paged"] == outs["dense"]


def test_multistream_paged_density(model, rng):
    """8 live dialogues on a 48-page × 8-token pool (384 KV tokens total).
    Dense rings would pin 8 × kv_capacity tokens — orders of magnitude
    more; the pool admits all 8 because pages track ACTUAL usage."""
    cfg, tok, m = model
    srv = MultiStreamServer(m.engine, capacity=8, kv_mode="paged",
                            num_pages=48, page_size=8)
    assert 48 * 8 < 8 * m.engine.kv_capacity // 10
    for s in range(8):
        srv.add_stream(f"d{s}", tok, gate_threshold=-1.0, max_new_tokens=3)
    frames = _tick_frames(rng, cfg, 8, 2)
    for t in range(2):
        out = srv.step({f"d{s}": frames[t][s] for s in range(8)})
        for s in range(8):
            assert out[f"d{s}"], (t, s, out)
    pd = srv.paged
    used = sum(len(t) for t in pd.tables.values())
    # all 48 advertised pages are allocatable (the write sink is an extra
    # physical page, not carved out of the advertised pool)
    assert used + pd.free_pages() == 48
    assert len({p for t in pd.tables.values() for p in t}) == used  # disjoint
    # every dialogue holds real tokens, bounded by the pool
    assert all(v > 0 for v in pd.lengths.values())
    assert sum(pd.lengths.values()) <= 48 * 8


def test_paged_reset_recarries_turn_text(model):
    """The guard's reset rebuilds the pending suffix from recent turns (the
    reference's past_review_caption mechanism) and reclaims the pages."""
    cfg, tok, m = model
    srv = MultiStreamServer(m.engine, capacity=2, kv_mode="paged",
                            num_pages=16, page_size=8)
    srv.add_stream("x", tok, max_new_tokens=4)
    slot = srv.slots[0]
    srv.paged.ensure_capacity("x", 20)
    srv.paged.lengths["x"] = 20
    slot.turns = ["hello world", "second turn"]

    srv._reset_paged_slot(0, span_len=2)
    assert srv.paged.lengths["x"] == 0 and srv.paged.tables["x"] == []
    assert srv.paged.free_pages() == 16  # all advertised pages reclaimed
    expect = rebuild_history_pending(
        m.engine, tok, slot.turns, [], 2, 4,
        capacity=srv._paged_slot_capacity(),
    )
    assert slot.pending_ids == expect and expect  # non-empty re-carry
    # the re-carried ids actually encode the turn text
    assert tok("second").input_ids[-1] in slot.pending_ids


def test_paged_pool_pressure_keeps_serving(model, rng):
    """A pool too small for the dialogues' combined history: the guard
    resets (reclaim + re-carry) instead of crashing, and every tick still
    produces utterances."""
    cfg, tok, m = model
    srv = MultiStreamServer(m.engine, capacity=2, kv_mode="paged",
                            num_pages=10, page_size=8)  # 80 tokens total
    srv.add_stream("a", tok, gate_threshold=-1.0, max_new_tokens=4)
    srv.add_stream("b", tok, gate_threshold=-1.0, max_new_tokens=4)
    frames = _tick_frames(rng, cfg, 2, 6)
    lengths_seen = []
    for t in range(6):
        out = srv.step({"a": frames[t][0], "b": frames[t][1]})
        assert out["a"] is not None and out["b"] is not None
        lengths_seen.append(dict(srv.paged.lengths))
    slot_a = next(s for s in srv.slots if s is not None and s.stream_id == "a")
    assert len(slot_a.turns) == 6
    # pool pressure actually triggered reclaims: without one, every
    # dialogue's length grows monotonically and is positive after its
    # turn.  A reset shows up either as a drop between ticks, or as a
    # ZERO at tick end for a dialogue that just produced a turn (the
    # other slot's guard victimized it within the same tick).
    dropped = any(
        lengths_seen[t + 1][sid] < lengths_seen[t][sid]
        for t in range(5) for sid in ("a", "b")
    )
    zeroed = any(
        lengths_seen[t][sid] == 0 for t in range(6) for sid in ("a", "b")
    )
    assert dropped or zeroed, lengths_seen


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return json.loads(urllib.request.urlopen(req, timeout=300).read())


@pytest.mark.slow
def test_http_paged_matches_dense(model, rng):
    """Dense-equal through the real HTTP path: a worker with the paged
    default (--multistream-capacity N) streams the same utterances as a
    dense-ring worker for the same frames."""
    cfg, tok, m = model
    size = cfg.vision.image_size
    frames = [rng.standard_normal((1, 3, size, size)).tolist()
              for _ in range(3)]
    results = {}
    for mode in ("dense", "paged"):
        port = _free_port()
        worker = ModelWorker(
            controller_addr="", worker_addr="", model_path="",
            model_name="tiny", model=m, tokenizer=tok, no_register=True,
            multistream_capacity=4, kv_mode=mode, num_pages=64, page_size=8,
        )
        server = serve_worker(worker, "127.0.0.1", port)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            sid = _post(port, "/stream_session/start",
                        {"gate_threshold": -1.0, "max_new_tokens": 4})["session_id"]
            outs = [_post(port, "/stream_session/frame",
                          {"session_id": sid, "pixels": fr}) for fr in frames]
            stop = _post(port, "/stream_session/stop", {"session_id": sid})
            assert all(o["error_code"] == 0 and o["fire"] for o in outs)
            results[mode] = ([(o["fire"], o["text"]) for o in outs],
                             stop["turns"])
        finally:
            worker.broker.shutdown()
            server.shutdown()
    assert results["paged"] == results["dense"]
    assert len(results["paged"][1]) == 3
