"""Serving-plane soak: concurrent clients churn sessions against the
paged broker — starts, frames, stops, evictions and pool pressure all
interleaved from many threads.

This is the thread-safety property test the reference never had (its
threading is guarded by a single lock around a progress counter,
SURVEY §5): every response must be well-formed, no deadlock/timeout, and
after all sessions close the page pool must account for every page.
"""
import random
import threading

import jax
import numpy as np
import pytest

import streammind_tpu
from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.serve.model_worker import ModelWorker


@pytest.mark.slow
def test_broker_session_churn_soak():
    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    m, _, _, _ = streammind_tpu.model_init(cfg=cfg, tokenizer=tok,
                                           dtype=jax.numpy.float32)
    worker = ModelWorker(
        controller_addr="", worker_addr="", model_path="", model_name="tiny",
        model=m, tokenizer=tok, no_register=True, multistream_capacity=4,
        kv_mode="paged", num_pages=24, page_size=8,  # small pool → pressure
        prewarm=True,
    )
    n_clients = 6  # > capacity: forces eviction churn too
    frames_per_client = 10
    size = cfg.vision.image_size
    errors: list = []
    malformed: list = []

    def client(ci):
        rng = np.random.default_rng(ci)
        sid = None
        try:
            for f in range(frames_per_client):
                if sid is None or rng.random() < 0.15:
                    if sid is not None:
                        worker.stream_session_stop({"session_id": sid})
                    out = worker.stream_session_start({
                        "session_id": f"c{ci}-{f}",
                        # mixed workloads: half the clients fire every frame
                        "gate_threshold": -1.0 if ci % 2 else 2.0,
                        "max_new_tokens": 3,
                    })
                    if "session_id" not in out:
                        # pool full with every slot mid-frame is a valid
                        # refusal, not a malformed response
                        if out.get("error_code") != 2:
                            malformed.append((ci, f, out))
                        sid = None
                        continue
                    sid = out["session_id"]
                r = worker.stream_session_frame({
                    "session_id": sid,
                    "pixels": rng.standard_normal((1, 3, size, size)).tolist(),
                })
                ok_shapes = (
                    r.get("error_code") in (0, 1, 4)
                    and ("fire" in r or "error" in r)
                )
                if not ok_shapes:
                    malformed.append((ci, f, r))
                if r.get("error_code") == 4:
                    sid = None  # evicted by another client's add — rejoin
            if sid is not None:
                worker.stream_session_stop({"session_id": sid})
        except Exception as e:  # noqa: BLE001
            errors.append((ci, repr(e)))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads), "soak deadlocked"
    assert not errors, errors[:3]
    assert not malformed, malformed[:3]

    # drain: close whatever survived, then the pool must balance
    broker = worker.broker
    for slot in list(broker.server.slots):
        if slot is not None:
            broker.remove(slot.stream_id)
    pd = broker.server.paged
    assert pd.tables == {} and pd.lengths == {}
    # everything reclaimed: all 24 advertised pages free again (the pool
    # carries a 25th physical page as the reserved write sink)
    assert pd.free_pages() == 24
    assert broker.active() == 0
    broker.shutdown()
