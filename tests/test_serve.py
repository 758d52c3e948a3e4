"""Serving-plane tests: controller registry/dispatch/expiry and an
end-to-end controller→worker streamed generation over real HTTP sockets."""
import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

import streammind_tpu
from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.serve.controller import Controller, http_post_json, serve
from streammind_tpu.serve.model_worker import ModelWorker, serve_worker


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_controller_registry_and_dispatch():
    c = Controller("shortest_queue")
    c.worker_info.clear()
    ok = c.register_worker(
        "http://w1", False, {"model_names": ["m"], "speed": 1, "queue_length": 0}
    )
    assert ok
    c.register_worker(
        "http://w2", False, {"model_names": ["m"], "speed": 1, "queue_length": 5}
    )
    assert c.list_models() == ["m"]
    # shortest queue picks w1
    assert c.get_worker_address("m") == "http://w1"
    assert c.get_worker_address("missing") == ""
    # heartbeat for unknown worker demands re-register
    assert not c.receive_heart_beat("http://w3", 0)
    assert c.receive_heart_beat("http://w1", 2)
    c.remove_worker("http://w1")
    assert c.get_worker_address("m") == "http://w2"


@pytest.mark.slow
def test_http_end_to_end_stream(rng):
    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    model, _, _, _ = streammind_tpu.model_init(
        cfg=cfg, tokenizer=tok, dtype=jax.numpy.float32
    )

    cport, wport = _free_port(), _free_port()
    ctrl_server = serve("127.0.0.1", cport)
    t1 = threading.Thread(target=ctrl_server.serve_forever, daemon=True)
    t1.start()

    worker = ModelWorker(
        controller_addr=f"http://127.0.0.1:{cport}",
        worker_addr=f"http://127.0.0.1:{wport}",
        model_path="",
        model_name="tiny",
        model=model,
        tokenizer=tok,
    )
    wserver = serve_worker(worker, "127.0.0.1", wport)
    t2 = threading.Thread(target=wserver.serve_forever, daemon=True)
    t2.start()
    time.sleep(0.2)

    # registered?
    models = http_post_json(f"http://127.0.0.1:{cport}/list_models", {})["models"]
    assert models == ["tiny"]

    # stream a generation through the controller relay
    video = rng.standard_normal((2, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    payload = {
        "model": "tiny",
        "prompt": "[INST] <video>\n describe [/INST]",
        "video": video.tolist(),
        "max_new_tokens": 4,
        "temperature": 0.0,
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{cport}/worker_generate_stream",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=300) as resp:
        buf = b""
        while True:
            b1 = resp.read(1)
            if not b1:
                break
            if b1 == b"\0":
                chunks.append(json.loads(buf.decode()))
                buf = b""
            else:
                buf += b1
    assert chunks, "no streamed chunks received"
    assert all(c["error_code"] == 0 for c in chunks)
    # text grows monotonically (token streaming)
    lengths = [len(c["text"]) for c in chunks]
    assert lengths == sorted(lengths)

    # sampled request with the reference worker's top_p param (+top_k):
    # the filters ride the same compiled decode program
    payload2 = dict(payload, temperature=0.8, top_p=0.9, top_k=5)
    req2 = urllib.request.Request(
        f"http://127.0.0.1:{cport}/worker_generate_stream",
        data=json.dumps(payload2).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req2, timeout=300) as resp:
        body = resp.read()
    chunks2 = [json.loads(c.decode()) for c in body.split(b"\0") if c]
    assert chunks2 and all(c["error_code"] == 0 for c in chunks2)

    ctrl_server.shutdown()
    wserver.shutdown()


@pytest.mark.slow
def test_adhoc_web_server(rng):
    """In-process (no-controller) web UI mode — the reference's
    gradio_web_server_adhoc role (gradio_web_server_adhoc.py:77-133): the
    page serves, /api/list_models answers from the embedded worker, and
    /api/generate streams straight off the in-process model."""
    from http.server import ThreadingHTTPServer

    from streammind_tpu.serve.web_server import make_handler

    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    model, _, _, _ = streammind_tpu.model_init(
        cfg=cfg, tokenizer=tok, dtype=jax.numpy.float32
    )
    worker = ModelWorker(
        controller_addr="", worker_addr="", model_path="", model_name="tiny",
        model=model, tokenizer=tok, no_register=True,
    )
    port = _free_port()
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(worker=worker))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    time.sleep(0.1)

    page = urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30).read()
    assert b"StreamMind-TPU" in page

    models = http_post_json(f"http://127.0.0.1:{port}/api/list_models", {})["models"]
    assert models == ["tiny"]

    video = rng.standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    payload = {
        "prompt": "[INST] <video>\n describe [/INST]",
        "video": video.tolist(),
        "max_new_tokens": 4,
        "temperature": 0.0,
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=300) as resp:
        for part in resp.read().split(b"\0"):
            if part:
                chunks.append(json.loads(part.decode()))
    assert chunks and all(c["error_code"] == 0 for c in chunks)

    # vote logging endpoint (reference gradio_web_server upvote/downvote)
    import os
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/vote",
        data=json.dumps({"type": "upvote", "model": "tiny"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert json.loads(resp.read())["ok"]
    assert os.path.exists("log_dir/votes.jsonl")
    server.shutdown()


@pytest.mark.slow
def test_streaming_session_http(rng):
    """Live streaming-session API: start → frames (silence/fire) → stop."""
    import base64
    from io import BytesIO

    from PIL import Image

    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    model, _, _, _ = streammind_tpu.model_init(
        cfg=cfg, tokenizer=tok, dtype=jax.numpy.float32
    )
    wport = _free_port()
    worker = ModelWorker(
        controller_addr="http://none", worker_addr=f"http://127.0.0.1:{wport}",
        model_path="", model_name="tiny", model=model, tokenizer=tok,
        no_register=True,
    )
    from streammind_tpu.serve.model_worker import serve_worker as _sw

    wserver = _sw(worker, "127.0.0.1", wport)
    t = threading.Thread(target=wserver.serve_forever, daemon=True)
    t.start()
    time.sleep(0.2)

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{wport}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return json.loads(urllib.request.urlopen(req, timeout=300).read())

    sid = post("/stream_session/start", {
        "prompt": "[INST] <video>\n narrate [/INST]",
        "gate_threshold": -1.0, "max_new_tokens": 3,
    })["session_id"]

    # b64 JPEG frame path
    img = Image.fromarray(
        (rng.random((cfg.vision.image_size, cfg.vision.image_size, 3)) * 255).astype("uint8")
    )
    buf = BytesIO(); img.save(buf, format="JPEG")
    out = post("/stream_session/frame", {
        "session_id": sid, "frame_b64": base64.b64encode(buf.getvalue()).decode(),
    })
    assert out["fire"] is True and out["text"] is not None
    assert out["frame_idx"] == 1

    # raw pixels path + silence threshold change is per-session: new session
    sid2 = post("/stream_session/start", {"gate_threshold": 2.0})["session_id"]
    frame = rng.standard_normal((1, 3, cfg.vision.image_size, cfg.vision.image_size)).tolist()
    out2 = post("/stream_session/frame", {"session_id": sid2, "pixels": frame})
    assert out2["fire"] is False and out2["text"] is None

    stopped = post("/stream_session/stop", {"session_id": sid})
    assert len(stopped["turns"]) == 1
    # unknown session → clean error
    bad = post("/stream_session/frame", {"session_id": "nope", "pixels": frame})
    assert bad["error_code"] == 4
    wserver.shutdown()


@pytest.mark.slow
def test_worker_taug_grid_path(rng):
    """The reference worker's use_taug branch (model_worker.py:196-203):
    raw frames posted to a taug worker get resampled to 8*2*2, pasted into
    8 photo grids, and spliced as 8 frames; the same input without taug
    splices every frame.  The response's `frames` field exposes the
    spliced count."""
    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    model, _, _, _ = streammind_tpu.model_init(
        cfg=cfg, tokenizer=tok, dtype=jax.numpy.float32
    )
    wport = _free_port()
    worker = ModelWorker(
        controller_addr="", worker_addr=f"http://127.0.0.1:{wport}",
        model_path="", model_name="tiny", model=model, tokenizer=tok,
        no_register=True, use_taug=True,
    )
    assert worker.use_taug is True
    # the reference's model-path substring gate resolves the default
    # (model_worker.py:196 checks `"use_taug" in self.model_path`)
    w_sub = ModelWorker(
        controller_addr="", worker_addr="", no_register=True,
        model_path="/ckpts/StreamMind-7B-use_taug", model=model, tokenizer=tok,
    )
    assert w_sub.use_taug is True
    w_plain = ModelWorker(
        controller_addr="", worker_addr="", no_register=True,
        model_path="/ckpts/StreamMind-7B", model=model, tokenizer=tok,
    )
    assert w_plain.use_taug is False
    # explicit override beats the substring
    w_off = ModelWorker(
        controller_addr="", worker_addr="", no_register=True,
        model_path="/ckpts/StreamMind-7B-use_taug", model=model, tokenizer=tok,
        use_taug=False,
    )
    assert w_off.use_taug is False
    wserver = serve_worker(worker, "127.0.0.1", wport)
    t = threading.Thread(target=wserver.serve_forever, daemon=True)
    t.start()
    time.sleep(0.2)

    raw = (rng.random((12, 20, 20, 3)) * 255).astype(np.uint8)
    payload = {
        "prompt": "[INST] <video>\n describe [/INST]",
        "video": raw.tolist(),
        "max_new_tokens": 2,
        "temperature": 0.0,
    }

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{wport}/worker_generate_stream",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = resp.read()
        return [json.loads(c.decode()) for c in body.split(b"\0") if c]

    chunks = post()
    assert chunks and all(c["error_code"] == 0 for c in chunks)
    # taug: 12 raw frames -> resampled to 8*2*2=32 -> 8 spliced 2x2 grids
    assert chunks[-1]["frames"] == 8

    worker.use_taug = False
    chunks = post()
    assert chunks and all(c["error_code"] == 0 for c in chunks)
    assert chunks[-1]["frames"] == 12  # every raw frame spliced

    # float-valued raw frames (0..1-normalized, e.g. read_video()/255) must
    # not be silently truncated to 0/1 by a blind uint8 cast
    payload["video"] = (raw.astype(np.float64) / 255.0).tolist()
    chunks = post()
    assert chunks and all(c["error_code"] == 0 for c in chunks)
    assert chunks[-1]["frames"] == 12

    wserver.shutdown()
