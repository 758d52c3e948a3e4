"""Full-dims drive of the PAGED serving plane (VERDICT r2 item 8).

One live multi-dialogue run at real 7B dims through the whole product
stack — HTTP worker → micro-batching broker → MultiStreamServer →
shared page pool — on the real chip.  Per the ROADMAP lesson that
production bugs only fall out of full-size runs, this exercises:

  - int8 7B decoder + int8 gate (the serving density config; bf16 7B
    weights alone are 14.5 GB and leave no room for a pool),
  - K concurrent HTTP clients whose frames land in one batched tick,
  - batched paged cognition (one prefill + one lockstep decode over the
    pool) when all K gates fire together,
  - the page pool (256 pages x 64 tok = 16k tokens shared; K dense rings
    at capacity 8192 would pin K x 1.07 GB).

Prints one JSON line per phase:
  phase "perceive": silent ticks (no fires) — ms/tick at K streams
  phase "cognify":  every-tick fires — ms/turn-tick and aggregate tok/s

Weights are constant-filled (random init at 7B OOMs through fp32
transients; timing depends only on shapes).  Timings include HTTP, JPEG
decode + CLIP preprocess, and tunnel round-trips — the end-to-end number,
not the device-program number (those are in PARITY.md).
"""
import base64
import io
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

K = int(__import__("os").environ.get("PAGED_BENCH_K", "4"))
NUM_PAGES = 256
PAGE_SIZE = 64
MAX_NEW = 16
TICKS = 12


class WordTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    eos_token = "</s>"

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        return self._Out([1] + [3 + (hash(w) % 30000) for w in text.split()][:24])

    def decode(self, ids, **kw):
        return " ".join(f"<{i}>" for i in ids)


def build_model():
    from streammind_tpu.api import StreamMindModel
    from streammind_tpu.config import StreamMindConfig
    from streammind_tpu.models.meta import init_streammind_params
    from streammind_tpu.streaming.engine import StreamMindEngine
    from streammind_tpu.utils.quantize import quantize_text_params

    from streammind_tpu.utils.quantize import quantize_gate_params

    cfg = StreamMindConfig()
    shapes = jax.eval_shape(
        lambda k: init_streammind_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    # Build the QUANTIZED structure directly (eval_shape through the
    # quantizers): the bf16 full tree (14.5 GB text + ~1.7 GB gate +
    # vision) does not fit a 16 GB chip even transiently.
    shapes["text"] = jax.eval_shape(
        lambda p: quantize_text_params(p, bits=8), shapes["text"]
    )
    proj_shapes = dict(shapes["projector"])
    proj_shapes["cls_net"] = jax.eval_shape(
        quantize_gate_params, proj_shapes["cls_net"]
    )
    shapes["projector"] = proj_shapes

    def fill(s):
        if s.dtype == jnp.int8:
            return jnp.full(s.shape, 1, s.dtype)
        return jnp.full(s.shape, 0.01, s.dtype)

    params = jax.tree.map(fill, shapes)
    engine = StreamMindEngine(
        params, cfg, fast_vision="int8",
        kv_capacity=NUM_PAGES * PAGE_SIZE // 2,
    )
    return StreamMindModel(params=engine.params, cfg=cfg, engine=engine)


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return json.loads(urllib.request.urlopen(req, timeout=600).read())


def _jpeg_b64(size):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def run_phase(port, gate_threshold, label, ticks=TICKS, sampling=None):
    size = 336
    frame = _jpeg_b64(size)
    sids = []
    for i in range(K):
        out = _post(port, "/stream_session/start",
                    {"session_id": f"{label}{i}", "gate_threshold": gate_threshold,
                     "max_new_tokens": MAX_NEW, **(sampling or {})})
        sids.append(out["session_id"])

    tick_times = []
    errs = []

    def client(sid, results):
        results[sid] = _post(port, "/stream_session/frame",
                             {"session_id": sid, "frame_b64": frame})

    # warm-up ticks OUTSIDE the timed loop: first-tick compilation at full
    # dims takes minutes on the tunneled platform
    for _ in range(3):
        results = {}
        threads = [threading.Thread(target=client, args=(sid, results))
                   for sid in sids]
        for th in threads:
            th.start()
        for th in threads:
            th.join()

    for t in range(ticks):
        results = {}
        threads = [threading.Thread(target=client, args=(sid, results))
                   for sid in sids]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = time.perf_counter() - t0
        for sid, r in results.items():
            if r.get("error_code"):
                errs.append((t, sid, r))
        tick_times.append(dt)
    for sid in sids:
        _post(port, "/stream_session/stop", {"session_id": sid})
    return tick_times, errs


def run_phase_device(worker, gate_threshold, label, ticks=TICKS):
    """Same tick loop WITHOUT HTTP/JPEG: pre-decoded pixels straight into
    MultiStreamServer.step — isolates the device+broker cost from the
    host ingest cost."""
    from streammind_tpu.mm_utils import clip_preprocess
    from PIL import Image
    import io as _io

    raw = base64.b64decode(_jpeg_b64(336))
    img = Image.open(_io.BytesIO(raw))
    t0 = time.perf_counter()
    for _ in range(8):
        pixels = clip_preprocess([img], image_size=336)
    host_ms = (time.perf_counter() - t0) / 8 * 1e3

    broker = worker.broker
    with broker._step_lock, broker._cv:
        for i in range(K):
            broker.server.add_stream(f"{label}{i}", worker.tokenizer,
                                     gate_threshold=gate_threshold,
                                     max_new_tokens=MAX_NEW)
    frames = {f"{label}{i}": np.asarray(pixels) for i in range(K)}
    times = []
    for t in range(ticks):
        with broker._step_lock:
            t0 = time.perf_counter()
            out = broker.server.step(frames)
            dt = time.perf_counter() - t0
        assert len(out) == K
        if t >= 2:
            times.append(dt)
    with broker._step_lock, broker._cv:
        for i in range(K):
            broker.server.remove_stream(f"{label}{i}")
    return times, host_ms


def main():
    model = build_model()
    tok = WordTokenizer()
    from streammind_tpu.serve.model_worker import ModelWorker, serve_worker

    worker = ModelWorker(
        controller_addr="", worker_addr="", model_path="",
        model_name="streammind-7b-int8", model=model, tokenizer=tok,
        no_register=True, multistream_capacity=K, kv_mode="paged",
        num_pages=NUM_PAGES, page_size=PAGE_SIZE,
    )
    port = _free_port()
    server = serve_worker(worker, "127.0.0.1", port)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    silent, errs_a = run_phase(port, 2.0, "s")
    p50 = float(np.median(silent))
    print(json.dumps({
        "phase": "perceive", "streams": K,
        "ms_per_tick_p50": round(p50 * 1e3, 1),
        "aggregate_fps": round(K / p50, 1),
        "errors": errs_a[:3],
    }), flush=True)

    # every-tick fires WITH the r4 serving features on: top-p sampling in
    # the batched decode loop + memory-token subsampling before the splice
    # (VERDICT r4 item 8 — drive the features at full dims, not just tiny)
    turns, errs_b = run_phase(
        port, -1.0, "c",
        sampling={"temperature": 0.8, "top_p": 0.9,
                  "sample_type": "similarity", "sample_per": 0.5},
    )
    p50t = float(np.median(turns))
    print(json.dumps({
        "phase": "cognify", "streams": K, "max_new_tokens": MAX_NEW,
        "sampling": "temperature=0.8 top_p=0.9 sample_type=similarity",
        "ms_per_turn_tick_p50": round(p50t * 1e3, 1),
        "aggregate_tok_s": round(K * MAX_NEW / p50t, 1),
        "broker_ticks": worker.broker.ticks,
        "frames_seen": worker.broker.frames_seen,
        "errors": errs_b[:3],
    }), flush=True)

    # device-side breakdown (no HTTP / no JPEG): where the tick time goes
    dev_sil, host_ms = run_phase_device(worker, 2.0, "ds")
    print(json.dumps({
        "phase": "perceive_device", "streams": K,
        "ms_per_tick_p50": round(float(np.median(dev_sil)) * 1e3, 1),
        "host_preprocess_ms_per_frame": round(host_ms, 1),
    }), flush=True)
    dev_turn, _ = run_phase_device(worker, -1.0, "dc")
    p50d = float(np.median(dev_turn))
    print(json.dumps({
        "phase": "cognify_device", "streams": K, "max_new_tokens": MAX_NEW,
        "ms_per_turn_tick_p50": round(p50d * 1e3, 1),
        "aggregate_tok_s": round(K * MAX_NEW / p50d, 1),
    }), flush=True)
    worker.broker.shutdown()
    server.shutdown()


if __name__ == "__main__":
    main()
