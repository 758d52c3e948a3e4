"""HTTP model worker: hosts the two jitted programs and streams generations.

Protocol parity with the reference worker
(/root/reference/streammind/serve/model_worker.py):
  - registers with the controller at startup (:118-129)
  - heartbeats every WORKER_HEART_BEAT_INTERVAL seconds, re-registering if
    the controller forgot it (:130-149)
  - POST /worker_generate_stream: params {prompt, video(base64/np path) |
    images, temperature, max_new_tokens, stop} → \\0-framed JSON chunks
    {"text": ..., "error_code": 0} (:166-300)
  - POST /worker_get_status: {model_names, speed, queue_length} (:344-361)
  - bounded concurrency via a semaphore (:151-156)

stdlib HTTP; generation streams token-by-token through
StreamMindEngine.decode_stream (the XLA analogue of TextIteratorStreamer).
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..constants import WORKER_HEART_BEAT_INTERVAL, MMODAL_TOKEN_INDEX
from ..utils.logging import build_logger
from .controller import SERVER_ERROR_MSG, http_post_json

logger = build_logger("model_worker", "model_worker.log")


class ModelWorker:
    def __init__(
        self,
        controller_addr: str,
        worker_addr: str,
        model_path: str,
        model_name: Optional[str] = None,
        limit_model_concurrency: int = 5,
        no_register: bool = False,
        model=None,
        tokenizer=None,
        quantize_gate: bool = False,
        fast_vision: bool = False,
        load_8bit: bool = False,
        load_4bit: bool = False,
        multistream_capacity: int = 0,
        kv_mode: str = "paged",
        num_pages: Optional[int] = None,
        page_size: int = 64,
        prewarm: bool = False,
        model_base: Optional[str] = None,  # base decoder for LoRA /
        # adapter checkpoints (reference --model-base)
        use_taug: Optional[bool] = None,  # temporal-aug photo grid; None =
        # model-path substring, like the reference worker
        vit_attn: str = "auto",  # ViT attention impl (see api.model_init)
    ):
        self.worker_id = str(uuid.uuid4())[:6]
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.model_name = model_name or (model_path.split("/")[-1] if model_path else "streammind")
        self.semaphore = threading.Semaphore(limit_model_concurrency)
        self.limit = limit_model_concurrency
        self._active = 0
        self._waiting = 0
        self._sessions = {}
        self._sessions_lock = threading.Lock()

        if model is None:
            from ..api import model_init

            # defaults are the BIT-FAITHFUL config (quantize_gate/fast_vision
            # off).  The fast config (int8 gate + bf16-softmax ViT, the
            # measured 160 fps / 267 fps-aggregate numbers) deviates ~2% on
            # features / 0.08 gate prob on random init only — opt in via
            # --quantize-gate/--fast-vision until validated on real weights
            model, self.processor, tokenizer, self.version = model_init(
                model_path, quantize_gate=quantize_gate, fast_vision=fast_vision,
                load_8bit=load_8bit, load_4bit=load_4bit, model_base=model_base,
                vit_attn=vit_attn,
            )
        else:
            self.processor, self.version = None, "llama_2"
        self.model = model
        self.tokenizer = tokenizer
        # temporal-augmentation grid sampling for one-shot video requests
        # (reference serve/model_worker.py:196-203 gates it on "use_taug"
        # in the model path; --use-taug overrides explicitly)
        self.use_taug = (
            "use_taug" in (model_path or "") if use_taug is None else use_taug
        )

        # multistream_capacity > 0: live sessions share one batched
        # MultiStreamServer via the micro-batching broker (serve/broker.py)
        # instead of one StreamSession each — concurrent HTTP streams land
        # in the same perception/cognition batch.  kv_mode defaults to
        # "paged": dialogues share ONE page pool (streaming/paged.py)
        # instead of a ~1 GB dense KV ring each, so density scales with the
        # sum of live lengths (BASELINE config 5); --kv-mode dense opts out.
        self.broker = None
        if multistream_capacity > 0 and self.model is not None:
            from .broker import BatchedSessionBroker

            self.broker = BatchedSessionBroker(
                self.model.engine, capacity=multistream_capacity,
                kv_mode=kv_mode, num_pages=num_pages, page_size=page_size,
            )
            if prewarm:
                self._prewarm_broker()

        if not no_register:
            self.register_to_controller()
            t = threading.Thread(target=self._heartbeat_loop, daemon=True)
            t.start()

    def _prewarm_broker(self):
        """Compile the batched perception program BEFORE serving: at full
        7B dims the first tick takes minutes on a cold cache, which would
        otherwise land on the first client's frame (and, pre-fix, blow the
        broker submit timeout).  Runs one synthetic silent tick through
        the real server.step path."""
        import numpy as np

        size = self.model.cfg.vision.image_size
        srv = self.broker.server
        t0 = time.time()
        logger.info("prewarm: compiling batched perception...")
        with self.broker._step_lock, self.broker._cv:
            srv.add_stream("__warm__", self.tokenizer, gate_threshold=2.0)
        frame = np.zeros((1, 3, size, size), np.float32)
        with self.broker._step_lock:
            srv.step({"__warm__": frame})
        with self.broker._step_lock, self.broker._cv:
            srv.remove_stream("__warm__")
        logger.info(f"prewarm done in {time.time() - t0:.1f}s")

    # -- controller plumbing ---------------------------------------------
    def register_to_controller(self):
        logger.info("Register to controller")
        http_post_json(
            self.controller_addr + "/register_worker",
            {
                "worker_name": self.worker_addr,
                "check_heart_beat": True,
                "worker_status": self.get_status(),
            },
        )

    def _heartbeat_loop(self):
        while True:
            time.sleep(WORKER_HEART_BEAT_INTERVAL)
            try:
                exist = http_post_json(
                    self.controller_addr + "/receive_heart_beat",
                    {
                        "worker_name": self.worker_addr,
                        "queue_length": self.get_queue_length(),
                    },
                    timeout=5,
                )["exist"]
                if not exist:
                    self.register_to_controller()
            except Exception as e:  # noqa: BLE001
                logger.error(f"heart beat error: {e}")

    def get_queue_length(self) -> int:
        # in-flight (holding the semaphore) + blocked waiting for it
        return (self.limit - self.semaphore._value) + self._waiting

    def get_status(self) -> dict:
        return {
            "model_names": [self.model_name],
            "speed": 1,
            "queue_length": self.get_queue_length(),
        }

    # -- generation -------------------------------------------------------
    def _decode_video_param(self, params: dict):
        """video: base64 npz / nested list / server-side path."""
        if "video_b64" in params:
            raw = base64.b64decode(params["video_b64"])
            arr = np.load(io.BytesIO(raw))
            return arr["pixels"] if hasattr(arr, "files") else np.asarray(arr)
        if "video_path" in params and self.processor is not None:
            if self.use_taug:
                from ..constants import NUM_FRAMES
                from ..mm_utils import process_video_taug

                # same knobs as self.processor (api.model_init): the
                # config's frame count, no square padding — a video must
                # preprocess identically whichever ingestion route it takes
                return process_video_taug(
                    params["video_path"],
                    num_frames=self.model.cfg.num_frames or NUM_FRAMES,
                    aspect_ratio=None,
                    image_size=self.model.cfg.vision.image_size,
                )
            return self.processor(params["video_path"])
        if "video" in params:
            arr = np.asarray(params["video"])
            if arr.ndim == 4 and arr.shape[-1] == 3 and arr.shape[1] != 3:
                # raw (T, H, W, 3) frames — run the worker's video
                # preprocessing (the reference always process_videos()es
                # decoded frames), with the taug grid when enabled
                from ..constants import NUM_FRAMES
                from ..mm_utils import process_video, process_video_taug

                if np.issubdtype(arr.dtype, np.floating):
                    # float frames: 0..1-normalized or already 0..255
                    if arr.max() <= 1.0 + 1e-6:
                        arr = arr * 255.0
                    arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
                else:
                    # JSON transport widens uint8 to int64
                    arr = np.clip(arr, 0, 255).astype(np.uint8)
                size = self.model.cfg.vision.image_size
                nf = self.model.cfg.num_frames or NUM_FRAMES
                if self.use_taug:
                    return process_video_taug(arr, num_frames=nf,
                                              aspect_ratio=None,
                                              image_size=size)
                return process_video(arr, num_frames=nf, aspect_ratio=None,
                                     image_size=size)
            return arr.astype(np.float32)
        if "images" in params:
            # reference worker protocol: a list of base64 images / arrays
            from io import BytesIO
            from PIL import Image

            from ..mm_utils import clip_preprocess

            frames = []
            for img in params["images"]:
                if isinstance(img, str):
                    frames.append(Image.open(BytesIO(base64.b64decode(img))))
                else:
                    frames.append(Image.fromarray(np.asarray(img, np.uint8)))
            size = self.model.cfg.vision.image_size
            return clip_preprocess(frames, image_size=size)
        return None

    def generate_stream(self, params: dict):
        from .. import api

        prompt = params["prompt"]
        temperature = float(params.get("temperature", 0.0))
        # reference worker protocol forwards top_p (model_worker.py:250,275);
        # top_k is the decode engine's other filter (generation.py:37-119)
        top_p = float(params.get("top_p", 1.0))
        top_k = int(params.get("top_k", 0))
        max_new_tokens = min(int(params.get("max_new_tokens", 256)), 1024)
        stop_str = params.get("stop")

        video = self._decode_video_param(params)
        if video is None:
            yield json.dumps(
                {"text": "(no video provided)", "error_code": 1}
            ).encode() + b"\0"
            return

        import jax
        import jax.numpy as jnp

        from ..mm_utils import tokenizer_multimodal_token
        from ..models import projector as proj_mod
        from ..models.meta import build_splice_plan, bucket_length, encode_frames

        model, tokenizer = self.model, self.tokenizer
        cfg, engine = model.cfg, model.engine
        modal_index = MMODAL_TOKEN_INDEX["VIDEO"]
        input_ids = tokenizer_multimodal_token(prompt, tokenizer, modal_index)

        pixels = jnp.asarray(video, api.engine_dtype(model))
        n_frames = int(pixels.shape[0])  # spliced frame count (taug grids count once)
        feats = encode_frames(model.params, cfg, pixels)
        memory = proj_mod.project_memory(model.params["projector"], cfg, feats)
        T = memory.shape[1]
        plan = build_splice_plan(
            input_ids, [T], modal_index,
            bucket_length(len(input_ids) - 1 + T, engine.buckets),
        )
        mem_buf = jnp.zeros((1, max(cfg.max_stream_frames, T), memory.shape[-1]), memory.dtype)
        mem_buf = jax.lax.dynamic_update_slice(mem_buf, memory, (0, 0, 0))

        # one-shot request: right-size the cache (full-ring decode reads
        # cost 30 ms/token at the 8192 session default vs 12 at 1024)
        cache = engine.new_kv_cache(
            dtype=memory.dtype,
            capacity=engine.cache_capacity_for(len(plan.token_ids), max_new_tokens),
        )
        last, cache = engine.prefill(plan, mem_buf, cache)

        from .safety import SAFETY_MSG, safety_check

        rng_key = None
        if temperature > 0:
            import os as _os

            rng_key = jax.random.PRNGKey(
                int.from_bytes(_os.urandom(4), "little")
            )  # fresh randomness per request (reference do_sample parity)
        generated: list = []
        text = ""
        for tok in engine.decode_stream(
            last, cache, max_new_tokens=max_new_tokens, temperature=temperature,
            top_k=top_k, top_p=top_p, rng_key=rng_key,
        ):
            generated.append(tok)
            try:
                text = tokenizer.decode(generated, skip_special_tokens=True)
            except TypeError:
                text = tokenizer.decode(generated)
            # periodic keyword safety scan (reference model_worker.py:286-295)
            if len(generated) % 8 == 0 and not safety_check(text):
                yield json.dumps({"text": SAFETY_MSG, "error_code": 1}).encode() + b"\0"
                return
            if stop_str and stop_str in text:
                text = text.split(stop_str)[0]
                yield json.dumps({"text": text, "error_code": 0,
                                  "frames": n_frames}).encode() + b"\0"
                return
            yield json.dumps({"text": text, "error_code": 0,
                              "frames": n_frames}).encode() + b"\0"

    # -- live streaming-video sessions (the event-gated product loop) -------
    MAX_SESSIONS = 16
    SESSION_TTL_S = 1800.0

    def _sweep_sessions(self) -> None:
        """Evict idle sessions past TTL, then oldest-idle beyond the cap —
        each session pins a full KV cache + memory ring."""
        now = time.time()
        with self._sessions_lock:
            for sid in [s for s, (sess, lock, used) in self._sessions.items()
                        if now - used > self.SESSION_TTL_S]:
                del self._sessions[sid]
            while len(self._sessions) >= self.MAX_SESSIONS:
                oldest = min(self._sessions, key=lambda s: self._sessions[s][2])
                del self._sessions[oldest]

    def stream_session_start(self, params: dict) -> dict:
        self._sweep_sessions()
        sid = params.get("session_id") or str(uuid.uuid4())[:8]
        prompt = params.get("prompt")
        prompt_ids = None
        if prompt:
            from ..constants import MMODAL_TOKEN_INDEX
            from ..mm_utils import tokenizer_multimodal_token

            prompt_ids = tokenizer_multimodal_token(
                prompt, self.tokenizer, MMODAL_TOKEN_INDEX["VIDEO"]
            )
        sampling = dict(
            temperature=float(params.get("temperature", 0.0)),
            top_k=int(params.get("top_k", 0)),
            top_p=float(params.get("top_p", 0.0)),
            # memory-token subsampling before the splice (reference
            # sample_per/sample_type stream kwargs)
            sample_type=str(params.get("sample_type", "all")),
            sample_per=float(params.get("sample_per", 0.5)),
        )
        if self.broker is not None:
            try:
                self.broker.add(
                    sid, self.tokenizer, prompt_ids=prompt_ids,
                    max_new_tokens=int(params.get("max_new_tokens", 128)),
                    gate_threshold=params.get("gate_threshold"),
                    **sampling,
                )
            except (RuntimeError, ValueError) as e:
                return {"error": str(e), "error_code": 2}
            return {"session_id": sid}
        from ..streaming.engine import StreamSession

        session = StreamSession(
            self.model.engine, self.tokenizer, prompt_ids=prompt_ids,
            max_new_tokens=int(params.get("max_new_tokens", 128)),
            gate_threshold=params.get("gate_threshold"),
            **sampling,
        )
        with self._sessions_lock:
            self._sessions[sid] = (session, threading.Lock(), time.time())
        return {"session_id": sid}

    def _decode_frame(self, params: dict):
        import jax.numpy as jnp

        from ..mm_utils import clip_preprocess

        if "frame_b64" not in params and "pixels" not in params:
            return None
        if "frame_b64" in params:
            from io import BytesIO
            from PIL import Image

            img = Image.open(BytesIO(base64.b64decode(params["frame_b64"])))
            size = self.model.cfg.vision.image_size
            return jnp.asarray(clip_preprocess([img], image_size=size))
        return jnp.asarray(np.asarray(params["pixels"], np.float32))

    def stream_session_frame(self, params: dict) -> dict:
        sid = params.get("session_id")
        if self.broker is not None:
            try:
                pixels = self._decode_frame(params)
                if pixels is None:
                    return {"error": "no frame provided (frame_b64 or pixels)",
                            "error_code": 1}
                out = self.broker.submit(sid, pixels)
                if out.pop("closed", False):
                    return {"error": f"session {sid} closed", "error_code": 4}
                if out.get("error"):
                    return {"error": out.pop("error"), "error_code": 1, **out}
                return {**out, "error_code": 0}
            except KeyError:
                return {"error": f"unknown session {sid}", "error_code": 4}
            except Exception as e:  # noqa: BLE001
                logger.exception("batched stream_session_frame error")
                return {"error": f"{type(e).__name__}: {e}", "error_code": 1}
        with self._sessions_lock:
            entry = self._sessions.get(sid)
        if entry is None:
            return {"error": f"unknown session {sid}", "error_code": 4}
        session, lock, _ = entry
        try:
            pixels = self._decode_frame(params)
            if pixels is None:
                return {"error": "no frame provided (frame_b64 or pixels)",
                        "error_code": 1}
            # per-session serialization: concurrent frames would hand the
            # same donated StreamState to two perceive calls
            with lock:
                text = session.process_frame(pixels)
                with self._sessions_lock:
                    if sid in self._sessions:
                        self._sessions[sid] = (session, lock, time.time())
            return {
                "fire": text is not None,
                "text": text,
                "frame_idx": int(session.state.frame_idx),
                "error_code": 0,
            }
        except Exception as e:  # noqa: BLE001
            logger.exception("stream_session_frame error")
            return {"error": f"{type(e).__name__}: {e}", "error_code": 1}

    def stream_session_stop(self, params: dict) -> dict:
        sid = params.get("session_id")
        if self.broker is not None:
            try:
                out = self.broker.remove(sid)
            except KeyError:
                return {"error": f"unknown session {sid}", "error_code": 4}
            return {**out, "error_code": 0}
        with self._sessions_lock:
            entry = self._sessions.pop(sid, None)
        if entry is None:
            return {"error": f"unknown session {sid}", "error_code": 4}
        session, lock, _ = entry
        with lock:  # let an in-flight frame finish
            return {"turns": session.turns, "intervals": session.interval_ids,
                    "error_code": 0}

    def generate_stream_gate(self, params: dict):
        try:
            self._waiting += 1
            with self.semaphore:
                self._waiting -= 1
                self._active += 1
                try:
                    yield from self.generate_stream(params)
                finally:
                    self._active -= 1
        except Exception as e:  # noqa: BLE001
            logger.exception("generate error")
            yield json.dumps(
                {"text": f"{SERVER_ERROR_MSG}\n\n({e})", "error_code": 1}
            ).encode() + b"\0"


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("%s - %s" % (self.address_string(), fmt % args))

        def _json(self, payload: dict, status: int = 200):
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            data = json.loads(self.rfile.read(length) or b"{}")
            path = self.path.rstrip("/")
            if path == "/worker_generate_stream":
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                for chunk in worker.generate_stream_gate(data):
                    self.wfile.write(chunk)
                    self.wfile.flush()
            elif path == "/worker_get_status":
                self._json(worker.get_status())
            elif path == "/stream_session/start":
                self._json(worker.stream_session_start(data))
            elif path == "/stream_session/frame":
                self._json(worker.stream_session_frame(data))
            elif path == "/stream_session/stop":
                self._json(worker.stream_session_stop(data))
            else:
                self._json({"error": f"unknown path {path}"}, status=404)

    return Handler


def serve_worker(worker: ModelWorker, host: str, port: int) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), make_handler(worker))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=21002)
    parser.add_argument("--controller-address", type=str, default="http://localhost:10000")
    parser.add_argument("--worker-address", type=str, default="http://localhost:21002")
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, default=None,
                        help="base decoder dir for LoRA / adapter "
                             "checkpoints (reference --model-base)")
    parser.add_argument("--model-name", type=str, default=None)
    parser.add_argument("--limit-model-concurrency", type=int, default=5)
    parser.add_argument("--no-register", action="store_true")
    parser.add_argument("--quantize-gate", nargs="?", const="int8",
                        choices=["int8", "int4"], default=None,
                        help="weight-only quantized gate (fast config; "
                             "default: bit-faithful full precision). "
                             "Bare flag = int8; 'int4' uses the fused "
                             "Pallas int4 matvec (ops/int4_matvec.py)")
    parser.add_argument("--fast-vision", choices=["bf16", "int8"], default=None,
                        help="fast ViT tier: bf16 = bf16-softmax blocks; "
                             "int8 = int8-MXU matmuls + bf16 softmax "
                             "(default: bit-faithful fp32 softmax)")
    parser.add_argument("--load-8bit", action="store_true",
                        help="decoder rests int8 (half memory; 21→12.4 "
                             "ms/token decode at 7B on v5e)")
    parser.add_argument("--load-4bit", action="store_true",
                        help="decoder rests packed int4 (quarter memory; "
                             "dequant-on-read, slower than int8 — a "
                             "fit-bigger-models option, not a speed one)")
    parser.add_argument("--multistream-capacity", type=int, default=0,
                        help="> 0: live stream sessions share one batched "
                             "MultiStreamServer of this capacity (concurrent "
                             "HTTP streams land in the same perception/"
                             "cognition batch; serve/broker.py)")
    parser.add_argument("--kv-mode", choices=["paged", "dense"], default="paged",
                        help="multistream KV memory model: paged (default) = "
                             "all dialogues share one page pool, resident KV "
                             "tracks the sum of live lengths; dense = one "
                             "~kv_capacity ring per dialogue")
    parser.add_argument("--num-pages", type=int, default=None,
                        help="paged pool size in pages (default: half the "
                             "dense-equivalent page count for the capacity)")
    parser.add_argument("--page-size", type=int, default=64,
                        help="tokens per KV page (multiple of 8)")
    parser.add_argument("--vit-attn", choices=["auto", "exact", "flash", "bf16"],
                        default="auto",
                        help="ViT attention impl: auto = fp32-softmax jnp "
                             "reference; exact = Pallas VMEM-resident "
                             "full-row fp32 softmax (the reference's "
                             "reduction structure, none of its S^2 HBM "
                             "traffic); flash = Pallas online softmax "
                             "(fp32 accumulation, no materialized S^2 "
                             "traffic); bf16 = fast-tier softmax")
    parser.add_argument("--use-taug", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="temporal-augmentation photo grid for one-shot "
                             "video requests: 8*2*2 linearly sampled frames "
                             "pasted into 8 2x2 grids (default: enabled "
                             "when 'use_taug' is in the model path, like "
                             "the reference worker)")
    parser.add_argument("--prewarm", action="store_true",
                        help="compile the batched perception program at "
                             "startup (first-tick compile takes minutes at "
                             "7B; without this it lands on the first "
                             "client frame)")
    args = parser.parse_args()
    worker = ModelWorker(
        args.controller_address,
        args.worker_address,
        args.model_path,
        args.model_name,
        args.limit_model_concurrency,
        args.no_register,
        quantize_gate=args.quantize_gate,
        fast_vision={None: False, "bf16": True, "int8": "int8"}[args.fast_vision],
        load_8bit=args.load_8bit,
        load_4bit=args.load_4bit,
        multistream_capacity=args.multistream_capacity,
        kv_mode=args.kv_mode,
        num_pages=args.num_pages,
        page_size=args.page_size,
        prewarm=args.prewarm,
        model_base=args.model_base,
        use_taug=args.use_taug,
        vit_attn=args.vit_attn,
    )
    server = serve_worker(worker, args.host, args.port)
    logger.info(f"worker listening on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
