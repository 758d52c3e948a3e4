"""End-to-end streaming demo on the real chip.

Generates a synthetic video with the native C++ encoder, opens a streaming
session at the configured fps, and prints a per-frame timeline of gate
decisions + utterances with latency stats — the product loop of
BASELINE.json config 3/4, runnable without any external data.

  python examples/streaming_demo.py [--full-size] [--frames 40] [--fps 2]

Default uses the tiny config (fast compile anywhere); --full-size runs the
production ViT-L/14-336 + Mamba-4096 + gate dims (TPU recommended).
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class DemoTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    eos_token = "</s>"

    class _O:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        return self._O([1] + [3 + (ord(c) % 200) for c in text][:24])

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"tok{i}" for i in ids)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--full-size", action="store_true")
    parser.add_argument("--frames", type=int, default=40)
    parser.add_argument("--fps", type=float, default=2.0)
    parser.add_argument("--gate-threshold", type=float, default=None,
                        help="None = argmax (random-weights demo fires ~50%)")
    parser.add_argument("--fast-vision", choices=["off", "bf16", "int8"],
                        default="off",
                        help="serving fast-ViT tier (int8 = int8-MXU matmuls)")
    parser.add_argument("--fire-every", type=int, default=0,
                        help="force a gate fire every N frames (random "
                             "weights rarely fire deterministically; this "
                             "demonstrates full cognition turns at the "
                             "chosen dims)")
    parser.add_argument("--paged", action="store_true",
                        help="serve the session from the shared page pool "
                             "(MultiStreamServer kv_mode='paged' at K=1 — "
                             "the worker's --multistream-capacity default) "
                             "instead of a dense per-session KV ring")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from streammind_tpu import native
    from streammind_tpu.config import StreamMindConfig, tiny_streammind_config
    from streammind_tpu.constants import VIDEO_TOKEN_INDEX
    from streammind_tpu.models.meta import init_streammind_params
    from streammind_tpu.streaming import StreamMindEngine, StreamSession
    from streammind_tpu.utils.profiling import StageProfiler

    if args.full_size:
        # full perception dims (ViT-L/14-336 + Mamba-4096 + 4-layer gate);
        # the decoder is cut to 8 layers so the whole bundle fits one v5e
        # chip's HBM next to the gate (a full 7B leaves no room for both —
        # cognition latency at true 7B is measured by bench_latency.py)
        import dataclasses as _dc

        base = StreamMindConfig()
        cfg = base.replace(text=_dc.replace(base.text, num_layers=8))
    else:
        cfg = tiny_streammind_config()
    dtype = jnp.bfloat16 if args.full_size else jnp.float32
    print(f"[demo] config: {'full-size' if args.full_size else 'tiny'}; "
          f"initializing params…")
    # init directly in the target dtype: a full fp32 tree + cast would
    # transiently double the footprint and OOM the chip at full size
    params = init_streammind_params(jax.random.PRNGKey(0), cfg, dtype)
    fast_vision = {"off": False, "bf16": True, "int8": "int8"}[args.fast_vision]
    engine = StreamMindEngine(params, cfg, eos_token_id=2,
                              quantize_gate=args.full_size,
                              fast_vision=fast_vision)
    tok = DemoTokenizer()
    prompt_ids = [1, 10, 11, VIDEO_TOKEN_INDEX, 12]
    if args.paged:
        import numpy as _np

        from streammind_tpu.streaming.multistream import MultiStreamServer

        srv = MultiStreamServer(engine, capacity=1, kv_mode="paged",
                                num_pages=64, page_size=64)
        srv.add_stream("demo", tok, prompt_ids=prompt_ids,
                       max_new_tokens=12, gate_threshold=args.gate_threshold)
        slot = srv.slots[0]

        def process_frame(pixels, force_fire=False):
            prev = slot.gate_threshold
            if force_fire:
                slot.gate_threshold = -1.0  # any prob fires
            try:
                return srv.step({"demo": _np.asarray(pixels)})["demo"]
            finally:
                slot.gate_threshold = prev

        turns = slot.turns
    else:
        session = StreamSession(
            engine, tok, prompt_ids=prompt_ids,
            max_new_tokens=12, gate_threshold=args.gate_threshold,
        )
        process_frame = session.process_frame
        turns = session.turns

    # synthetic video via the native encoder → native decode+preprocess
    vid = os.path.join(tempfile.mkdtemp(), "demo.mp4")
    native.write_test_video(vid, 320, 240, args.frames, int(args.fps * 5))
    vr = native.NativeVideoReader(vid)
    print(f"[demo] video: {vid} ({vr.num_frames} frames @ {vr.fps:.1f} fps)")

    prof = StageProfiler()
    size = cfg.vision.image_size
    stride = max(int(round(vr.fps / args.fps)), 1)
    frame_ids = list(range(0, vr.num_frames, stride))

    print(f"[demo] streaming {len(frame_ids)} frames at {args.fps} fps…")
    fires = 0
    for n, fid in enumerate(frame_ids):
        pixels = vr.read([fid], size=size, strict=False)
        if len(pixels) == 0:
            break
        t0 = time.perf_counter()
        force = bool(args.fire_every) and (n + 1) % args.fire_every == 0
        out = process_frame(jnp.asarray(pixels, dtype), force_fire=force)
        dt = time.perf_counter() - t0
        stage = "fire " if out is not None else "frame"
        prof.add("fire" if out is not None else "silence", dt)
        t_video = fid / vr.fps
        if out is not None:
            fires += 1
            print(f"  t={t_video:6.2f}s  [{stage}] {dt*1000:7.1f} ms  → {out[:60]!r}")
        elif n < 5 or n % 10 == 0:
            print(f"  t={t_video:6.2f}s  [{stage}] {dt*1000:7.1f} ms")

    print(f"\n[demo] {len(frame_ids)} frames, {fires} utterances, "
          f"{len(turns)} turns")
    for stage, tracker in prof.stages.items():
        s = tracker.summary()
        print(f"[demo] {stage:8s}: n={s['n']:4d}  p50={s['p50_ms']:7.1f} ms  "
              f"p99={s['p99_ms']:7.1f} ms")
    if prof.stages.get("silence") and prof.stages["silence"].mean > 0:
        print(f"[demo] silent-frame perception rate: "
              f"{1/prof.stages['silence'].mean:.1f} fps "
              f"(first-frame compile excluded: "
              f"{1/np.mean(list(prof.stages['silence'].samples)[1:] or [1]):.1f} fps)")


if __name__ == "__main__":
    main()
