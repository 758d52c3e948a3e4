"""Benchmark: per-stream perception throughput (ViT-L/14-336 encode + Mamba
step + gate) on one chip — the BASELINE.json primary metric — measured
through the PRODUCT path (StreamMindEngine.perceive_step), in BOTH serving
tiers:

  - bit-faithful: the worker default (fp32-softmax ViT, full-precision
    gate) — what you get without opting into anything;
  - fast: the opt-in serving tier (--quantize-gate --fast-vision int8):
    weight-only int8 gate (decisions agree with bf16 within the tested
    0.08 prob tolerance) + int8-MXU ViT (features within 2.2% rms of bf16).

Prints ONE JSON line; the headline value stays the fast tier for
continuity with BENCH_r01/r02, with the bit-faithful number alongside so a
regression in the engine path (vs its building blocks) can't hide
(VERDICT r2 item 2).

  {"metric": "perception_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/100, "perception_fps_bit_faithful": M, ...}

(baseline: the 100 fps/chip target from BASELINE.json; the reference
publishes no machine-readable numbers — BASELINE.md).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_params(cfg):
    from streammind_tpu.models import projector as proj
    from streammind_tpu.models.vit import init_vit_params
    from streammind_tpu.utils.params import cast_tree

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return cast_tree(
        {
            "vision": init_vit_params(k1, cfg.vision, jnp.float32),
            "projector": proj.init_projector_params(k2, cfg, jnp.float32),
        },
        jnp.bfloat16,
    )


def bench_engine(engine, pixels, n_small=10, n_large=110):
    """Per-frame seconds of engine.perceive_step via the slope method
    (subtracts fixed dispatch/fetch latency).  np.asarray forces real
    execution — on the tunneled device platform block_until_ready alone
    does not."""
    from streammind_tpu.streaming.state import init_stream_state

    g, _ = engine.perceive_step(pixels, init_stream_state(engine.cfg))
    np.asarray(g)  # compile + sync

    def run(n):
        # fresh state per run: perceive_step DONATES the carried state
        s = init_stream_state(engine.cfg)
        g = None
        t0 = time.perf_counter()
        for _ in range(n):
            g, s = engine.perceive_step(pixels, s)
        np.asarray(g)
        return time.perf_counter() - t0

    t_small, t_large = run(n_small), run(n_large)
    return (t_large - t_small) / (n_large - n_small)


def bench_engine_batch(engine, pixels, n_small=5, n_large=45):
    """Seconds per batched tick of engine.perceive_step_batch (S streams)."""
    from streammind_tpu.streaming.state import init_multistream_state

    s_streams = pixels.shape[0]
    g, _ = engine.perceive_step_batch(pixels, init_multistream_state(engine.cfg, s_streams))
    np.asarray(g)

    def run(n):
        s = init_multistream_state(engine.cfg, s_streams)
        g = None
        t0 = time.perf_counter()
        for _ in range(n):
            g, s = engine.perceive_step_batch(pixels, s)
        np.asarray(g)
        return time.perf_counter() - t0

    t_small, t_large = run(n_small), run(n_large)
    return (t_large - t_small) / (n_large - n_small)


def main():
    from streammind_tpu.config import StreamMindConfig
    from streammind_tpu.streaming.engine import StreamMindEngine

    cfg = StreamMindConfig()
    params = build_params(cfg)
    pixels = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 3, cfg.vision.image_size, cfg.vision.image_size),
        jnp.bfloat16,
    )

    # bit-faithful tier: the worker default (serve/model_worker.py)
    eng_exact = StreamMindEngine(params, cfg)
    s_exact = bench_engine(eng_exact, pixels)
    del eng_exact

    # fast tier: --quantize-gate --fast-vision int8
    eng_fast = StreamMindEngine(params, cfg, quantize_gate=True, fast_vision="int8")
    s_fast = bench_engine(eng_fast, pixels)

    # continuous-batched perception: S=8 live streams through ONE tick
    # (BASELINE config 5's aggregate-throughput shape)
    n_streams = 8
    pixels8 = jax.random.normal(
        jax.random.PRNGKey(2),
        (n_streams, 3, cfg.vision.image_size, cfg.vision.image_size),
        jnp.bfloat16,
    )
    s_batch = bench_engine_batch(eng_fast, pixels8)

    fps_fast = 1.0 / s_fast
    fps_exact = 1.0 / s_exact
    fps_agg = n_streams / s_batch
    print(
        json.dumps(
            {
                "metric": "perception_fps_per_chip",
                "value": round(fps_fast, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_fast / 100.0, 3),
                "perception_fps_bit_faithful": round(fps_exact, 2),
                "perception_fps_s8_aggregate": round(fps_agg, 2),
                "tier": "fast (int8 gate + int8-MXU ViT), via "
                        "StreamMindEngine.perceive_step",
            }
        )
    )


if __name__ == "__main__":
    main()
