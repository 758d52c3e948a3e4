"""Benchmark: per-stream perception throughput (ViT-L/14-336 encode + Mamba
step + gate) on one chip — the BASELINE.json primary metric.

Prints ONE JSON line:
  {"metric": "perception_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/100}
(baseline: the 100 fps/chip target from BASELINE.json; the reference
publishes no machine-readable numbers — BASELINE.md).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from streammind_tpu.config import StreamMindConfig
    from streammind_tpu.models import projector as proj
    from streammind_tpu.models.mamba import init_mamba_state
    from streammind_tpu.models.vit import init_vit_params, vit_forward
    from streammind_tpu.utils.params import cast_tree

    from streammind_tpu.utils.quantize import quantize_gate_params, quantize_vit_params

    cfg = StreamMindConfig()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = cast_tree(
        {
            "vision": init_vit_params(k1, cfg.vision, jnp.float32),
            "projector": proj.init_projector_params(k2, cfg, jnp.float32),
        },
        jnp.bfloat16,
    )
    # serving configuration (the engine's fast tier): weight-only int8 gate
    # (decisions agree with bf16 within the tested 0.08 prob tolerance) +
    # int8-MXU ViT (features within 2.2% rms of bf16, cos > 0.9997).
    # bf16 everything: 134 fps; +int8 gate: 160; +int8 ViT: see output.
    params["projector"]["cls_net"] = quantize_gate_params(params["projector"]["cls_net"])
    params["vision"] = quantize_vit_params(params["vision"])

    @jax.jit
    def perceive(params, pixels, mamba_state):
        # serving config: bf16-softmax ViT (engine fast_vision=True)
        feats = vit_forward(params["vision"], cfg.vision, pixels, attn_impl="bf16")
        mem_tok, mamba_state = proj.mamba_project_step(
            params["projector"], cfg, feats, mamba_state
        )
        logits = proj.gate_decision_step(params["projector"], cfg, mem_tok)
        gate = jax.nn.softmax(logits[0].astype(jnp.float32))
        return gate, mamba_state

    import numpy as np

    pixels = jax.random.normal(
        jax.random.PRNGKey(1), (1, 3, cfg.vision.image_size, cfg.vision.image_size), jnp.bfloat16
    )
    state0 = init_mamba_state(cfg.mamba, batch=1)

    # warmup / compile (np.asarray forces real execution — on the tunneled
    # device platform block_until_ready alone does not)
    gate, _ = perceive(params, pixels, state0)
    np.asarray(gate)

    def run(n):
        s = state0
        g = None
        t0 = time.perf_counter()
        for _ in range(n):
            g, s = perceive(params, pixels, s)
        np.asarray(g)
        return time.perf_counter() - t0

    # slope method: subtracts fixed dispatch/fetch latency
    t_small, t_large = run(10), run(110)
    per_frame = (t_large - t_small) / 100
    fps = 1.0 / per_frame
    print(
        json.dumps(
            {
                "metric": "perception_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
