"""Round-5 chip experiments (run SOLO on the tunneled TPU, one subcommand
per process — chip work must be strictly serialized):

  python tools/chip_r5.py perceive   # B=1 fused vs split, both tiers
  python tools/chip_r5.py scaling    # batched tick S in {8, 16, 32}
  python tools/chip_r5.py stages     # B=1 stage profile (vit/mamba/gate)
  python tools/chip_r5.py vitattn    # ViT attention-impl shootout (B=1/B=8)

(decode unroll sweep: _sweep_unroll.py; full record: bench.py;
paged serving drive: bench_paged_serving.py)

All timings use the slope method — np.asarray forces execution on the
tunneled platform; block_until_ready alone does not (verify SKILL.md).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, n_small, n_large):
    fn(1)  # warm/compile
    a, b = fn(n_small), fn(n_large)
    return (b - a) / (n_large - n_small)


def build():
    from bench import build_params
    from streammind_tpu.config import StreamMindConfig

    cfg = StreamMindConfig()
    return cfg, build_params(cfg)


def frame(cfg, s=1, seed=1):
    return jax.random.normal(
        jax.random.PRNGKey(seed),
        (s, 3, cfg.vision.image_size, cfg.vision.image_size), jnp.bfloat16,
    )


def run_perceive():
    from streammind_tpu.streaming.engine import StreamMindEngine
    from streammind_tpu.streaming.state import init_stream_state

    cfg, params = build()
    px = frame(cfg)
    for tier, kw in [("bit_faithful", {}),
                     ("fast", dict(quantize_gate=True, fast_vision="int8"))]:
        for split in (False, True):
            eng = StreamMindEngine(params, cfg, split_perceive=split, **kw)

            def bench(n):
                s = init_stream_state(cfg)
                g = None
                t0 = time.perf_counter()
                for _ in range(n):
                    g, s = eng.perceive_step(px, s)
                np.asarray(g)
                return time.perf_counter() - t0

            sec = slope(bench, 10, 110)
            print(f"{tier} split={split}: {sec*1e3:.2f} ms/frame "
                  f"({1/sec:.1f} fps)", flush=True)
            del eng


def run_scaling():
    from streammind_tpu.streaming.engine import StreamMindEngine
    from streammind_tpu.streaming.state import init_multistream_state

    cfg, params = build()
    eng = StreamMindEngine(params, cfg, quantize_gate=True, fast_vision="int8")
    for s_streams in (8, 16, 32):
        px = frame(cfg, s_streams, seed=2)

        def bench(n):
            st = init_multistream_state(cfg, s_streams)
            g = None
            t0 = time.perf_counter()
            for _ in range(n):
                g, st = eng.perceive_step_batch(px, st)
            np.asarray(g)
            return time.perf_counter() - t0

        sec = slope(bench, 5, 45)
        print(f"S={s_streams}: {sec*1e3:.2f} ms/tick "
              f"({s_streams/sec:.1f} fps aggregate)", flush=True)


def run_stages():
    from streammind_tpu.models import projector as proj
    from streammind_tpu.models.vit import fuse_vit_qkv, vit_forward
    from streammind_tpu.streaming.state import init_stream_state

    cfg, params = build()
    vision = fuse_vit_qkv(params["vision"])
    px = frame(cfg)
    st = init_stream_state(cfg)

    vit = jax.jit(lambda p, x: vit_forward(p, cfg.vision, x, unroll="full"))
    feats = vit(vision, px)

    def b_vit(n):
        t0 = time.perf_counter()
        for _ in range(n):
            f = vit(vision, px)
        np.asarray(f)
        return time.perf_counter() - t0

    mamba = jax.jit(
        lambda p, f, s: proj.mamba_project_step(p, cfg, f, s))
    tok, _ = mamba(params["projector"], feats, st.mamba)

    def b_mamba(n):
        t = None
        t0 = time.perf_counter()
        for _ in range(n):
            t, _ = mamba(params["projector"], feats, st.mamba)
        np.asarray(t)
        return time.perf_counter() - t0

    gate = jax.jit(lambda p, t: proj.gate_decision_step(p, cfg, t))

    def b_gate(n):
        g = None
        t0 = time.perf_counter()
        for _ in range(n):
            g = gate(params["projector"], tok)
        np.asarray(g)
        return time.perf_counter() - t0

    for name, fn, (a, b) in [("vit", b_vit, (10, 110)),
                             ("mamba_step", b_mamba, (10, 110)),
                             ("gate", b_gate, (10, 110))]:
        print(f"{name}: {slope(fn, a, b)*1e3:.3f} ms", flush=True)


def run_vitattn():
    """ViT attention-impl shootout at B=1 (and B=8): the reference jnp path
    materializes (H, 577, 577) fp32 logits + probs per layer (~1.5 GB/frame
    of HBM traffic over 24 layers) — flash keeps the online softmax in VMEM.
    Reports per-impl ms and rms vs the fp32 reference output."""
    from streammind_tpu.models.vit import fuse_vit_qkv, vit_forward
    from streammind_tpu.utils.quantize import quantize_vit_params

    cfg, params = build()
    trees = {
        "bf16": fuse_vit_qkv(params["vision"]),
        "int8": fuse_vit_qkv(quantize_vit_params(params["vision"])),
    }
    for batch in (1, 8):
        px = frame(cfg, batch)
        ref = None
        for tree_name, tree in trees.items():
            impls = (["auto", "exact", "flash", "bf16"] if tree_name == "bf16"
                     else ["bf16", "exact", "flash"])
            for impl in impls:
                fwd = jax.jit(lambda p, x, _i=impl: vit_forward(
                    p, cfg.vision, x, attn_impl=_i, unroll="full"))

                def bench(n, _fwd=fwd, _tree=tree, _px=px):
                    f = None
                    t0 = time.perf_counter()
                    for _ in range(n):
                        f = _fwd(_tree, _px)
                    np.asarray(f)
                    return time.perf_counter() - t0

                sec = slope(bench, 10, 60)
                out = np.asarray(fwd(tree, px), np.float32)
                if ref is None:
                    ref = out  # bf16 tree + fp32-softmax reference
                rms = float(np.sqrt(np.mean((out - ref) ** 2))
                            / (np.sqrt(np.mean(ref ** 2)) + 1e-9))
                # the exact kernel claims mha_reference's reduction
                # structure — check bitwise equality against the jnp
                # fp32-softmax tower ON REAL TPU (CPU interpret can't)
                bitwise = (" BITWISE==auto" if impl == "exact"
                           and tree_name == "bf16"
                           and np.array_equal(out, ref) else "")
                print(f"B={batch} vit[{tree_name}] impl={impl}: "
                      f"{sec*1e3:.2f} ms  (rms vs fp32-ref {rms:.2e})"
                      f"{bitwise}", flush=True)


def run_exact():
    """End-to-end tiers with attn_impl='exact' (the r5 VMEM-resident
    full-row fp32-softmax kernel): B=1 both tiers + batched scaling —
    the decide-the-defaults measurement (vs perceive/scaling logs)."""
    from streammind_tpu.streaming.engine import StreamMindEngine
    from streammind_tpu.streaming.state import (
        init_multistream_state,
        init_stream_state,
    )

    cfg, params = build()
    px = frame(cfg)
    for tier, kw in [("bit_faithful", {}),
                     ("fast", dict(quantize_gate=True, fast_vision="int8"))]:
        eng = StreamMindEngine(params, cfg, attn_impl="exact", **kw)

        def bench(n, _eng=eng):
            s = init_stream_state(cfg)
            g = None
            t0 = time.perf_counter()
            for _ in range(n):
                g, s = _eng.perceive_step(px, s)
            np.asarray(g)
            return time.perf_counter() - t0

        sec = slope(bench, 10, 110)
        print(f"{tier} attn=exact: {sec*1e3:.2f} ms/frame "
              f"({1/sec:.1f} fps)", flush=True)
        del eng

    eng = StreamMindEngine(params, cfg, attn_impl="exact",
                           quantize_gate=True, fast_vision="int8")
    for s_streams in (8, 16, 32):
        pxs = frame(cfg, s_streams, seed=2)

        def bench(n, _px=pxs, _s=s_streams):
            st = init_multistream_state(cfg, _s)
            g = None
            t0 = time.perf_counter()
            for _ in range(n):
                g, st = eng.perceive_step_batch(_px, st)
            np.asarray(g)
            return time.perf_counter() - t0

        sec = slope(bench, 5, 45)
        print(f"S={s_streams} attn=exact: {sec*1e3:.2f} ms/tick "
              f"({s_streams/sec:.1f} fps aggregate)", flush=True)


if __name__ == "__main__":
    cmds = {"perceive": run_perceive, "scaling": run_scaling,
            "stages": run_stages, "vitattn": run_vitattn,
            "exact": run_exact}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        sys.exit(f"usage: python tools/chip_r5.py {{{'|'.join(cmds)}}}")
    cmds[sys.argv[1]]()
