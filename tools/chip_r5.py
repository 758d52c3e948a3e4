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
import functools
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


def run_mambaprof():
    """Decompose the B=1 mamba_project_step (~0.87 ms measured vs a
    ~0.26 ms weight-read floor: in_proj 134 MB + out_proj 67 MB +
    x/dt_proj 9 MB bf16 at ~819 GB/s).  Times each sub-op standalone
    (chained dependently so nothing hoists) to locate the overhead the
    fused Pallas step kernel must eliminate."""
    from streammind_tpu.models import projector as proj
    from streammind_tpu.ops.scan import (
        causal_conv1d_update,
        selective_state_update,
    )
    from streammind_tpu.streaming.state import init_stream_state

    cfg, params = build()
    bp = params["projector"]["mamba"]["blocks"][0]
    mcfg = cfg.mamba
    st = init_stream_state(cfg)
    feats = jax.random.normal(
        jax.random.PRNGKey(3), (1, 576, cfg.mm_hidden_size), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, mcfg.d_model), jnp.bfloat16)
    xc = jax.random.normal(jax.random.PRNGKey(5), (1, mcfg.d_inner), jnp.bfloat16)

    def timed(name, fn, feed, n_small=50, n_large=550):
        """fn: jitted (carry) -> carry-shaped output; dependently chained."""
        def bench(n):
            c = feed
            t0 = time.perf_counter()
            for _ in range(n):
                c = fn(c)
            np.asarray(c)
            return time.perf_counter() - t0
        sec = slope(bench, n_small, n_large)
        print(f"{name}: {sec*1e6:.0f} us", flush=True)

    W_in = bp["in_proj"]["weight"]
    W_x = bp["x_proj"]["weight"]
    W_dt = bp["dt_proj"]["weight"]
    W_out = bp["out_proj"]["weight"]

    # pure weight streams, dependently chained via a scalar bleed
    @jax.jit
    def mv_in(c):
        y = (x + c[:, :1] * 0) @ W_in.T.astype(x.dtype)
        return y[:, : mcfg.d_model]

    @jax.jit
    def mv_out(c):
        y = (xc + c[:, :1] * 0) @ W_out.T.astype(xc.dtype)
        return jnp.pad(y, ((0, 0), (0, mcfg.d_inner - mcfg.d_model)))

    @jax.jit
    def mv_all(c):
        xz = (x + c[:, :1] * 0) @ W_in.T.astype(x.dtype)
        a = xz[:, : mcfg.d_inner]
        dbl = a @ W_x.T.astype(x.dtype)
        dt = dbl[:, : mcfg.dt_rank_] @ W_dt.T.astype(x.dtype)
        return (a * 0 + dt) @ W_out.T.astype(x.dtype)

    timed("mv_in_proj (134MB)", mv_in, x)
    timed("mv_out_proj (67MB)", mv_out, xc)
    timed("mv_chain all 4 projs (210MB)", mv_all, x)

    # conv update + ssm update, chained on their carried state
    conv0 = st.mamba.conv[0]
    ssm0 = st.mamba.ssm[0]

    @jax.jit
    def conv_step(c):
        y, c2 = causal_conv1d_update(
            xc, c, bp["conv1d"]["weight"], bp["conv1d"].get("bias"))
        return c2

    timed("conv1d_update", conv_step, conv0)

    dt_full = jax.random.normal(jax.random.PRNGKey(6), (1, mcfg.d_inner), jnp.bfloat16)
    Bc = jax.random.normal(jax.random.PRNGKey(7), (1, mcfg.d_state), jnp.bfloat16)

    @jax.jit
    def ssm_step(c):
        A = -jnp.exp(bp["A_log"])
        y, c2 = selective_state_update(
            c, xc, dt_full, A, Bc, Bc, D=bp["D"], z=xc,
            dt_bias=bp["dt_proj"]["bias"], dt_softplus=True)
        return c2

    timed("selective_state_update", ssm_step, ssm0)

    # norms + pre/post nets + pooling glue
    pp = params["projector"]

    @jax.jit
    def glue(c):
        f = feats + c[:, :1, :1] * 0
        m = jnp.mean(f, axis=1)
        h = jax.nn.leaky_relu(
            m @ pp["pre_net"]["weight"].T.astype(m.dtype)
            + pp["pre_net"]["bias"].astype(m.dtype), negative_slope=0.01)
        return jnp.broadcast_to(h[:, None, :1], feats.shape[:2] + (1,)) + feats[:, :, :1]

    timed("pool+pre_net glue", glue, feats[:, :, :1])

    # the whole step, for the same-process reference number
    mamba = jax.jit(lambda p, f, s: proj.mamba_project_step(p, cfg, f, s))

    def bench_step(n):
        s = st.mamba
        t = None
        t0 = time.perf_counter()
        for _ in range(n):
            t, s = mamba(params["projector"], feats, s)
        np.asarray(t)
        return time.perf_counter() - t0

    bench_step(1)
    sec = slope(bench_step, 50, 550)
    print(f"mamba_project_step (whole): {sec*1e6:.0f} us", flush=True)


def run_mambaprof2():
    """In-ONE-program ablation of mamba_project_step: standalone sub-op
    timings are enqueue-bound (~140 us/call through the tunnel), so this
    builds the step cumulatively inside a single jit and reports the
    marginal cost of each stage — the number that actually localizes the
    fused program's overhead above the ~0.31 ms weight floor."""
    from streammind_tpu.ops.scan import (
        causal_conv1d_update,
        selective_state_update,
    )
    from streammind_tpu.ops.norms import layer_norm
    from streammind_tpu.streaming.state import init_stream_state

    cfg, params = build()
    mcfg = cfg.mamba
    pp = params["projector"]
    bp = pp["mamba"]["blocks"][0]
    fnorm = pp["mamba"]["final_norm"]
    st = init_stream_state(cfg)
    conv0, ssm0 = st.mamba.conv[0], st.mamba.ssm[0]
    feats = jax.random.normal(
        jax.random.PRNGKey(3), (1, 576, cfg.mm_hidden_size), jnp.bfloat16)
    dt_rank = mcfg.dt_rank_

    def step_upto(stage, f, conv_state, ssm_state):
        """Rebuild mamba_project_step piecewise; each stage adds one block."""
        x = jnp.mean(f, axis=1)
        h = jax.nn.leaky_relu(
            x @ pp["pre_net"]["weight"].T.astype(x.dtype)
            + pp["pre_net"]["bias"].astype(x.dtype), negative_slope=0.01)
        if stage == "pre":
            return h, conv_state, ssm_state
        residual = h.astype(jnp.float32)
        normed = layer_norm(
            residual[:, None, :], bp["norm"]["weight"], bp["norm"]["bias"],
            mcfg.layer_norm_eps)[:, 0, :].astype(h.dtype)
        xz = normed @ bp["in_proj"]["weight"].T.astype(h.dtype)
        xs, z = jnp.split(xz, 2, axis=-1)
        if stage == "in_proj":
            return xs + z[:, :1] * 0, conv_state, ssm_state
        xc, conv_state = causal_conv1d_update(
            xs, conv_state, bp["conv1d"]["weight"], bp["conv1d"].get("bias"))
        if stage == "conv":
            return xc, conv_state, ssm_state
        x_dbl = xc @ bp["x_proj"]["weight"].T.astype(h.dtype)
        dt, Bc, Cc = jnp.split(x_dbl, [dt_rank, dt_rank + mcfg.d_state], axis=-1)
        dt = dt @ bp["dt_proj"]["weight"].T.astype(h.dtype)
        if stage == "xdt":
            return xc + dt[:, :1] * 0, conv_state, ssm_state
        A = -jnp.exp(bp["A_log"])
        y, ssm_state = selective_state_update(
            ssm_state, xc, dt, A, Bc, Cc,
            D=bp["D"], z=z, dt_bias=bp["dt_proj"]["bias"], dt_softplus=True)
        if stage == "ssm":
            return y, conv_state, ssm_state
        out = y @ bp["out_proj"]["weight"].T.astype(h.dtype)
        if stage == "out_proj":
            return out, conv_state, ssm_state
        residual = out.astype(jnp.float32) + residual
        hid = layer_norm(
            residual[:, None, :], fnorm["weight"], fnorm["bias"],
            mcfg.layer_norm_eps)[:, 0, :].astype(h.dtype)
        if stage == "norms":
            return hid, conv_state, ssm_state
        tok = jax.nn.leaky_relu(hid, negative_slope=0.01) @ \
            pp["post_net"]["weight"].T.astype(h.dtype) \
            + pp["post_net"]["bias"].astype(h.dtype)
        return tok, conv_state, ssm_state

    prev = 0.0
    for stage in ["pre", "in_proj", "conv", "xdt", "ssm", "out_proj",
                  "norms", "full"]:
        fn = jax.jit(functools.partial(step_upto, stage),
                     donate_argnums=(1, 2))

        def bench(n, _fn=fn):
            # fresh copies: the jit donates the state args, so the originals
            # would be invalidated after the first bench invocation
            cs, ss = jnp.array(conv0), jnp.array(ssm0)
            np.asarray(jnp.sum(ss))  # materialize before the timer
            t = None
            t0 = time.perf_counter()
            for _ in range(n):
                t, cs, ss = _fn(feats, cs, ss)
            np.asarray(t)
            return time.perf_counter() - t0

        sec = slope(bench, 50, 550)
        print(f"upto {stage}: {sec*1e6:.0f} us (+{(sec-prev)*1e6:.0f})",
              flush=True)
        prev = sec


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
            "exact": run_exact, "mambaprof": run_mambaprof,
            "mambaprof2": run_mambaprof2}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        sys.exit(f"usage: python tools/chip_r5.py {{{'|'.join(cmds)}}}")
    cmds[sys.argv[1]]()
