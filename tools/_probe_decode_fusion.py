"""Solo chip probe: where the 7B int8 decode step's non-floor ~2 ms lives.

Probe v2 measured the scanned fat-MLP int8 stream at 728 GB/s (89% of
HBM peak), which accounts for ~9.9 ms of the measured 12.12 ms/token.
This probe times scanned L=8 decode-LAYER-shaped weight streams:
  separate — q(4096²) k(4096·1024) v(4096·1024) o(4096²)
             gate(14336·4096) up(14336·4096) down(4096·14336)
  fused    — qkv(6144·4096) o(4096²) gateup(28672·4096) down
to see whether the smaller attention projections stream below the fat
MLP's efficiency and whether row-concatenation fusion (bit-identical
per-row dots) recovers it.  205.5 MB/layer either way; 1.64 GB per
program; floor 2.01 ms at 819 GB/s.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp


def slope(fn, n_small, n_large):
    fn(1)
    a, b = fn(n_small), fn(n_large)
    return (b - a) / (n_large - n_small)


def bench_chain(fn, x0, n_small=5, n_large=55):
    def run(n):
        c = x0
        t0 = time.perf_counter()
        for _ in range(n):
            c = fn(c)
        np.asarray(c)
        return time.perf_counter() - t0
    return slope(run, n_small, n_large)


def main():
    L, d, dkv, dmid = 8, 4096, 1024, 14336
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("out", "inn"))
    def mk(k, out, inn):
        w = jax.random.normal(k, (out, inn), jnp.float32) * 0.02
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-8)
        q = jnp.clip(jnp.round(w / s[:, None]), -127, 127).astype(jnp.int8)
        return q, s.astype(jnp.float32)

    shapes = {"q": (d, d), "k": (dkv, d), "v": (dkv, d), "o": (d, d),
              "gate": (dmid, d), "up": (dmid, d), "down": (d, dmid)}
    bank = {}
    for name, (out, inn) in shapes.items():
        qs, ss = [], []
        for i in range(L):
            qq, s = mk(jax.random.fold_in(jax.random.fold_in(key, hash(name) % 2**31), i), out, inn)
            qs.append(qq); ss.append(s)
        bank[name] = (jax.jit(lambda xs: jnp.stack(xs, 0))(qs),
                      jax.jit(lambda xs: jnp.stack(xs, 0))(ss))
        del qs, ss

    # fused banks: row-concat along out — same bytes, fewer/fatter GEMMs
    cat = jax.jit(lambda *xs: jnp.concatenate(xs, axis=1))
    qkv8 = cat(bank["q"][0], bank["k"][0], bank["v"][0])
    qkvs = cat(bank["q"][1], bank["k"][1], bank["v"][1])
    gu8 = cat(bank["gate"][0], bank["up"][0])
    gus = cat(bank["gate"][1], bank["up"][1])

    x0 = jax.random.normal(key, (1, d), jnp.bfloat16)

    def mv(x, w, s):
        return (x @ w.T.astype(x.dtype)) * s.astype(x.dtype)

    @jax.jit
    def scan_sep(x, bq, sq, bk, sk, bv, sv, bo, so, bg, sg, bu, su, bd, sd):
        def body(c, layer):
            (wq, q_s, wk, k_s, wv, v_s, wo, o_s,
             wg, g_s, wu, u_s, wd, d_s) = layer
            qh = mv(c, wq, q_s)
            kh = mv(c, wk, k_s)
            vh = mv(c, wv, v_s)
            # stand-in mix so all outputs feed o (attention itself elided —
            # this probes the weight stream, not the KV reads)
            a = qh + jnp.pad(kh + vh, ((0, 0), (0, qh.shape[1] - kh.shape[1])))
            y = mv(a, wo, o_s)
            g = mv(y, wg, g_s)
            u = mv(y, wu, u_s)
            h = jax.nn.silu(g) * u
            return mv(h, wd, d_s).astype(c.dtype), ()
        y, _ = jax.lax.scan(
            body, x, (bq, sq, bk, sk, bv, sv, bo, so, bg, sg, bu, su, bd, sd))
        return y

    @jax.jit
    def scan_fused(x, bqkv, sqkv, bo, so, bgu, sgu, bd, sd):
        def body(c, layer):
            wqkv, qkv_s, wo, o_s, wgu, gu_s, wd, d_s = layer
            qkv = mv(c, wqkv, qkv_s)
            qh = qkv[:, :d]
            kh = qkv[:, d:d + dkv]
            vh = qkv[:, d + dkv:]
            a = qh + jnp.pad(kh + vh, ((0, 0), (0, d - dkv)))
            y = mv(a, wo, o_s)
            gu = mv(y, wgu, gu_s)
            h = jax.nn.silu(gu[:, :dmid]) * gu[:, dmid:]
            return mv(h, wd, d_s).astype(c.dtype), ()
        y, _ = jax.lax.scan(body, x, (bqkv, sqkv, bo, so, bgu, sgu, bd, sd))
        return y

    n_bytes = L * (d*d*2 + dkv*d*2 + dmid*d*3)
    sep = functools.partial(
        scan_sep,
        bq=bank["q"][0], sq=bank["q"][1], bk=bank["k"][0], sk=bank["k"][1],
        bv=bank["v"][0], sv=bank["v"][1], bo=bank["o"][0], so=bank["o"][1],
        bg=bank["gate"][0], sg=bank["gate"][1], bu=bank["up"][0],
        su=bank["up"][1], bd=bank["down"][0], sd=bank["down"][1])
    fused = functools.partial(
        scan_fused, bqkv=qkv8, sqkv=qkvs, bo=bank["o"][0], so=bank["o"][1],
        bgu=gu8, sgu=gus, bd=bank["down"][0], sd=bank["down"][1])
    for name, fn in [("sep", sep), ("fused", fused)]:
        sec = bench_chain(fn, x0)
        print(f"decode-layer {name}: {sec*1e3:.3f} ms  "
              f"eff {n_bytes/sec/1e9:.0f} GB/s "
              f"(logical {n_bytes/1e6:.0f} MB; floor 2.01 ms)", flush=True)

    a = np.asarray(fused(x0), np.float32)
    b = np.asarray(sep(x0), np.float32)
    print(f"fused-vs-sep max abs delta {float(np.max(np.abs(a-b))):.3e} "
          f"(row-concat should be bit-identical)", flush=True)


if __name__ == "__main__":
    main()
