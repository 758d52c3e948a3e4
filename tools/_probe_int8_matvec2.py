"""Solo chip probe v2: int8 matvec arms measured INSIDE one scanned program.

Probe v1's chained single-call timings were unstable (the same XLA arm
measured 429 us one run, 249 the next) and reported a >HBM-peak slope for
the Pallas arm — with 550 enqueued data-dependent programs, the slope can
track host enqueue rate rather than device work.  This probe instead
builds a stacked L=8 bank of distinct MLP-pair weights (936 MB int8) and
times ONE jit program that lax.scans the pair over all 8 layers — the
exact shape of the real decode loop, dispatch overhead amortized to
~2% and no possibility of inter-call weight caching.  Floor at 819 GB/s
is 1.14 ms/program.
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
    from streammind_tpu.ops.int8_matvec import int8_matvec

    L, din, dmid = 8, 4096, 14336
    key = jax.random.PRNGKey(0)
    # build the stacked bank layer-by-layer at int8 (a stacked f32 source
    # would transiently hold L*235 MB)
    ku, kd = jax.random.split(key)

    @functools.partial(jax.jit, static_argnames=("out", "inn"))
    def mk(k, out, inn):
        w = jax.random.normal(k, (out, inn), jnp.float32) * 0.02
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-8)
        q = jnp.clip(jnp.round(w / s[:, None]), -127, 127).astype(jnp.int8)
        return q, s.astype(jnp.float32)

    ups, sups, dns, sdns = [], [], [], []
    for i in range(L):
        q, s = mk(jax.random.fold_in(ku, i), dmid, din)
        ups.append(q); sups.append(s)
        q, s = mk(jax.random.fold_in(kd, i), din, dmid)
        dns.append(q); sdns.append(s)
    stack = jax.jit(lambda xs: jnp.stack(xs, 0))
    up8, sup = stack(ups), stack(sups)
    dn8, sdn = stack(dns), stack(sdns)
    del ups, sups, dns, sdns
    x0 = jax.random.normal(key, (1, din), jnp.bfloat16)

    @jax.jit
    def scan_xla(x, wu, su, wd, sd):
        def body(c, layer):
            u, us, d, ds = layer
            h = (c @ u.T.astype(c.dtype)) * us.astype(c.dtype)
            y = (h @ d.T.astype(h.dtype)) * ds.astype(h.dtype)
            return y.astype(c.dtype), ()
        y, _ = jax.lax.scan(body, x, (wu, su, wd, sd))
        return y

    @jax.jit
    def scan_pallas(x, wu, su, wd, sd):
        def body(c, layer):
            u, us, d, ds = layer
            h = int8_matvec(c, u, us)
            return int8_matvec(h, d, ds), ()
        y, _ = jax.lax.scan(body, x, (wu, su, wd, sd))
        return y

    n_bytes = L * din * dmid * 2
    for name, fn in [("scan_xla_int8", scan_xla), ("scan_pallas_int8", scan_pallas)]:
        f = functools.partial(fn, wu=up8, su=sup, wd=dn8, sd=sdn)
        try:
            sec = bench_chain(f, x0)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        print(f"{name}: {sec*1e3:.3f} ms  eff {n_bytes/sec/1e9:.0f} GB/s "
              f"(logical {n_bytes/1e6:.0f} MB; floor 1.14 ms)", flush=True)

    a = np.asarray(functools.partial(scan_pallas, wu=up8, su=sup, wd=dn8, sd=sdn)(x0), np.float32)
    b = np.asarray(functools.partial(scan_xla, wu=up8, su=sup, wd=dn8, sd=sdn)(x0), np.float32)
    rms = float(np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-9))
    print(f"scan pallas-vs-xla rms {rms:.2e}", flush=True)


if __name__ == "__main__":
    main()
