"""Solo chip probe: Pallas VMEM-converting int8 matvec vs XLA convert-on-read.

Times the 7B decode hot shapes as a chained MLP pair (up 14336x4096 +
down 4096x14336, 117 MB of int8) and a qkvo-ish square (4096x4096).
Chained-call timings carry ~150 us/iteration dispatch overhead through
the tunnel; the MLP-pair delta between arms is the signal.
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


def bench_chain(fn, x0, n_small=50, n_large=550):
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

    key = jax.random.PRNGKey(0)
    din, dmid = 4096, 14336
    kw, kx = jax.random.split(key)
    w_up = jax.random.normal(kw, (dmid, din), jnp.float32) * 0.02
    w_dn = jax.random.normal(kx, (din, dmid), jnp.float32) * 0.02
    x0 = jax.random.normal(key, (1, din), jnp.bfloat16)

    def quant(w):
        s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s[:, 0].astype(jnp.float32)

    up8, sup = quant(w_up)
    dn8, sdn = quant(w_dn)

    @jax.jit
    def mlp_xla(x, wu, su, wd, sd):
        h = (x @ wu.T.astype(x.dtype)) * su.astype(x.dtype)
        y = (h @ wd.T.astype(h.dtype)) * sd.astype(h.dtype)
        return y.astype(x.dtype)

    @jax.jit
    def mlp_pallas(x, wu, su, wd, sd):
        h = int8_matvec(x, wu, su)
        return int8_matvec(h, wd, sd)

    mlp_xla = functools.partial(mlp_xla, wu=up8, su=sup, wd=dn8, sd=sdn)
    mlp_pallas = functools.partial(mlp_pallas, wu=up8, su=sup, wd=dn8, sd=sdn)

    n_el = din * dmid * 2
    for name, fn in [("xla_int8", mlp_xla), ("pallas_int8", mlp_pallas)]:
        try:
            sec = bench_chain(fn, x0)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        print(f"{name}: {sec*1e6:.0f} us  eff {n_el/sec/1e9:.0f} GB/s "
              f"(logical {n_el/1e6:.0f} MB)", flush=True)

    # numerics: pallas (fp32 acc, one rounding) vs xla (bf16 dot + bf16 scale)
    a = np.asarray(mlp_pallas(x0), np.float32)
    b = np.asarray(mlp_xla(x0), np.float32)
    rms = float(np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-9))
    print(f"pallas-vs-xla rms {rms:.2e}", flush=True)

    # square shape (q/o proj): 16 MB per matmul — chain a 4096x4096 pair
    wq, sq = quant(jax.random.normal(kw, (din, din), jnp.float32) * 0.02)
    wk, sk = quant(jax.random.normal(kx, (din, din), jnp.float32) * 0.02)

    @jax.jit
    def sq_xla(x, wa, sa, wb, sb):
        h = (x @ wa.T.astype(x.dtype)) * sa.astype(x.dtype)
        return ((h @ wb.T.astype(h.dtype)) * sb.astype(h.dtype)).astype(x.dtype)

    @jax.jit
    def sq_pallas(x, wa, sa, wb, sb):
        h = int8_matvec(x, wa, sa)
        return int8_matvec(h, wb, sb)

    sq_xla = functools.partial(sq_xla, wa=wq, sa=sq, wb=wk, sb=sk)
    sq_pallas = functools.partial(sq_pallas, wa=wq, sa=sq, wb=wk, sb=sk)
    n_el_sq = din * din * 2
    for name, fn in [("sq_xla_int8", sq_xla), ("sq_pallas_int8", sq_pallas)]:
        sec = bench_chain(fn, x0)
        print(f"{name}: {sec*1e6:.0f} us  eff {n_el_sq/sec/1e9:.0f} GB/s "
              f"(logical {n_el_sq/1e6:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
