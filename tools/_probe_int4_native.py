"""Solo chip probe: decode-regime matvec bandwidth by weight format.

The int8 decode tier runs 11.83 ms/tok (~7 GB of weights; ~8.6 ms floor at
819 GB/s); the packed-nibble Pallas int4 path measured 12.09 — its unpack
(~3 int32 VPU ops/element) eats the halved HBM bytes.  This probe times the
7B hot matvec shapes with:
  bf16        — x @ W.T
  int8        — x @ W8.T.astype(bf16) * scale      (current tier)
  int4native  — x @ W4.T.astype(bf16) * scale      (jnp.int4 storage: XLA
                 packs two nibbles/byte in HBM and fuses the convert)
  int4pallas  — ops.int4_matvec (column-halved nibble pack)
and reports ms + effective GB/s (logical-bytes-read / time).
"""
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
    from streammind_tpu.ops.int4_matvec import int4_matvec

    key = jax.random.PRNGKey(0)
    # one fused probe shape ~ a 7B layer's MLP pair: (4096->14336, 14336->4096)
    din, dmid = 4096, 14336
    kw, kx = jax.random.split(key)
    w_up = jax.random.normal(kw, (dmid, din), jnp.float32) * 0.02
    w_dn = jax.random.normal(kx, (din, dmid), jnp.float32) * 0.02
    x0 = jax.random.normal(key, (1, din), jnp.bfloat16)

    def quant_int8(w):
        s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s[:, 0].astype(jnp.float32)

    def quant_int4(w):
        s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 7.0
        q = jnp.clip(jnp.round(w / s), -7, 7).astype(jnp.int8)
        return q, s[:, 0].astype(jnp.float32)

    up8, sup8 = quant_int8(w_up)
    dn8, sdn8 = quant_int8(w_dn)
    up4i, sup4 = quant_int4(w_up)
    dn4i, sdn4 = quant_int4(w_dn)
    # int4 arrays must be BORN inside a jit: eager-created int4 args trip a
    # device_put relayout RecursionError on the remote platform (first probe
    # run); jit outputs come back in the canonical layout the next program
    # expects.
    to4 = jax.jit(lambda q: q.astype(jnp.int4))
    up4n = to4(up4i)
    dn4n = to4(dn4i)

    def pack_pc(q):  # column-halved nibble pack, matching quantize.py
        h = q.shape[1] // 2
        lo = q[:, :h].astype(jnp.int8)
        hi = q[:, h:].astype(jnp.int8)
        return jnp.bitwise_or(jnp.bitwise_and(lo, jnp.int8(0x0F)),
                              jnp.left_shift(hi, 4))

    up4p = pack_pc(up4i)
    dn4p = pack_pc(dn4i)

    w_up_bf, w_dn_bf = w_up.astype(jnp.bfloat16), w_dn.astype(jnp.bfloat16)

    # weights as explicit jit ARGUMENTS, not closures: closure constants are
    # materialized host-side by the remote-compile platform (int4 host
    # transfer is UNIMPLEMENTED there, and big constants bloat the payload)
    @jax.jit
    def mlp_bf16(x, wu, wd):
        h = x @ wu.T
        return (h @ wd.T).astype(x.dtype)

    @jax.jit
    def mlp_quant(x, wu, su, wd, sd):
        h = (x @ wu.T.astype(x.dtype)) * su.astype(x.dtype)
        y = (h @ wd.T.astype(h.dtype)) * sd.astype(h.dtype)
        return y.astype(x.dtype)

    @jax.jit
    def mlp_int4p(x, wu, su, wd, sd):
        h = int4_matvec(x, wu, su).astype(x.dtype)
        y = int4_matvec(h, wd, sd)
        return y.astype(x.dtype)

    import functools
    mlp_bf16 = functools.partial(mlp_bf16, wu=w_up_bf, wd=w_dn_bf)
    mlp_int8 = functools.partial(mlp_quant, wu=up8, su=sup8, wd=dn8, sd=sdn8)
    mlp_int4n = functools.partial(mlp_quant, wu=up4n, su=sup4, wd=dn4n, sd=sdn4)
    mlp_int4p = functools.partial(mlp_int4p, wu=up4p, su=sup4, wd=dn4p, sd=sdn4)

    # hand Pallas int8 matvec: stream int8 tiles, convert in VMEM, bf16 dot —
    # tests whether a kernel beats XLA's ~560 GB/s convert-on-read ceiling
    from jax.experimental import pallas as pl
    from streammind_tpu.ops.pallas_utils import interpret_mode

    def _i8mv_kernel(x_ref, w_ref, s_ref, o_ref):
        w = w_ref[:].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = acc * s_ref[0][None, :]

    def i8mv(x, w8, s, out_tile=2048):
        b, din_ = x.shape
        out = w8.shape[0]
        while out % out_tile:
            out_tile //= 2
        y = pl.pallas_call(
            _i8mv_kernel,
            grid=(out // out_tile,),
            in_specs=[pl.BlockSpec((b, din_), lambda i: (0, 0)),
                      pl.BlockSpec((out_tile, din_), lambda i: (i, 0)),
                      pl.BlockSpec((1, out_tile), lambda i: (0, i))],
            out_specs=pl.BlockSpec((b, out_tile), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((b, out), jnp.float32),
            interpret=interpret_mode(),
        )(x, w8, s.reshape(1, out).astype(jnp.float32))
        return y.astype(x.dtype)

    @jax.jit
    def mlp_int8pl(x, wu, su, wd, sd):
        h = i8mv(x, wu, su)
        return i8mv(h, wd, sd).astype(x.dtype)

    mlp_int8pl = functools.partial(mlp_int8pl, wu=up8, su=sup8, wd=dn8, sd=sdn8)

    n_el = din * dmid * 2  # both matmuls
    for name, fn, bytes_read in [
        ("bf16", mlp_bf16, n_el * 2),
        ("int8", mlp_int8, n_el),
        ("int8pallas", mlp_int8pl, n_el),
        ("int4native", mlp_int4n, n_el // 2),
        ("int4pallas", mlp_int4p, n_el // 2),
    ]:
        try:
            sec = bench_chain(fn, x0)
        except Exception as e:  # keep later arms alive past backend gaps
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"{name}: {sec*1e6:.0f} us  eff {bytes_read/sec/1e9:.0f} GB/s "
              f"(logical {bytes_read/1e6:.0f} MB)", flush=True)

    # numerics sanity: int4 native vs pallas must agree (same 4-bit grid);
    # pallas int8 vs XLA int8 likewise
    try:
        a = np.asarray(mlp_int4n(x0), np.float32)
        b = np.asarray(mlp_int4p(x0), np.float32)
        rms = float(np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-9))
        print(f"int4 native-vs-pallas rms {rms:.2e}", flush=True)
    except Exception as e:
        print(f"int4 numerics check FAILED: {type(e).__name__}", flush=True)
    a = np.asarray(mlp_int8pl(x0), np.float32)
    b = np.asarray(mlp_int8(x0), np.float32)
    rms = float(np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-9))
    print(f"int8 pallas-vs-xla rms {rms:.2e}", flush=True)


if __name__ == "__main__":
    main()
