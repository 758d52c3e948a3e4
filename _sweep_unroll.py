"""Chip sweep: decode ms/token at 7B for decode_unroll in {1, 4, 8, full}
at int8 AND int4 weights, plus compile-time per variant.  Slope-timed.
Run solo on the chip.  (VERDICT r4 item 3: measure decode_unroll or
remove it; target <= 10 ms/tok — the ~8.6 ms int8 weight-read bound.)"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from streammind_tpu.config import mistral_7b
    from streammind_tpu.models import mistral as lm
    from streammind_tpu.utils.quantize import synth_quantized_text_params

    cfg = mistral_7b()
    CAPACITY = 1024

    # "4pc" = per-channel int4 through the fused Pallas matvec (the decode
    # SPEED tier; plain 4 = group-64 rest tier whose XLA unpack won't fuse)
    bits_list = sys.argv[1:] or ["8", "4pc"]
    for bits in bits_list:
        # built directly at quantized shapes (never the ~14.5 GB bf16
        # source — that OOM'd the 16 GB chip in the r5 battery)
        params = synth_quantized_text_params(
            cfg, bits=4 if bits == "4pc" else int(bits),
            scheme="pc" if bits == "4pc" else "group",
        )

        for unroll in [1, 4, 8, "full"]:
            @jax.jit
            def step(params, tok, cache, _u=unroll):
                logits, cache = lm.text_forward(
                    params, cfg, input_ids=tok[None, None], cache=cache, unroll=_u
                )
                return jnp.argmax(logits[0, -1]).astype(jnp.int32), cache

            cache = lm.init_kv_cache(cfg, batch=1, capacity=CAPACITY,
                                     dtype=jnp.bfloat16)
            cache = cache._replace(length=cache.length + 512)
            tok = jnp.int32(7)
            t0 = time.perf_counter()
            tok1, cache = step(params, tok, cache)
            np.asarray(tok1)
            compile_s = time.perf_counter() - t0

            def run(n, cache):
                t = tok
                t0 = time.perf_counter()
                for _ in range(n):
                    t, cache = step(params, t, cache)
                np.asarray(t)
                return time.perf_counter() - t0, cache

            a, cache = run(5, cache)
            b, cache = run(45, cache)
            ms = (b - a) / 40 * 1e3
            print(f"int{bits} unroll={unroll}: {ms:.2f} ms/token "
                  f"(compile {compile_s:.0f}s)", flush=True)
            del cache
        del params


if __name__ == "__main__":
    main()
