"""Event→first-token latency at 7B — the second BASELINE.json metric
(<350 ms p50 target on one v5e chip).

Measures the cognition PROGRAM alone: on gate fire, a bucketed prefill of
the turn suffix (memory span + dialogue ids) runs against the persistent KV
cache, then one decode step produces the first token.  The ViT/gate live in
the perception program and are not on this critical path.

Scope note (report both numbers, per ROADMAP's full-dims lesson): this is a
program-level metric with constant-filled 7B weights and no vision tower
resident.  The END-TO-END number — full live loop through the engine with
host control flow, a whole 12-token turn decoded, and tunnel round-trips —
is measured by examples/streaming_demo.py --full-size: 349 ms warm
(vs 44 ms here; both beat the 350 ms target).

Prints one JSON line (same shape as bench.py).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from streammind_tpu.config import mistral_7b
    from streammind_tpu.models import mistral as lm

    cfg = mistral_7b()
    # bf16 weights: ~14.5 GB — fits one v5e chip without the vision tower.
    # Latency depends only on shapes; random init at 7B OOMs via the fp32
    # transients inside jax.random.normal, so allocate the tree directly.
    shapes = jax.eval_shape(
        lambda k: lm.init_text_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    PREFILL = 128   # typical turn suffix: ~60 memory tokens + dialogue ids
    CAPACITY = 1024  # 7B bf16 weights (~14.5 GB) leave ~1 GB headroom on v5e

    @__import__('functools').partial(jax.jit, donate_argnums=(2,))
    def first_token(params, embeds, cache, real_len):
        last, cache = lm.text_forward(
            params, cfg, inputs_embeds=embeds, cache=cache,
            cache_advance=jnp.broadcast_to(real_len, cache.length.shape),
        )
        idx = (real_len - 1)[None, None, None].astype(jnp.int32)
        logits = jnp.take_along_axis(last, idx, axis=1)[:, 0, :]
        tok = jnp.argmax(logits[0]).astype(jnp.int32)
        logits2, cache = lm.text_forward(
            params, cfg, input_ids=tok[None, None], cache=cache
        )
        return jnp.argmax(logits2[0, -1]).astype(jnp.int32), cache

    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (1, PREFILL, cfg.hidden_size), jnp.bfloat16
    )
    cache0 = lm.init_kv_cache(cfg, batch=1, capacity=CAPACITY, dtype=jnp.bfloat16)
    real_len = jnp.int32(97)

    tok, warm_cache = first_token(params, embeds, cache0, real_len)
    np.asarray(tok)  # force compile + execute
    del cache0, warm_cache

    # slope timing over chained turns within one cache lifetime
    def run(n):
        cache = lm.init_kv_cache(cfg, batch=1, capacity=CAPACITY, dtype=jnp.bfloat16)
        tok = None
        t0 = time.perf_counter()
        for _ in range(n):
            tok, cache = first_token(params, embeds, cache, real_len)
        np.asarray(tok)
        return time.perf_counter() - t0

    t_small, t_large = run(2), run(12)
    per_turn = (t_large - t_small) / 10
    ms = per_turn * 1000
    print(
        json.dumps(
            {
                "metric": "event_to_first_token_ms_7b",
                "value": round(ms, 1),
                "unit": "ms",
                "vs_baseline": round(350.0 / ms, 3),  # >1 == beating target
            }
        )
    )


if __name__ == "__main__":
    main()
