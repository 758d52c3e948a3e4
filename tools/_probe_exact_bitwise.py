"""Solo chip probe: is exact_attention bitwise-equal to mha_reference at the
ViT hot shape on real TPU?  Decides whether vit_forward may auto-resolve
batched 'auto' to the exact kernel while keeping the bit-faithful contract."""
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from streammind_tpu.ops.attention import exact_attention, mha_reference

    for b in (1, 8):
        for dtype in (jnp.bfloat16, jnp.float32):
            kq, kk, kv = jax.random.split(jax.random.PRNGKey(b), 3)
            shape = (b, 577, 16, 64)
            q = jax.random.normal(kq, shape, dtype)
            k = jax.random.normal(kk, shape, dtype)
            v = jax.random.normal(kv, shape, dtype)
            a = np.asarray(jax.jit(exact_attention)(q, k, v), np.float32)
            r = np.asarray(jax.jit(
                lambda q, k, v: mha_reference(q, k, v, causal=False))(q, k, v),
                np.float32)
            eq = np.array_equal(a, r)
            d = np.abs(a - r)
            rms = float(np.sqrt(np.mean((a - r) ** 2)) /
                        (np.sqrt(np.mean(r ** 2)) + 1e-9))
            print(f"B={b} {np.dtype(jnp.dtype(dtype)).name}: bitwise={eq} "
                  f"maxabs={d.max():.3e} rms={rms:.3e} "
                  f"frac_diff={(d > 0).mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
