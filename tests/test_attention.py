"""Attention numerics: reference vs torch SDPA; Pallas flash vs reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.ops.attention import (
    attention,
    decode_attention,
    flash_attention,
    flash_mha,
    mha_reference,
)


def test_mha_matches_torch_sdpa(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, S, H, D = 2, 16, 4, 8
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)

    out = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))

    qt, kt, vt = (torch.tensor(x).permute(0, 2, 1, 3) for x in (q, k, v))
    expected = F.scaled_dot_product_attention(qt, kt, vt, is_causal=True)
    expected = expected.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_gqa_repeat(rng):
    B, S, H, HKV, D = 1, 8, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    out = mha_reference(q, k, v, causal=True)
    # manual expansion
    k_full = jnp.repeat(k, H // HKV, axis=2)
    v_full = jnp.repeat(v, H // HKV, axis=2)
    expected = mha_reference(q, k_full, v_full, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(rng, causal):
    B, SQ, SK, H, HKV, D = 2, 24, 40, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, SQ, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, SK, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, SK, HKV, D)), jnp.float32)
    kv_len = jnp.asarray([33, 40], jnp.int32)
    kv_mask = jnp.arange(SK)[None, :] < kv_len[:, None]
    q_offset = 16 if causal else 0  # queries start mid-stream

    ref = mha_reference(q, k, v, causal=causal, kv_mask=kv_mask, q_offset=q_offset)
    out = flash_attention(
        q, k, v, causal=causal, kv_len=kv_len, q_offset=q_offset,
        block_q=8, block_k=8,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_exact_attention_matches_reference(rng, dtype):
    """VMEM-resident full-row-softmax kernel vs the jnp reference — same
    reduction STRUCTURE, but NOT bitwise on real TPU: the chip probe
    (tools/_probe_exact_bitwise.py, v5e) measured 1-ulp reduction-order
    differences on 0.04% (bf16) / 0.55% (fp32) of elements at the ViT hot
    shape — Mosaic and XLA order the padded-lane softmax sum differently.
    CPU interpret mode checks at fp32 reduction-order tolerance.  Covers
    the ViT hot shape (odd Sq=Sk with key padding to the lane multiple)
    and a GQA split."""
    from streammind_tpu.ops.attention import exact_attention

    for b, sq, sk, h, hkv, d in [(2, 37, 37, 4, 4, 16), (1, 24, 40, 4, 2, 16)]:
        q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b, sk, hkv, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, sk, hkv, d)), dtype)
        ref = np.asarray(mha_reference(q, k, v, causal=False), np.float32)
        out = np.asarray(exact_attention(q, k, v), np.float32)
        np.testing.assert_allclose(out, ref, rtol=2e-6 if dtype == jnp.float32 else 2e-2,
                                   atol=2e-6 if dtype == jnp.float32 else 2e-2)


def test_exact_impl_dispatch_and_fallback(rng):
    """impl='exact' uses the kernel on the eligible shape and falls back to
    the reference (identical numerics) when causal/masked."""
    B, S, H, D = 1, 12, 2, 8
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    out = attention(q, k, v, causal=False, impl="exact")
    ref = mha_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-6, atol=2e-6)
    # causal → falls through to the reference path, exactly
    out_c = attention(q, k, v, causal=True, impl="exact")
    ref_c = mha_reference(q, k, v, causal=True)
    assert np.array_equal(np.asarray(out_c), np.asarray(ref_c))


@pytest.mark.parametrize("causal", [False, True])
def test_flash_mha_grad_matches_reference(rng, causal):
    """Pallas flash backward (custom_vjp) == autodiff through the jnp
    reference, fp32, incl. GQA head-group summation and right-padding masks
    (VERDICT r1 item 5 — the reference's flash-attn 2.5.8 training kernel,
    requirements.txt:87)."""
    B, SQ, SK, H, HKV, D = 2, 24, 24, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, SQ, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, SK, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, SK, HKV, D)), jnp.float32)
    kv_len = jnp.asarray([17, 24], jnp.int32)
    kv_mask = jnp.arange(SK)[None, :] < kv_len[:, None]
    # cotangent weights make the scalar loss exercise every output entry
    w = jnp.asarray(rng.standard_normal((B, SQ, H, D)), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_mha(q, k, v, kv_len, causal, 8, 8)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, causal=causal, kv_mask=kv_mask)
        return jnp.sum(out * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )
    # forward values agree too
    np.testing.assert_allclose(
        float(loss_flash(q, k, v)), float(loss_ref(q, k, v)), rtol=1e-4
    )


def test_flash_mha_grad_bf16(rng):
    """bf16 training dtype: grads close to the fp32 reference at bf16
    tolerance (the production training precision)."""
    B, SQ, H, HKV, D = 1, 16, 4, 2, 16
    q32 = rng.standard_normal((B, SQ, H, D)).astype(np.float32)
    k32 = rng.standard_normal((B, SQ, HKV, D)).astype(np.float32)
    v32 = rng.standard_normal((B, SQ, HKV, D)).astype(np.float32)
    q, k, v = (jnp.asarray(x, jnp.bfloat16) for x in (q32, k32, v32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, None, True, 8, 8).astype(jnp.float32))

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        *(jnp.asarray(x) for x in (q32, k32, v32))
    )
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), rtol=0.1, atol=0.05
        )


def test_attention_dispatcher_flash_is_differentiable(rng):
    """attention(impl='flash') must be usable under jax.grad (training path)."""
    B, S, H, D = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    g = jax.grad(
        lambda q: jnp.sum(attention(q, k, v, causal=True, impl="flash"))
    )(q)
    g_ref = jax.grad(
        lambda q: jnp.sum(attention(q, k, v, causal=True, impl="auto"))
    )(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_decode_attention_matches_prefix(rng):
    B, SMAX, H, HKV, D = 2, 32, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, SMAX, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, SMAX, HKV, D)), jnp.float32)
    lens = jnp.asarray([7, 20], jnp.int32)
    out = decode_attention(q, k, v, lens)
    for b in range(B):
        ref = mha_reference(
            q[b : b + 1], k[b : b + 1, : int(lens[b])], v[b : b + 1, : int(lens[b])]
        )
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref[0]), rtol=1e-5, atol=1e-6
        )


def test_flash_sharded_on_mesh_matches_reference(rng):
    """attention(impl='flash') under an ambient dp/fsdp/tp mesh shard_maps
    the Pallas kernels (batch on dp, heads on tp) and must match the jnp
    reference in both forward and gradients — the multi-chip training path."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from streammind_tpu.parallel import make_mesh

    B, S, H, HKV, D = 4, 32, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    kv_len = jnp.asarray([20, 32, 25, 32], jnp.int32)
    kv_mask = jnp.arange(S)[None, :] < kv_len[:, None]

    ref = mha_reference(q, k, v, causal=True, kv_mask=kv_mask)
    g_ref = jax.grad(
        lambda q: jnp.sum(mha_reference(q, k, v, causal=True, kv_mask=kv_mask))
    )(q)

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    with jax.set_mesh(mesh):
        sh = NamedSharding(mesh, P("dp", None, "tp", None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        ls = jax.device_put(kv_len, NamedSharding(mesh, P("dp")))
        out = jax.jit(
            lambda q, k, v, l: attention(q, k, v, causal=True, kv_len=l, impl="flash")
        )(qs, ks, vs, ls)
        g = jax.jit(jax.grad(
            lambda q: jnp.sum(attention(q, ks, vs, causal=True, kv_len=ls, impl="flash"))
        ))(qs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)

    # indivisible shapes degrade to the reference instead of mis-sharding
    with jax.set_mesh(mesh):
        out_odd = jax.jit(
            lambda q, k, v: attention(q[:3], k[:3], v[:3], causal=True, impl="flash")
        )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_odd),
        np.asarray(mha_reference(q[:3], k[:3], v[:3], causal=True)),
        rtol=1e-4, atol=1e-5,
    )

    # under training policy the same misfit is a hard trace-time error —
    # either per-call via impl="flash!" (what train/run.py uses; no
    # process-global state) or via the global set_flash_fallback_mode
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="does not divide"):
            jax.jit(
                lambda q, k, v: attention(
                    q[:3], k[:3], v[:3], causal=True, impl="flash!"
                )
            )(q, k, v)
        # and a DIVISIBLE shape under flash! still works (strict only
        # changes the misfit policy)
        ok = jax.jit(
            lambda q, k, v: attention(q, k, v, causal=True, impl="flash!")
        )(q, k, v)
        assert ok.shape == q.shape

    from streammind_tpu.ops.attention import set_flash_fallback_mode

    set_flash_fallback_mode("error")
    try:
        with jax.set_mesh(mesh):
            with pytest.raises(ValueError, match="does not divide"):
                jax.jit(
                    lambda q, k, v: attention(
                        q[:3], k[:3], v[:3], causal=True, impl="flash"
                    )
                )(q, k, v)
    finally:
        set_flash_fallback_mode("warn")


def test_mesh_misfit_fallback_is_differentiable(rng):
    """The warn-mode mesh fallback must reach the jnp reference — before
    the fix it returned the unsharded Pallas kernel (no VJP: grads raised;
    and it mis-sharded under the mesh it warned about)."""
    import warnings

    from streammind_tpu.parallel import make_mesh

    q = jnp.asarray(rng.standard_normal((3, 8, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 8, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 8, 2, 16)), jnp.float32)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    with jax.set_mesh(mesh):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            g = jax.jit(jax.grad(
                lambda q: jnp.sum(attention(q, k, v, causal=True, impl="flash"))
            ))(q)
    g_ref = jax.grad(
        lambda q: jnp.sum(mha_reference(q, k, v, causal=True))
    )(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_bf16_impl_honors_kv_len(rng):
    """impl='bf16' must mask padded keys given kv_len (the docstring's
    kv_mask/kv_len interchangeability) — it previously attended to pads."""
    q = jnp.asarray(rng.standard_normal((2, 4, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 6, 4, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 6, 4, 16)), jnp.float32)
    kv_len = jnp.asarray([3, 5], jnp.int32)
    kv_mask = jnp.arange(6)[None, :] < kv_len[:, None]
    out_len = attention(q, k, v, kv_len=kv_len, impl="bf16")
    out_mask = attention(q, k, v, kv_mask=kv_mask, impl="bf16")
    np.testing.assert_allclose(
        np.asarray(out_len), np.asarray(out_mask), rtol=1e-5, atol=1e-6
    )
    # and the result differs from ignoring the mask entirely
    out_none = attention(q, k, v, impl="bf16")
    assert not np.allclose(np.asarray(out_len), np.asarray(out_none))
