"""Attention numerics: reference vs torch SDPA; Pallas flash vs reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.ops.attention import (
    decode_attention,
    flash_attention,
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
