"""Weight-conversion parity: our models must reproduce transformers' forward
bit-for-bit at fp32 from converted HF state dicts."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers

from streammind_tpu.config import (
    TextConfig,
    VisionConfig,
    tiny_streammind_config,
)
from streammind_tpu.models import mistral as lm
from streammind_tpu.models.vit import vit_forward
from streammind_tpu.utils.convert import (
    convert_clip_vision,
    convert_hf_text,
    merge_lora,
)


def _sd_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_mistral():
    conf = transformers.MistralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(conf).eval()
    return conf, model


def test_mistral_parity_fp32(hf_mistral):
    conf, model = hf_mistral
    cfg = TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16,
    )
    params = convert_hf_text(_sd_numpy(model), cfg)
    ids = np.array([[5, 17, 99, 3, 64, 2, 11, 42]])
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours, _ = lm.text_forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_qwen2_parity_fp32():
    """Qwen2 backbone (reference builder.py:128-129): q/k/v biases + tied
    embeddings must reproduce transformers' Qwen2 forward at fp32."""
    conf = transformers.Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    model = transformers.Qwen2ForCausalLM(conf).eval()
    cfg = TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=1_000_000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True, qkv_bias=True,
    )
    params = convert_hf_text(_sd_numpy(model), cfg)
    assert "bias" in params["layers"]["q"] and "lm_head" not in params
    ids = np.array([[5, 17, 99, 3, 64, 2, 11, 42]])
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours, _ = lm.text_forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_qwen2_init_and_cache_shapes():
    """Scratch init of a qkv_bias config produces bias leaves that the decode
    path consumes (cache prefill+step smoke)."""
    cfg = TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, qkv_bias=True,
        tie_word_embeddings=True,
    )
    params = lm.init_text_params(jax.random.PRNGKey(0), cfg)
    assert params["layers"]["q"]["bias"].shape == (2, 32)
    cache = lm.init_kv_cache(cfg, batch=1, capacity=16, dtype=jnp.float32)
    ids = jnp.array([[1, 5, 9, 2]])
    logits, cache = lm.text_forward(params, cfg, input_ids=ids, cache=cache)
    logits2, cache = lm.text_forward(
        params, cfg, input_ids=jnp.array([[7]]), cache=cache
    )
    assert logits2.shape == (1, 1, 64)
    full, _ = lm.text_forward(
        params, cfg, input_ids=jnp.array([[1, 5, 9, 2, 7]])
    )
    np.testing.assert_allclose(
        np.asarray(logits2[0, -1]), np.asarray(full[0, -1]), rtol=1e-4, atol=1e-4
    )


def test_clip_vision_parity_fp32():
    conf = transformers.CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = transformers.CLIPVisionModel(conf).eval()

    cfg = VisionConfig(
        image_size=56, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=3, num_heads=4, select_layer=-2, select_feature="patch",
    )
    params = convert_clip_vision(_sd_numpy(model), cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        hs = model(torch.tensor(pixels), output_hidden_states=True).hidden_states
    ref = hs[-2][:, 1:].numpy()  # reference feature_select: layer -2, drop CLS

    ours = vit_forward(params, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_lora_merge():
    rng = np.random.default_rng(0)
    W = rng.standard_normal((8, 8)).astype(np.float32)
    A = rng.standard_normal((2, 8)).astype(np.float32)
    B = rng.standard_normal((8, 2)).astype(np.float32)
    sd = {"model.layers.0.self_attn.q_proj.weight": W}
    lora = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B,
    }
    merged = merge_lora(sd, lora, scaling=0.5)
    np.testing.assert_allclose(
        merged["model.layers.0.self_attn.q_proj.weight"], W + 0.5 * (B @ A), rtol=1e-6
    )
