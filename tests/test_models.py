"""Model-layer tests: ViT vs torch CLIP math, decoder cache consistency,
Mamba stream-vs-scan, projector shapes + gate loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammind_tpu.config import (
    tiny_mamba_config,
    tiny_streammind_config,
    tiny_text_config,
    tiny_vision_config,
)
from streammind_tpu.models import mamba as mamba_mod
from streammind_tpu.models import mistral as lm
from streammind_tpu.models import projector as proj
from streammind_tpu.models.vit import init_vit_params, vit_forward


def test_vit_shapes_and_layer_tap(rng):
    cfg = tiny_vision_config()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(rng.standard_normal((2, 3, 56, 56)), jnp.float32)
    out = vit_forward(params, cfg, pixels)
    # 56/14 = 4 → 16 patches, CLS dropped
    assert out.shape == (2, 16, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_text_forward_causality(rng):
    cfg = tiny_text_config()
    params = lm.init_text_params(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 10)))
    logits, _ = lm.text_forward(params, cfg, input_ids=ids)
    # future-token perturbation must not affect past logits
    ids2 = ids.at[0, 7].set((int(ids[0, 7]) + 1) % cfg.vocab_size)
    logits2, _ = lm.text_forward(params, cfg, input_ids=ids2)
    np.testing.assert_allclose(
        np.asarray(logits[0, :7]), np.asarray(logits2[0, :7]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(logits[0, 7:]), np.asarray(logits2[0, 7:]))


def test_text_cache_matches_full_forward(rng):
    """prefill + step-by-step decode must reproduce the full forward logits."""
    cfg = tiny_text_config()
    params = lm.init_text_params(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
    full_logits, _ = lm.text_forward(params, cfg, input_ids=ids)

    cache = lm.init_kv_cache(cfg, batch=2, capacity=16, dtype=jnp.float32)
    pre_logits, cache = lm.text_forward(params, cfg, input_ids=ids[:, :8], cache=cache)
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[:, :8]), rtol=2e-4, atol=2e-4
    )
    for t in range(8, 12):
        step_logits, cache = lm.text_forward(
            params, cfg, input_ids=ids[:, t : t + 1], cache=cache
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, t]),
            rtol=2e-4,
            atol=2e-4,
        )
    assert int(cache.length[0]) == 12


def test_single_token_attention_shortcut_bit_identical(rng):
    """The no-cache s=1 forward (the streaming gate LM's shape) takes the
    softmax-over-one-key shortcut in _attn_block (output == v exactly, q/k
    skipped).  An all-valid kv_mask forces the general path on the same
    input — the two must agree BIT-FOR-BIT, because softmax over a single
    visible key is exactly 1.0 in every dtype."""
    cfg = tiny_text_config()
    params = lm.init_text_params(jax.random.PRNGKey(7), cfg)
    for dtype in (jnp.float32, jnp.bfloat16):
        p = jax.tree.map(lambda a: a.astype(dtype), params)
        x = jnp.asarray(rng.standard_normal((2, 1, cfg.hidden_size)), dtype)
        fast, _ = lm.text_forward(p, cfg, inputs_embeds=x)
        general, _ = lm.text_forward(
            p, cfg, inputs_embeds=x, attn_mask=jnp.ones((2, 1), bool)
        )
        assert np.array_equal(np.asarray(fast), np.asarray(general)), dtype


def test_moe_runs_and_routes(rng):
    cfg = tiny_text_config()
    import dataclasses

    cfg = dataclasses.replace(cfg, num_experts=4, num_experts_per_tok=2)
    params = lm.init_text_params(jax.random.PRNGKey(3), cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)))
    logits, _ = lm.text_forward(params, cfg, input_ids=ids)
    assert logits.shape == (2, 6, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_video_mamba_stream_equals_forward(rng):
    cfg = tiny_mamba_config()
    params = mamba_mod.init_video_mamba_params(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(rng.standard_normal((2, 9, cfg.d_model)), jnp.float32)
    y_full, final_state = mamba_mod.video_mamba_forward(params, cfg, x)

    state = mamba_mod.init_mamba_state(cfg, batch=2)
    ys = []
    for t in range(9):
        y_t, state = mamba_mod.video_mamba_step(params, cfg, x[:, t], state)
        ys.append(y_t)
    y_stream = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(
        np.asarray(y_stream), np.asarray(y_full), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.ssm), np.asarray(final_state.ssm), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.conv), np.asarray(final_state.conv), rtol=1e-4, atol=1e-4
    )


def test_projector_stream_equals_batch(rng):
    cfg = tiny_streammind_config()
    params = proj.init_projector_params(jax.random.PRNGKey(5), cfg)
    frames = jnp.asarray(
        rng.standard_normal((1, 7, 16, cfg.mm_hidden_size)), jnp.float32
    )
    mem_full, _ = proj.mamba_project(params, cfg, frames)
    assert mem_full.shape == (1, 7, cfg.text.hidden_size)

    state = mamba_mod.init_mamba_state(cfg.mamba, batch=1)
    toks = []
    for t in range(7):
        tok, state = proj.mamba_project_step(params, cfg, frames[:, t], state)
        toks.append(tok)
    mem_stream = jnp.stack(toks, axis=1)
    np.testing.assert_allclose(
        np.asarray(mem_stream), np.asarray(mem_full), rtol=1e-4, atol=1e-4
    )


def test_gate_decision_and_loss(rng):
    cfg = tiny_streammind_config()
    params = proj.init_projector_params(jax.random.PRNGKey(6), cfg)
    mem = jnp.asarray(rng.standard_normal((1, cfg.text.hidden_size)), jnp.float32)
    logits = proj.gate_decision_step(params, cfg, mem)
    assert logits.shape == (1, 2)

    seq_logits = jnp.asarray(rng.standard_normal((2, 6, 2)), jnp.float32)
    labels = jnp.asarray([[-100, 0, 0, 1, -100, 1], [0, 0, -100, -100, 1, 0]])
    loss = proj.gate_loss(seq_logits, labels)
    assert np.isfinite(float(loss))

    # all-ignored labels → zero-ish loss, not NaN
    loss0 = proj.gate_loss(seq_logits, jnp.full_like(labels, -100))
    assert np.isfinite(float(loss0))


def test_simple_projectors(rng):
    cfg = tiny_streammind_config().replace(mm_projector_type="linear")
    params = proj.init_projector_params(jax.random.PRNGKey(7), cfg)
    frames = jnp.asarray(rng.standard_normal((2, 4, 16, cfg.mm_hidden_size)), jnp.float32)
    out = proj.simple_project(params, cfg, frames)
    assert out.shape == (2, 16, cfg.text.hidden_size)

    cfg2 = cfg.replace(mm_projector_type="mlp2x_gelu")
    params2 = proj.init_projector_params(jax.random.PRNGKey(8), cfg2)
    out2 = proj.simple_project(params2, cfg2, frames)
    assert out2.shape == (2, 16, cfg.text.hidden_size)


@pytest.mark.parametrize(
    "ptype", ["stc_connector", "stp_connector", "stc_connector_v35", "spatial_conv", "spatial_pool"]
)
def test_connector_projectors(rng, ptype):
    cfg = tiny_streammind_config().replace(mm_projector_type=ptype)
    params = proj.init_projector_params(jax.random.PRNGKey(9), cfg)
    # 4 frames of 4x4=16 patches
    frames = jnp.asarray(rng.standard_normal((1, 4, 16, cfg.mm_hidden_size)), jnp.float32)
    out = proj.simple_project(params, cfg, frames)
    assert out.ndim == 3 and out.shape[0] == 1
    assert out.shape[-1] == cfg.text.hidden_size
    assert np.isfinite(np.asarray(out)).all()
    if ptype.startswith("st"):
        # temporal 2x downsample: token count reflects t/2 (stc pads +1)
        assert out.shape[1] > 0


def test_video_mamba_chunked_continuation(rng):
    """forward(chunk1) then forward(chunk2, state) == one full forward —
    burst catch-up support for streaming."""
    cfg = tiny_mamba_config()
    params = mamba_mod.init_video_mamba_params(jax.random.PRNGKey(10), cfg)
    x = jnp.asarray(rng.standard_normal((2, 11, cfg.d_model)), jnp.float32)
    y_full, final = mamba_mod.video_mamba_forward(params, cfg, x)
    y1, st = mamba_mod.video_mamba_forward(params, cfg, x[:, :4])
    y2, st2 = mamba_mod.video_mamba_forward(params, cfg, x[:, 4:], state=st)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y_full[:, :4]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_full[:, 4:]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st2.ssm), np.asarray(final.ssm), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st2.conv), np.asarray(final.conv), rtol=1e-4, atol=1e-4)
    # chunk shorter than the conv window
    y3a, sta = mamba_mod.video_mamba_forward(params, cfg, x[:, :2])
    y3b, stb = mamba_mod.video_mamba_forward(params, cfg, x[:, 2:3], state=sta)
    np.testing.assert_allclose(np.asarray(y3b), np.asarray(y_full[:, 2:3]), rtol=1e-4, atol=1e-4)


def test_quantize_gate_preserves_qkv_bias():
    """int8 gate quantization keeps fp bias leaves (qwen-style backbones);
    linear() applies bias after the dequant-fused dot."""
    import numpy as np

    from streammind_tpu.config import TextConfig
    from streammind_tpu.models import mistral as lm
    from streammind_tpu.utils.params import linear
    from streammind_tpu.utils.quantize import quantize_gate_params

    cfg = TextConfig(vocab_size=8, hidden_size=16, intermediate_size=32,
                     num_layers=2, num_heads=4, num_kv_heads=2, head_dim=4,
                     qkv_bias=True, tie_word_embeddings=True)
    params = lm.init_text_params(jax.random.PRNGKey(0), cfg)
    # give the bias a visible value so dropping it would show
    params["layers"]["q"]["bias"] = params["layers"]["q"]["bias"] + 0.5
    qparams = quantize_gate_params(params)
    assert "bias" in qparams["layers"]["q"]
    x = jnp.ones((1, 3, 16), jnp.float32)
    y_fp = linear(x, {k: v[0] for k, v in params["layers"]["q"].items()})
    y_q = linear(x, {k: v[0] for k, v in qparams["layers"]["q"].items()})
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_fp),
                               rtol=0.05, atol=0.05)
    assert float(jnp.abs(y_q).max()) > 0.1  # bias actually applied


def test_vit_qkv_fusion_matches_separate(rng):
    """fuse_vit_qkv: fused (3D, D) GEMM == three separate matmuls, on both
    the full-precision and int8-quantized trees (the serving-path
    transform applied at engine init)."""
    from streammind_tpu.models.vit import fuse_vit_qkv
    from streammind_tpu.utils.quantize import quantize_vit_params

    cfg = tiny_vision_config()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(rng.standard_normal((2, 3, 56, 56)), jnp.float32)

    ref = vit_forward(params, cfg, pixels)
    fused = vit_forward(fuse_vit_qkv(params), cfg, pixels)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)

    q = quantize_vit_params(params)
    ref_q = vit_forward(q, cfg, pixels)
    fused_q = vit_forward(fuse_vit_qkv(q), cfg, pixels)
    np.testing.assert_allclose(np.asarray(fused_q), np.asarray(ref_q),
                               rtol=2e-6, atol=2e-6)
    # idempotent / already-fused trees pass through
    t = fuse_vit_qkv(fuse_vit_qkv(params))
    assert "qkv" in t["layers"] and "q" not in t["layers"]


def test_text_fusion_matches_separate(rng):
    """fuse_text_linears: fused qkv + gateup decode/prefill/train forwards
    == separate leaves, across plain, int8 and int4pc trees (the engine's
    serving-path decode fusion; row-concat changes no per-row dot)."""
    from streammind_tpu.config import TextConfig
    from streammind_tpu.models import mistral as lm
    from streammind_tpu.utils.quantize import quantize_text_params

    cfg = TextConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                     num_layers=2, num_heads=4, num_kv_heads=2, head_dim=4,
                     qkv_bias=True, tie_word_embeddings=True,
                     max_position_embeddings=64)
    base = lm.init_text_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(0, 32, (2, 7)), jnp.int32)

    for tree in (base,
                 quantize_text_params(base, bits=8),
                 quantize_text_params(base, bits=4, scheme="pc")):
        fused_tree = lm.fuse_text_linears(tree)
        assert "qkv" in fused_tree["layers"] and "q" not in fused_tree["layers"]
        assert "gateup" in fused_tree["layers"]["mlp"]
        # training path (no cache)
        ref, _ = lm.text_forward(tree, cfg, input_ids=ids)
        got, _ = lm.text_forward(fused_tree, cfg, input_ids=ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)
        # prefill + 1-token decode through the cache branch
        cache = lm.init_kv_cache(cfg, 2, 16, jnp.float32)
        ref_pre, ref_cache = lm.text_forward(tree, cfg, input_ids=ids,
                                             cache=cache)
        got_pre, got_cache = lm.text_forward(fused_tree, cfg, input_ids=ids,
                                             cache=cache)
        np.testing.assert_allclose(np.asarray(got_pre), np.asarray(ref_pre),
                                   rtol=2e-6, atol=2e-6)
        tok = ids[:, :1]
        ref_dec, _ = lm.text_forward(tree, cfg, input_ids=tok, cache=ref_cache)
        got_dec, _ = lm.text_forward(fused_tree, cfg, input_ids=tok,
                                     cache=got_cache)
        np.testing.assert_allclose(np.asarray(got_dec), np.asarray(ref_dec),
                                   rtol=2e-6, atol=2e-6)

    # LoRA-attached leaves must stay separate (delta cannot row-concat)
    from streammind_tpu.train.lora import attach_lora, init_lora_params

    lora = init_lora_params(jax.random.PRNGKey(1), base, r=2)
    with_lora = attach_lora(base, lora, scaling=1.0)
    t = lm.fuse_text_linears(with_lora)
    assert "q" in t["layers"] and "qkv" not in t["layers"]
    # idempotent on already-fused trees
    t2 = lm.fuse_text_linears(lm.fuse_text_linears(base))
    assert "qkv" in t2["layers"] and "q" not in t2["layers"]
