"""Quantized decoder loading (reference load_8bit/load_4bit flags,
model/builder.py:43-52): the TPU-native loader transform rests the text
tower at int8 or packed int4 and the whole engine path keeps working."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import streammind_tpu
from streammind_tpu.config import tiny_streammind_config, tiny_text_config
from streammind_tpu.constants import VIDEO_TOKEN_INDEX
from streammind_tpu.models import mistral as lm
from streammind_tpu.utils.params import linear, param_bytes
from streammind_tpu.utils.quantize import (
    dequantize_linear_weight_int4,
    quantize_linear_weight_int4,
    quantize_text_params,
)


def test_int4_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.float32)  # stacked
    q = quantize_linear_weight_int4(w, group=64)
    assert q["w_int4"].shape == (2, 16, 64) and q["w_int4"].dtype == jnp.int8
    assert q["scale4"].shape == (2, 16, 2)
    back = dequantize_linear_weight_int4(q)
    # symmetric 4-bit: error bounded by scale/2 per group
    bound = np.repeat(np.asarray(q["scale4"]), 64, axis=-1) / 2 + 1e-6
    assert (np.abs(np.asarray(back - w)) <= bound).all()
    # linear() dispatch equals explicit dequant matmul
    x = jnp.asarray(rng.standard_normal((1, 4, 128)), jnp.float32)
    y = linear(x, {"w_int4": q["w_int4"][0], "scale4": q["scale4"][0]})
    y_ref = x @ dequantize_linear_weight_int4(
        {"w_int4": q["w_int4"][0], "scale4": q["scale4"][0]}
    ).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_text_forward_close(rng, bits):
    cfg = tiny_text_config()
    params = lm.init_text_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_text_params(params, bits=bits)
    # footprint shrinks (projection weights only; embeds/norms stay fp)
    assert param_bytes(qparams["layers"]) < param_bytes(params["layers"]) / (
        2.5 if bits == 8 else 4.5
    )
    ids = jnp.asarray([[5, 17, 99, 3, 64, 2, 11, 42]])
    ref, _ = lm.text_forward(params, cfg, input_ids=ids)
    got, _ = lm.text_forward(qparams, cfg, input_ids=ids)
    r = np.asarray(ref).ravel()
    g = np.asarray(got).ravel()
    cos = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9)
    assert cos > (0.999 if bits == 8 else 0.99), cos


@pytest.mark.parametrize("flag", ["load_8bit", "load_4bit"])
def test_model_init_quantized_generates(rng, flag):
    """model_init(load_{8,4}bit=True) produces a working engine: the full
    cached prefill + decode path runs on the quantized tower."""
    import sys

    sys.path.insert(0, "tests")
    from sp_like_tokenizer import SPLikeTokenizer

    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    model, _, _, _ = streammind_tpu.model_init(
        cfg=cfg, tokenizer=tok, dtype=jnp.float32, **{flag: True}
    )
    # the quantized tower really is quantized
    assert "w_int8" in model.params["text"]["layers"]["q"] or \
           "w_int4" in model.params["text"]["layers"]["q"]
    # KV cache dtype inference must skip integer leaves
    assert model.engine.new_kv_cache().k.dtype == jnp.float32

    video = rng.standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    out = streammind_tpu.infer(
        model, video, "describe", tok, max_new_tokens=4
    )
    assert isinstance(out, str)


def test_kv_dtype_prefers_compute_dtype_over_scales():
    """A bf16 tree quantized to int8 carries fp32 SCALE leaves that can
    precede the bf16 embeddings in tree order — the KV cache / page pool
    dtype must still resolve to bf16 (an fp32 cache silently doubles KV
    memory and bandwidth on the quantized serving tier)."""
    import jax

    from streammind_tpu.config import tiny_text_config
    from streammind_tpu.models import mistral as lm
    from streammind_tpu.streaming.engine import _float_dtype
    from streammind_tpu.utils.quantize import quantize_text_params

    p = lm.init_text_params(jax.random.PRNGKey(0), tiny_text_config(), jnp.bfloat16)
    q = quantize_text_params(p, bits=8)
    assert _float_dtype(q) == jnp.bfloat16
    # an all-fp32 tree still resolves to fp32 (CPU test configs)
    p32 = lm.init_text_params(jax.random.PRNGKey(0), tiny_text_config(), jnp.float32)
    assert _float_dtype(p32) == jnp.float32


def test_model_init_quantized_bf16_generates(rng):
    """The SERVING dtype: bf16 params + load_8bit.  Pre-r3, _float_dtype
    picked a quantization scale's fp32 → the decode while_loop carried a
    bf16 hidden into an fp32 cache and CRASHED with a scan carry-dtype
    mismatch (observed at full 7B dims on the chip)."""
    from sp_like_tokenizer import SPLikeTokenizer

    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    model, _, _, _ = streammind_tpu.model_init(
        cfg=cfg, tokenizer=tok, dtype=jnp.bfloat16, load_8bit=True
    )
    assert model.engine.new_kv_cache().k.dtype == jnp.bfloat16
    video = rng.standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    out = streammind_tpu.infer(model, video, "describe", tok, max_new_tokens=4)
    assert isinstance(out, str)


def test_int4_pc_speed_tier_text_loading(rng):
    """quantize_text_params(bits=4, scheme='pc'): the decode SPEED tier —
    per-channel scales + column-halved pack consumed by the fused Pallas
    matvec (linear() dispatches on w_int4pc; on CPU it takes the dequant
    fallback, same numerics).  model_init(load_4bit='pc') wires it."""
    import streammind_tpu
    from sp_like_tokenizer import SPLikeTokenizer
    from streammind_tpu.config import tiny_streammind_config
    from streammind_tpu.models import mistral as lm
    from streammind_tpu.utils.quantize import quantize_text_params

    cfg = tiny_streammind_config()
    params = lm.init_text_params(jax.random.PRNGKey(3), cfg.text, jnp.bfloat16)
    q = quantize_text_params(params, bits=4, scheme="pc")
    for name in ("q", "k", "v", "o"):
        assert "w_int4pc" in q["layers"][name]
    assert "w_int4pc" in q["layers"]["mlp"]["down"]

    cache = lm.init_kv_cache(cfg.text, batch=1, capacity=32, dtype=jnp.bfloat16)
    tok = jnp.asarray([[5]], jnp.int32)
    ref, _ = lm.text_forward(params, cfg.text, input_ids=tok, cache=cache)
    out, _ = lm.text_forward(q, cfg.text, input_ids=tok, cache=cache)
    rel = float(jnp.mean(jnp.abs(out - ref)) / (jnp.mean(jnp.abs(ref)) + 1e-9))
    assert rel < 0.25, rel  # int4 per-channel on random weights

    # product wiring: a full streaming turn on the int4-pc tier
    model, _, tok2, _ = streammind_tpu.model_init(
        cfg=cfg, tokenizer=SPLikeTokenizer(), load_4bit="pc"
    )
    assert "w_int4pc" in model.params["text"]["layers"]["q"]
    sess = model.new_session(tok2, max_new_tokens=3)
    size = cfg.vision.image_size
    frame = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 3, size, size)), jnp.float32)
    out = sess.process_frame(frame, force_fire=True)
    assert isinstance(out, str) and len(out) >= 0
