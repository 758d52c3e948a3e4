"""Public API tests: model_init + infer/x_infer end-to-end on tiny config."""
import jax
import numpy as np
import pytest

import streammind_tpu
from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.config import tiny_streammind_config


@pytest.fixture(scope="module")
def model_and_tok():
    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    model, processor, tokenizer, version = streammind_tpu.model_init(
        cfg=cfg, tokenizer=tok, dtype=jax.numpy.float32
    )
    return model, tokenizer, version


def test_model_init_shape(model_and_tok):
    model, tok, version = model_and_tok
    assert version == "llama_2"
    assert set(model.params) == {"vision", "projector", "text"}


def test_infer_offline_qa(model_and_tok, rng):
    model, tok, version = model_and_tok
    size = model.cfg.vision.image_size
    video = rng.standard_normal((4, 3, size, size)).astype(np.float32)
    out = streammind_tpu.infer(
        model, video, "What is happening?", tok, version=version, max_new_tokens=6
    )
    assert isinstance(out, str)


def test_x_infer_modes(model_and_tok, rng):
    model, tok, version = model_and_tok
    size = model.cfg.vision.image_size
    video = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    for mode in ("mcqa", "openend", "vanilla"):
        out = streammind_tpu.x_infer(video, "Which option?", model, tok, mode=mode)
        assert isinstance(out, str)
    with pytest.raises(ValueError):
        streammind_tpu.x_infer(video, "q", model, tok, mode="bogus")


def test_sampled_decode_differs_or_runs(model_and_tok, rng):
    model, tok, version = model_and_tok
    size = model.cfg.vision.image_size
    video = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    out = streammind_tpu.infer(
        model, video, "Describe.", tok, do_sample=True, max_new_tokens=6, seed=1
    )
    assert isinstance(out, str)


def test_infer_beams(model_and_tok, rng):
    import streammind_tpu.api as api

    model, tok, version = model_and_tok
    size = model.cfg.vision.image_size
    video = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    cands = api.infer_beams(model, video, "Predict actions.", tok,
                            num_beams=3, num_return_sequences=3,
                            max_new_tokens=5, version=version)
    assert len(cands) == 3
    assert all(isinstance(c, str) for c in cands)


def test_model_init_qwen_version_and_infer(rng):
    """Qwen backbone branch (reference __init__.py:27-29 + builder.py:128):
    name-based detection selects the ChatML template and a qkv-bias decoder
    runs the full infer path."""
    import dataclasses

    cfg = tiny_streammind_config()
    cfg = cfg.replace(
        text=dataclasses.replace(
            cfg.text, qkv_bias=True, tie_word_embeddings=True,
            rope_theta=1_000_000.0,
        )
    )
    tok = SPLikeTokenizer()
    model, _, tok, version = streammind_tpu.model_init(
        model_name="StreamMind-Qwen2-tiny", cfg=cfg, tokenizer=tok,
        dtype=jax.numpy.float32,
    )
    assert version == "qwen"
    assert "bias" in model.params["text"]["layers"]["q"]
    size = model.cfg.vision.image_size
    video = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    out = streammind_tpu.infer(
        model, video, "What is happening?", tok, version=version,
        max_new_tokens=4,
    )
    assert isinstance(out, str)


def test_one_shot_infer_rightsizes_cache(rng):
    """api.infer must not pay for the 8192-token session ring: dense decode
    reads the whole ring per step (30 vs 12 ms/token at 7B), so one-shot
    caches size to the prefill bucket + decode budget via the ladder."""
    import streammind_tpu
    from sp_like_tokenizer import SPLikeTokenizer
    from streammind_tpu.config import tiny_streammind_config

    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    model, _, _, _ = streammind_tpu.model_init(cfg=cfg, tokenizer=tok,
                                               dtype=jax.numpy.float32)
    eng = model.engine
    assert eng.cache_capacity_for(128, 64) == 256
    assert eng.cache_capacity_for(1024, 128) == 2048
    assert eng.cache_capacity_for(8000, 500) == eng.kv_capacity  # saturates

    video = rng.standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    # outputs identical whichever capacity serves the one-shot
    out_small = streammind_tpu.infer(model, video, "what", tok, max_new_tokens=4)
    big = eng.new_kv_cache()  # session-size ring path, for comparison
    assert big.k.shape[3] == eng.kv_capacity or big.k.shape[2] == eng.kv_capacity
    assert isinstance(out_small, str)
