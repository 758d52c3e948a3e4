"""End-to-end train() smoke: tiny model + fake dataset, both stages, with
checkpointing + resume and the skip-cls weight copy."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.data.preprocess import build_score_sample
from streammind_tpu.models.meta import init_streammind_params
from streammind_tpu.train.args import DataArguments, ModelArguments, TrainingArguments
from streammind_tpu.train.run import copy_decoder_layers_into_gate, train
from streammind_tpu.train.lora import apply_lora, init_lora_params, merge_lora_into_params
from streammind_tpu.models import mistral as lm
from streammind_tpu.utils.checkpoint import sorted_checkpoints


class FakeScoreDataset:
    """MatchTime-shaped samples with random pixels."""

    def __init__(self, tok, cfg, n=4):
        self.samples = []
        rng = np.random.default_rng(0)
        for i in range(n):
            caption = "</s>" if i % 2 else "a goal is scored"
            s = build_score_sample(caption, f"v{i}.mkv", 1, 100 + i, tok)
            t = 3 + i
            s["video"] = rng.standard_normal(
                (t, 3, cfg.vision.image_size, cfg.vision.image_size)
            ).astype(np.float32)
            self.samples.append(s)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i % len(self.samples)]


@pytest.fixture(scope="module")
def cfg():
    return tiny_streammind_config()


def _args(tmp, stage):
    ma = ModelArguments(train_skip_cls=(stage == "llm"))
    da = DataArguments(
        score_dataset_train_llm=(stage == "llm"),
        score_dataset_train_cls=(stage == "cls"),
    )
    ta = TrainingArguments(
        output_dir=str(tmp), learning_rate=1e-3, bf16=False,
        save_steps=2, logging_steps=1, max_steps=4, resume=True,
    )
    return ma, da, ta


@pytest.mark.slow
def test_train_stage1_and_resume(tmp_path, cfg):
    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg)
    ma, da, ta = _args(tmp_path, "llm")
    state = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert int(state.step) == 4
    # every logged loss must be finite (regression: OOV labels → NaN fill)
    import json as _json
    log = os.path.join(str(tmp_path), "logs", "metrics.jsonl")
    losses = [_json.loads(l)["train/loss"] for l in open(log)]
    assert losses and all(np.isfinite(losses)), losses
    assert sorted_checkpoints(str(tmp_path)) == [2, 4]

    # resume: second run starts at 4 and should no-op (max_steps reached)
    state2 = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert int(state2.step) == 4


@pytest.mark.slow
def test_train_stage2_adapter_only_ckpt(tmp_path, cfg):
    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg)
    ma, da, ta = _args(tmp_path, "cls")
    train(ma, da, ta, dataset=ds, cfg=cfg)
    latest = os.path.join(str(tmp_path), "checkpoint-4")
    with open(os.path.join(latest, "meta.json")) as f:
        assert json.load(f)["adapter_only"]


def test_skip_cls_copy(cfg):
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    before = np.asarray(params["projector"]["cls_net"]["layers"]["q"]["weight"]).copy()
    params = copy_decoder_layers_into_gate(params, cfg)
    gate_q = np.asarray(params["projector"]["cls_net"]["layers"]["q"]["weight"])
    text_q = np.asarray(params["text"]["layers"]["q"]["weight"])
    n = gate_q.shape[0]
    np.testing.assert_array_equal(gate_q, text_q[:n])
    assert not np.array_equal(gate_q, before)


def test_lora_init_and_merge(cfg, rng):
    params = init_streammind_params(jax.random.PRNGKey(1), cfg)
    lora = init_lora_params(jax.random.PRNGKey(2), params["text"], r=4)
    # B=0 → initial delta zero: forward unchanged
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (1, 6)))
    base_logits, _ = lm.text_forward(params["text"], cfg.text, input_ids=ids)
    lora_params = apply_lora(params["text"], lora, scaling=2.0)
    lora_logits, _ = lm.text_forward(lora_params, cfg.text, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(base_logits), np.asarray(lora_logits), rtol=1e-6
    )
    # nonzero B changes the output; merge == apply
    lora["layers"]["q"]["B"] = jnp.ones_like(lora["layers"]["q"]["B"]) * 0.01
    merged = merge_lora_into_params(params, lora, r=4, alpha=8)
    merged_logits, _ = lm.text_forward(merged["text"], cfg.text, input_ids=ids)
    assert not np.allclose(np.asarray(base_logits), np.asarray(merged_logits))


@pytest.mark.slow
def test_train_sft_mixed_media_and_text(tmp_path, cfg):
    """SFT path: media + text-only records through the two step programs."""
    import json as _json

    tok = SPLikeTokenizer()
    records = [
        {"id": "m", "video": "a.mp4", "conversations": [
            {"from": "human", "value": "<video>\ndescribe"},
            {"from": "gpt", "value": "things happen"}]},
        {"id": "t", "conversations": [
            {"from": "human", "value": "hello there"},
            {"from": "gpt", "value": "hi friend"}]},
    ]
    jpath = tmp_path / "sft.json"
    jpath.write_text(_json.dumps(records))

    from streammind_tpu.data.sft import VideoLLaVASFTDataset

    def fake_loader(path, is_video):
        rng2 = np.random.default_rng(1)
        n = 4 if is_video else 1
        return rng2.standard_normal(
            (n, 3, cfg.vision.image_size, cfg.vision.image_size)
        ).astype(np.float32)

    ds = VideoLLaVASFTDataset(str(jpath), str(tmp_path), tok, frame_loader=fake_loader)
    ma = ModelArguments()
    da = DataArguments(dataset="sft", score_dataset_train_llm=True)
    ta = TrainingArguments(
        output_dir=str(tmp_path / "out"), learning_rate=1e-3, bf16=False,
        save_steps=10, logging_steps=1, max_steps=4, resume=False,
    )
    state = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert int(state.step) == 4
    log = os.path.join(str(tmp_path / "out"), "logs", "metrics.jsonl")
    losses = [_json.loads(l)["train/loss"] for l in open(log)]
    assert all(np.isfinite(losses)), losses


def test_pretrain_adapter_loading(tmp_path, cfg):
    """--pretrain-mm-mlp-adapter loads a torch-format mm_projector.bin."""
    from streammind_tpu.utils.checkpoint import save_mm_projector_bin

    src_params = init_streammind_params(jax.random.PRNGKey(7), cfg)
    bin_path = str(tmp_path / "mm_projector.bin")
    save_mm_projector_bin(src_params["projector"], bin_path)

    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg, n=2)
    ma = ModelArguments(pretrain_mm_mlp_adapter=bin_path)
    da = DataArguments(score_dataset_train_cls=True)
    ta = TrainingArguments(output_dir=str(tmp_path / "out"), bf16=False,
                           max_steps=1, save_steps=10, resume=False)
    state = train(ma, da, ta, dataset=ds, cfg=cfg)
    # pre_net is frozen in cls stage → must equal the loaded adapter exactly
    np.testing.assert_array_equal(
        np.asarray(state.params["projector"]["pre_net"]["weight"]),
        np.asarray(src_params["projector"]["pre_net"]["weight"]),
    )


@pytest.mark.slow
def test_train_lora(tmp_path, cfg):
    """--lora-enable trains only LoRA deltas + projector; the base decoder
    stays bit-frozen and losses are finite."""
    import json as _json

    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg)
    ma = ModelArguments()
    da = DataArguments(score_dataset_train_llm=True)
    ta = TrainingArguments(
        output_dir=str(tmp_path), learning_rate=1e-3, bf16=False,
        save_steps=10, logging_steps=1, max_steps=3, resume=False,
        lora_enable=True, lora_r=4, lora_alpha=8,
    )
    state = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert "lora" in state.params
    # base decoder frozen
    from streammind_tpu.models.meta import init_streammind_params as _init

    base = _init(jax.random.PRNGKey(ta.seed), cfg)
    np.testing.assert_array_equal(
        np.asarray(state.params["text"]["layers"]["q"]["weight"]),
        np.asarray(base["text"]["layers"]["q"]["weight"]),
    )
    # LoRA B moved away from zero init
    assert float(np.abs(np.asarray(state.params["lora"]["layers"]["q"]["B"])).sum()) > 0
    log = os.path.join(str(tmp_path), "logs", "metrics.jsonl")
    losses = [_json.loads(l)["train/loss"] for l in open(log)]
    assert all(np.isfinite(losses)), losses


@pytest.mark.slow
def test_train_ego4d_multiturn(tmp_path, cfg):
    """Multi-turn Ego4D streaming samples train through the multi-slot splice."""
    import json as _json

    from streammind_tpu.data.ego4d import preprocess_llama_2_ego4d

    tok = SPLikeTokenizer()
    rng2 = np.random.default_rng(2)

    class Ego4dFake:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            narrs = [(0.5, "You open the door."), (1.5, "You sit down.")]
            s = preprocess_llama_2_ego4d(narrs, tok, fps=2)
            total = sum(s["span_frames"])
            s = dict(s)
            s["video"] = rng2.standard_normal(
                (total, 3, cfg.vision.image_size, cfg.vision.image_size)
            ).astype(np.float32)
            s["caption_info"] = "x"
            return s

    ma = ModelArguments()
    da = DataArguments(dataset="ego4d", score_dataset_train_llm=True)
    ta = TrainingArguments(output_dir=str(tmp_path), learning_rate=1e-3,
                           bf16=False, save_steps=10, logging_steps=1,
                           max_steps=3, resume=False)
    state = train(ma, da, ta, dataset=Ego4dFake(), cfg=cfg)
    assert int(state.step) == 3
    log = os.path.join(str(tmp_path), "logs", "metrics.jsonl")
    losses = [_json.loads(l)["train/loss"] for l in open(log)]
    assert all(np.isfinite(losses)), losses


def test_multiturn_span_clamp_keeps_slots(cfg):
    """Frame truncation must shrink the EARLIEST spans and never drop a
    <video> slot (regression: popping spans crashed build_splice_plan)."""
    from streammind_tpu.train.run import make_batch_from_sample
    from streammind_tpu.models.meta import init_streammind_params as _init

    params = _init(jax.random.PRNGKey(0), cfg)
    rng2 = np.random.default_rng(3)
    n_turns = 3
    ids = [1] + sum([[-201, 5, 6, 2] for _ in range(n_turns)], [])
    labels = [-100] + sum([[-100, 5, 6, 2] for _ in range(n_turns)], [])
    sample = {
        "input_ids": np.asarray(ids)[None],
        "labels": np.asarray(labels)[None],
        "span_frames": [30, 4, 2],   # sum 36 > bucket 16 for tiny cfg? FRAME_BUCKETS starts at 8
        "video": rng2.standard_normal(
            (36, 3, cfg.vision.image_size, cfg.vision.image_size)
        ).astype(np.float32),
        "caption_info": "x",
    }
    batch = make_batch_from_sample(sample, cfg, params["vision"], "llm")
    # all three slots survived: exactly 3 spans' worth of memory positions
    use = np.asarray(batch["use_mem"][0])
    assert use.sum() >= 3  # at least one memory position per turn


@pytest.mark.slow
def test_train_adapter_int8_frozen_base(tmp_path, cfg):
    """--bits 8 adapter stage: the frozen decoder rests int8 (the reference's
    bnb bits path, train_new_stream.py:694-712) and the split train step
    (grads over the trainable projector subtree only) still converges."""
    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg)
    ma = ModelArguments(tune_mm_mlp_adapter=True, bits=8)
    da = DataArguments(score_dataset_train_llm=True)
    ta = TrainingArguments(
        output_dir=str(tmp_path), learning_rate=1e-3, bf16=False,
        save_steps=4, logging_steps=1, max_steps=4, resume=False,
    )
    state = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert int(state.step) == 4
    # decoder stayed quantized AND unchanged; projector trained
    assert "w_int8" in state.params["text"]["layers"]["q"]

    # llm stage with bits<16 must refuse (no matmul-time LoRA yet)
    ma2 = ModelArguments(bits=8)
    da2 = DataArguments(score_dataset_train_llm=True)
    with pytest.raises(NotImplementedError):
        train(ma2, da2, ta, dataset=ds, cfg=cfg)


def test_attach_lora_equals_apply_lora(cfg, rng):
    """Matmul-time LoRA (attach) == merged-weight LoRA (apply) numerics."""
    from streammind_tpu.models import mistral as lm
    from streammind_tpu.train.lora import apply_lora, attach_lora, init_lora_params

    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), params["text"], r=4)
    # non-zero B so the delta actually matters
    lora = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(2), x.shape), lora
    )
    ids = jnp.asarray([[5, 17, 99, 3, 64, 2, 11, 42]])
    merged, _ = lm.text_forward(apply_lora(params["text"], lora, 2.0), cfg.text,
                                input_ids=ids)
    attached, _ = lm.text_forward(attach_lora(params["text"], lora, 2.0), cfg.text,
                                  input_ids=ids)
    np.testing.assert_allclose(np.asarray(attached), np.asarray(merged),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_train_qlora_int8_base(tmp_path, cfg):
    """--bits 8 + lora_enable (QLoRA): the llm stage trains LoRA adapters
    over an int8 frozen base via matmul-time attachment."""
    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg)
    ma = ModelArguments(bits=8)
    da = DataArguments(score_dataset_train_llm=True)
    ta = TrainingArguments(
        output_dir=str(tmp_path), learning_rate=1e-3, bf16=False,
        save_steps=4, logging_steps=1, max_steps=4, resume=False,
        lora_enable=True, lora_r=4, lora_alpha=8,
    )
    state = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert int(state.step) == 4
    assert "w_int8" in state.params["text"]["layers"]["q"]
    # LoRA B started at 0 and must have moved
    assert float(np.abs(np.asarray(
        state.params["lora"]["layers"]["q"]["B"])).sum()) > 0


@pytest.mark.parametrize("ptype", ["stc_connector", "linear", "mlp2x_gelu"])
def test_train_sft_non_mamba_projectors(tmp_path, ptype):
    """The shipped vllava configs train non-mamba projectors
    (scripts/vllava/stc, reference scripts/vllava/*): the SFT loop must
    run them end-to-end, with splice spans sized from the projector's OWN
    output token count (projected_token_count), not per-frame."""
    import dataclasses
    import json as _json

    base = tiny_streammind_config()
    cfg = dataclasses.replace(base, mm_projector_type=ptype)
    tok = SPLikeTokenizer()
    records = [
        {"id": "m", "video": "a.mp4", "conversations": [
            {"from": "human", "value": "<video>\ndescribe"},
            {"from": "gpt", "value": "things happen"}]},
        {"id": "t", "conversations": [
            {"from": "human", "value": "hello there"},
            {"from": "gpt", "value": "hi friend"}]},
    ]
    jpath = tmp_path / "sft.json"
    jpath.write_text(_json.dumps(records))

    from streammind_tpu.data.sft import VideoLLaVASFTDataset

    def fake_loader(path, is_video):
        rng2 = np.random.default_rng(1)
        n = 4 if is_video else 1
        return rng2.standard_normal(
            (n, 3, cfg.vision.image_size, cfg.vision.image_size)
        ).astype(np.float32)

    ds = VideoLLaVASFTDataset(str(jpath), str(tmp_path), tok,
                              frame_loader=fake_loader)
    ma = ModelArguments(mm_projector_type=ptype, train_skip_cls=False)
    da = DataArguments(dataset="sft", score_dataset_train_llm=True)
    ta = TrainingArguments(
        output_dir=str(tmp_path / "out"), learning_rate=1e-3, bf16=False,
        save_steps=10, logging_steps=1, max_steps=2, resume=False,
    )
    state = train(ma, da, ta, dataset=ds, cfg=cfg)
    assert int(state.step) == 2
    log = os.path.join(str(tmp_path / "out"), "logs", "metrics.jsonl")
    losses = [json.loads(l)["train/loss"] for l in open(log)]
    assert losses and all(np.isfinite(losses)), losses


def test_stage2_rejects_non_mamba(tmp_path, cfg):
    import dataclasses

    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg)
    ma, da, ta = _args(tmp_path, "cls")
    bad = dataclasses.replace(cfg, mm_projector_type="linear")
    with pytest.raises(ValueError, match="mamba"):
        train(ma, da, ta, dataset=ds, cfg=bad)


def test_overlong_sample_truncates_not_crashes(tmp_path, cfg):
    """A sample whose spliced length exceeds the largest plan bucket is
    right-truncated (reference: model_max_length truncation) instead of
    raising 'exceeds largest bucket' mid-run."""
    from streammind_tpu.train.run import PLAN_BUCKETS, make_batch_from_sample

    tok = SPLikeTokenizer()
    s = build_score_sample("a goal", "v.mkv", 1, 100, tok)
    rng2 = np.random.default_rng(0)
    s["video"] = rng2.standard_normal(
        (3, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    ids = list(np.asarray(s["input_ids"])[0])
    # inflate the ANSWER tail past the largest bucket (truncation is
    # right-side, like the reference's model_max_length cut; overflow
    # reaching back into the modal slot is a separate hard error)
    ids = ids + [7] * (PLAN_BUCKETS[-1] + 50)
    labels = [-100] * len(ids)
    s["input_ids"] = np.asarray(ids)[None]
    s["labels"] = np.asarray(labels)[None]
    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch_from_sample(s, cfg, params["vision"], "llm")
    assert batch["token_ids"].shape[1] == PLAN_BUCKETS[-1]


def test_merge_lora_over_quantized_base(cfg, rng):
    """QLoRA export: merging adapters into an int8 base must dequantize and
    produce full-precision merged weights (previously KeyError 'weight')."""
    from streammind_tpu.utils.quantize import (
        dequantize_linear_weight, quantize_text_params,
    )

    params = init_streammind_params(jax.random.PRNGKey(0), cfg)
    qtext = quantize_text_params(params["text"], bits=8)
    lora = init_lora_params(jax.random.PRNGKey(1), qtext, r=4)
    merged = merge_lora_into_params({**params, "text": qtext}, lora, r=4, alpha=8)
    leaf = merged["text"]["layers"]["q"]
    assert "weight" in leaf and "w_int8" not in leaf
    base = dequantize_linear_weight(qtext["layers"]["q"])
    delta = np.einsum("lor,lri->loi", np.asarray(lora["layers"]["q"]["B"]),
                      np.asarray(lora["layers"]["q"]["A"]))
    np.testing.assert_allclose(
        np.asarray(leaf["weight"]), np.asarray(base) + 2.0 * delta,
        rtol=1e-4, atol=1e-5,
    )
