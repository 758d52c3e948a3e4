"""Sampler + prefetch + gradient-accumulation semantics.

Covers the round-2 training-runtime additions:
  - LengthGroupedSampler (reference videollama2_trainer_score.py:215-305)
  - prefetch_iter ordering under concurrency
  - accum=2 over two single-sample microbatches == one batch-2 step
  - dp=2 data-parallel batches through the REAL train() loop
"""
import threading
import time

import numpy as np
import pytest

from streammind_tpu.train.sampler import (
    LengthGroupedSampler,
    get_modality_length_grouped_indices,
    split_to_even_chunks,
)
from streammind_tpu.utils.prefetch import prefetch_iter


# ---------------------------------------------------------------------------
# Sampler
# ---------------------------------------------------------------------------
def test_sampler_is_epoch_deterministic_permutation():
    s = LengthGroupedSampler(17, seed=3)
    a, b = s.epoch_indices(0), s.epoch_indices(0)
    assert a == b
    assert sorted(a) == list(range(17))
    assert s.epoch_indices(1) != a  # reshuffles across epochs


def test_modality_grouping_keeps_megabatches_pure():
    # 12 mm (positive) + 12 text (negative) lengths; megabatch = 4
    rng = np.random.default_rng(0)
    lengths = [int(l) for l in rng.integers(5, 90, 12)] + [
        -int(l) for l in rng.integers(5, 90, 12)
    ]
    s = LengthGroupedSampler(
        24, batch_size=1, world_size=4, lengths=lengths, seed=1
    )
    order = s.epoch_indices(0)
    assert sorted(order) == list(range(24))
    # every full megabatch except the merged tail must be modality-pure
    megabatches = [order[i : i + 4] for i in range(0, 24, 4)]
    impure = [
        m for m in megabatches
        if len({lengths[i] > 0 for i in m}) > 1
    ]
    assert len(impure) <= 1  # only the merged ragged tail may mix


def test_length_grouping_balances_chunk_totals():
    """Within a megabatch the world_size chunks carry roughly equal total
    length (the reference's split_to_even_chunks device-balance property)."""
    rng = np.random.default_rng(2)
    lengths = [int(l) for l in rng.integers(1, 100, 32)]
    s = LengthGroupedSampler(
        32, batch_size=2, world_size=4, lengths=lengths, seed=0,
        group_by_modality=False,
    )
    order = s.epoch_indices(0)
    assert sorted(order) == list(range(32))
    for k in range(0, 32, 8):  # megabatch = batch_size * world_size = 8
        mega = order[k : k + 8]
        totals = [sum(lengths[i] for i in mega[c : c + 2]) for c in range(0, 8, 2)]
        assert max(totals) - min(totals) <= max(lengths)  # balanced, not random


def test_split_to_even_chunks_balances_totals():
    lengths = [10, 10, 1, 1, 10, 1, 10, 1]
    chunks = split_to_even_chunks(list(range(8)), lengths, 2)
    totals = [sum(lengths[i] for i in c) for c in chunks]
    assert abs(totals[0] - totals[1]) <= 9
    assert sorted(i for c in chunks for i in c) == list(range(8))


def test_all_one_modality_falls_through():
    lengths = [5, 9, 3, 7]
    rng = np.random.default_rng(0)
    out = get_modality_length_grouped_indices(lengths, 1, 2, rng)
    assert sorted(out) == [0, 1, 2, 3]


# ---------------------------------------------------------------------------
# Prefetch
# ---------------------------------------------------------------------------
def test_prefetch_preserves_order_and_overlaps():
    seen_threads = set()

    def fetch(i):
        seen_threads.add(threading.get_ident())
        time.sleep(0.01)
        return i * i

    out = list(prefetch_iter(fetch, range(20), num_workers=4, depth=8))
    assert out == [i * i for i in range(20)]
    assert len(seen_threads) > 1  # actually ran concurrently


def test_prefetch_sync_fallback():
    out = list(prefetch_iter(lambda i: i + 1, range(5), num_workers=0))
    assert out == [1, 2, 3, 4, 5]


def test_prefetch_propagates_errors():
    def fetch(i):
        if i == 3:
            raise ValueError("boom")
        return i

    it = prefetch_iter(fetch, range(6), num_workers=2, depth=2)
    with pytest.raises(ValueError):
        list(it)


# ---------------------------------------------------------------------------
# Gradient accumulation ≡ bigger batch; dp training loop
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def cfg():
    from streammind_tpu.config import tiny_streammind_config

    return tiny_streammind_config()


def _equal_shape_dataset(cfg, n=2):
    """n media samples with IDENTICAL token counts and frame counts — the
    accum-vs-batch equivalence needs equal per-sample valid-token counts
    (batch-2 loss is a global token mean; accumulation averages per-
    microbatch means)."""
    from sp_like_tokenizer import SPLikeTokenizer
    from streammind_tpu.data.preprocess import build_score_sample

    tok = SPLikeTokenizer()
    rng = np.random.default_rng(7)
    samples = []
    for i in range(n):
        s = build_score_sample("a goal is scored", f"v{i}.mkv", 1, 50, tok)
        s["video"] = rng.standard_normal(
            (4, 3, cfg.vision.image_size, cfg.vision.image_size)
        ).astype(np.float32)
        samples.append(s)

    class DS:
        def __len__(self):
            return len(samples)

        def __getitem__(self, i):
            return samples[i]

    return DS()


@pytest.mark.slow
def test_accum2_equals_batch2(tmp_path, cfg):
    """One optimizer step: accum=2 × B=1 must produce the same params as
    accum=1 × B=2 (VERDICT round-1, missing item 1)."""
    from streammind_tpu.train.args import (
        DataArguments,
        ModelArguments,
        TrainingArguments,
    )
    from streammind_tpu.train.run import train

    ds = _equal_shape_dataset(cfg)
    ma = ModelArguments()
    da = DataArguments(score_dataset_train_llm=True)
    common = dict(
        learning_rate=1e-3, bf16=False, save_steps=100, logging_steps=1,
        max_steps=1, resume=False, seed=5,
    )
    ta_accum = TrainingArguments(
        output_dir=str(tmp_path / "a"), per_device_train_batch_size=1,
        gradient_accumulation_steps=2, **common,
    )
    ta_batch = TrainingArguments(
        output_dir=str(tmp_path / "b"), per_device_train_batch_size=2,
        gradient_accumulation_steps=1, **common,
    )
    sa = train(ma, da, ta_accum, dataset=ds, cfg=cfg)
    sb = train(ma, da, ta_batch, dataset=ds, cfg=cfg)
    qa = np.asarray(sa.params["text"]["layers"]["q"]["weight"])
    qb = np.asarray(sb.params["text"]["layers"]["q"]["weight"])
    np.testing.assert_allclose(qa, qb, rtol=2e-5, atol=2e-6)
    pa = np.asarray(sa.params["projector"]["pre_net"]["weight"])
    pb = np.asarray(sb.params["projector"]["pre_net"]["weight"])
    np.testing.assert_allclose(pa, pb, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_train_dp2_accum2(tmp_path, cfg):
    """The REAL train() loop on a dp=2 mesh with accum=2: batches are
    assembled at B=2 and sharded over the dp axis (VERDICT item 2)."""
    import json as _json
    import os

    from sp_like_tokenizer import SPLikeTokenizer
    from streammind_tpu.data.preprocess import build_score_sample
    from streammind_tpu.train.args import (
        DataArguments,
        ModelArguments,
        TrainingArguments,
    )
    from streammind_tpu.train.run import train

    tok = SPLikeTokenizer()
    rng = np.random.default_rng(1)

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            s = build_score_sample(
                "a goal" if i % 2 else "</s>", f"v{i}.mkv", 1, 60 + i, tok
            )
            s["video"] = rng.standard_normal(
                (3 + i % 3, 3, cfg.vision.image_size, cfg.vision.image_size)
            ).astype(np.float32)
            return s

    ma = ModelArguments()
    da = DataArguments(score_dataset_train_llm=True)
    ta = TrainingArguments(
        output_dir=str(tmp_path), learning_rate=1e-3, bf16=False,
        save_steps=100, logging_steps=1, max_steps=2, resume=False,
        per_device_train_batch_size=1, gradient_accumulation_steps=2, dp=2,
    )
    state = train(ma, da, ta, dataset=DS(), cfg=cfg)
    assert int(state.step) == 2
    log = os.path.join(str(tmp_path), "logs", "metrics.jsonl")
    losses = [_json.loads(l)["train/loss"] for l in open(log)]
    assert losses and all(np.isfinite(losses)), losses
