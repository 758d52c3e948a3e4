"""Data-layer golden tests: label masking (caption + silence), silence-sample
insertion, MatchTime index bookkeeping, Ego4D multi-turn construction."""
import json
import os
import random

import numpy as np
import pytest

from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from streammind_tpu.data import (
    MatchTimeDataset,
    build_index,
    collate_score_batch,
    extract_video_half,
    get_annos,
    insert_silence_samples,
    parse_labels_caption,
    preprocess_llama2_score,
    preprocess_llama_2_ego4d,
    trans_video_to_json,
)


@pytest.fixture
def tok():
    return SPLikeTokenizer()


def test_caption_label_masking(tok):
    out = preprocess_llama2_score("A great goal is scored!", tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids[0] == tok.bos_token_id
    assert labels[0] == IGNORE_INDEX
    assert (ids == VIDEO_TOKEN_INDEX).sum() == 1
    # supervised region == caption tokens + final eos, nothing else
    sup = labels != IGNORE_INDEX
    assert sup.sum() > 0, "labels were zeroed — bookkeeping mismatch"
    cap_ids = tok("A great goal is scored!").input_ids[1:]
    from sp_like_tokenizer import SPACE_ID

    # "caption </s>" leaves a standalone '▁' before the special token
    expected_tail = np.asarray(cap_ids + [SPACE_ID, tok.eos_token_id])
    np.testing.assert_array_equal(labels[sup], expected_tail)
    # instruction region fully masked
    first_sup = np.nonzero(sup)[0][0]
    assert (labels[:first_sup] == IGNORE_INDEX).all()
    # and the supervised tail is contiguous to the end
    assert sup[first_sup:].all()


def test_silence_label_masking(tok):
    out = preprocess_llama2_score("</s>", tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    sup = labels != IGNORE_INDEX
    assert sup.sum() == 2, "silence sample must supervise exactly the two eos"
    np.testing.assert_array_equal(labels[sup], [2, 2])
    # the de-duplicated space: ids must end [..., eos, eos]
    assert ids[-1] == 2 and ids[-2] == 2
    assert ids[-3] != 2  # only two eos at the tail


def test_insert_silence_samples_bounds():
    rng = random.Random(0)
    ts = [10, 11, 100]
    caps = ["a", "b", "c"]
    out_ts, out_start, out_cap = insert_silence_samples(ts, caps, rng)
    # gap 10→11 (<2s): no insertion; gap 11→100: 1..2 silences
    sil = [t for t, c in zip(out_ts, out_cap) if c == "</s>"]
    assert all(11 < t < 100 for t in sil)
    assert 1 <= len(sil) <= max(1, (100 - 11) // 30)
    # ordering preserved and starts correct
    assert out_ts == sorted(out_ts)
    for t, s, c in zip(out_ts, out_start, out_cap):
        if c == "</s>":
            assert s == 11


def test_matchtime_paths():
    p = "/data/MatchTime/features_video/epl/2015-x/1_224p.mkv"
    assert trans_video_to_json(p) == "/data/MatchTime/dataset/MatchTime/train/epl/2015-x/Labels-caption.json"
    assert extract_video_half(p) == 1
    assert extract_video_half(p.replace("1_", "2_")) == 2


def _make_matchtime_tree(tmp_path):
    feat = tmp_path / "features_video" / "epl" / "match1"
    feat.mkdir(parents=True)
    (feat / "1_224p.mkv").write_bytes(b"")
    lab = tmp_path / "dataset" / "MatchTime" / "train" / "epl" / "match1"
    lab.mkdir(parents=True)
    anns = {
        "annotations": [
            {"gameTime": "1 - 10:00", "anonymized": "late goal"},
            {"gameTime": "1 - 01:00", "anonymized": "kick off"},
            {"gameTime": "2 - 05:00", "anonymized": "second half event"},
        ]
    }
    (lab / "Labels-caption.json").write_text(json.dumps(anns))
    return str(tmp_path / "features_video")


def test_parse_labels_and_index(tmp_path):
    root = _make_matchtime_tree(tmp_path)
    videos = [os.path.join(root, "epl", "match1", "1_224p.mkv")]
    ts, caps = parse_labels_caption(trans_video_to_json(videos[0]), 1)
    assert ts == [60, 600] and caps == ["kick off", "late goal"]

    idx = build_index(root, seed=0)
    assert idx.video_paths == videos
    assert len(idx) >= 2  # 2 captions + inserted silences
    vid, cap = idx.locate(0)
    assert vid == 0 and cap == 0


def test_matchtime_dataset_with_fake_loader(tmp_path, tok):
    root = _make_matchtime_tree(tmp_path)

    def fake_loader(video_path, start_ts, end_ts):
        n = max(int((end_ts - start_ts) * 2), 1)
        return np.zeros((n, 3, 8, 8), np.float32)

    ds = MatchTimeDataset(root, tok, frame_loader=fake_loader, seed=0)
    sample = ds[len(ds) - 1]
    assert sample["input_ids"].shape[0] == 1
    assert sample["video"].ndim == 4
    assert sample["half"] == 1
    batch = collate_score_batch([sample])
    assert batch["images"][1] == ["video"]
    assert batch["attention_mask"] is None


def test_ego4d_multiturn(tok, tmp_path):
    narrations = [(0.5, "You open the door."), (2.0, "You enter the room."), (2.5, "You sit down.")]
    out = preprocess_llama_2_ego4d(narrations, tok, fps=2)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == VIDEO_TOKEN_INDEX).sum() == 3  # one slot per turn
    assert (labels == tok.eos_token_id).sum() == 3  # one eos per turn
    assert out["span_frames"] == [1, 3, 1]
    # exactly one BOS (first turn only)
    assert (ids == tok.bos_token_id).sum() == 1

    anno = {"vid1": [[0.4, "You open the door."], [1.9, "You enter the room."]]}
    path = tmp_path / "annos.json"
    path.write_text(json.dumps(anno))
    annos = get_annos(str(path))
    assert annos["vid1"][0][0] == 0.5  # grid-ceiled
    assert annos["vid1"][1][0] == 2.0


def test_insert_silence_distribution_matches_reference_scheme():
    """Statistical check against the reference's exact sampling scheme
    (train_new_stream_1221.py:927-931): for a gap g >= 2 the silence count is
    randint(1, max(1, g//30)) — uniform over that range — and the silence
    timestamps are a uniform without-replacement sample of (prev, ts)."""
    from streammind_tpu.data import insert_silence_samples

    prev, ts = 100, 250          # gap 150 → count uniform on 1..5
    n_trials = 4000
    counts = np.zeros(6, dtype=int)
    pos_sum, pos_n = 0.0, 0
    for seed in range(n_trials):
        rng = random.Random(seed)
        out_ts, out_start, out_cap = insert_silence_samples(
            [prev, ts], ["a", "b"], rng
        )
        sil = [t for t, c in zip(out_ts, out_cap) if c == "</s>"]
        assert 1 <= len(sil) <= 5
        assert sil == sorted(sil) and len(set(sil)) == len(sil)
        assert all(prev < t < ts for t in sil)
        # silences carry the previous caption's timestamp as window start
        starts = [s for s, c in zip(out_start, out_cap) if c == "</s>"]
        assert all(s == prev for s in starts)
        counts[len(sil)] += 1
        pos_sum += sum(sil)
        pos_n += len(sil)

    # count ~ Uniform{1..5}: each bin ≈ n_trials/5, allow ±15%
    expected = n_trials / 5
    for k in range(1, 6):
        assert abs(counts[k] - expected) < 0.15 * expected, counts
    # positions ~ Uniform(prev+1, ts-1): mean ≈ (prev+ts)/2, allow ±2%
    mean_pos = pos_sum / pos_n
    assert abs(mean_pos - (prev + ts) / 2) < 0.02 * (ts - prev)

    # small gap (2 <= g < 30) → exactly one silence, always
    for seed in range(50):
        rng = random.Random(seed)
        out_ts, _, out_cap = insert_silence_samples([0, 5], ["a", "b"], rng)
        assert out_cap.count("</s>") == 1
    # gap < 2 → no silence
    out_ts, _, out_cap = insert_silence_samples([0, 1], ["a", "b"])
    assert out_cap.count("</s>") == 0
