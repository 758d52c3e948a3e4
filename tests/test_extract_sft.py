"""Feature-extraction pipeline + offline SFT dataset tests."""
import json
import os

import numpy as np
import pytest

from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from streammind_tpu.data.extract import (
    extract_video_features,
    load_feature_window,
    restride_shards,
    shard_path,
)
from streammind_tpu.data.sft import (
    VideoLLaVASFTDataset,
    collate_sft_batch,
    preprocess_llama2_conversations,
    preprocess_plain,
)
from streammind_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib needed")
def test_extract_and_window(tmp_path):
    # features_video tree with a 60-frame video
    vid_dir = tmp_path / "features_video" / "match"
    vid_dir.mkdir(parents=True)
    vpath = str(vid_dir / "1_224p.mkv")
    # mkv container via mpeg4 works through libavformat
    native.write_test_video(vpath, 128, 96, 60, 10)

    def encode_fn(pixels):
        # fake "vision tower": mean over patches of 4 values per frame
        t = pixels.shape[0]
        base = pixels.reshape(t, -1)[:, :8]
        return np.tile(base[:, None, :], (1, 2, 1))  # (T, 2, 8)

    shards = extract_video_features(vpath, encode_fn, half=1, chunk=25)
    assert len(shards) == 3  # 60 frames / 25 → 3 shards
    assert os.path.exists(shard_path(vpath, 1, 0, 25))

    # window crossing a shard boundary
    win = load_feature_window(vpath, 1, 20, 40)
    assert win.shape[0] == 20
    full = np.concatenate(
        [np.load(s)["features"] for s in shards], axis=0
    )
    np.testing.assert_array_equal(win, full[20:40])

    # strided load
    win2 = load_feature_window(vpath, 1, 0, 50, stride=5)
    np.testing.assert_array_equal(win2, full[0:50:5])

    # restride utility
    out = restride_shards(str(vid_dir.parent / "match").replace("features_video", "features_video_encode"), src_fps=10, dst_fps=2)
    assert len(out) == 3
    total_thinned = sum(np.load(p)["features"].shape[0] for p in out)
    assert total_thinned == full[::5].shape[0]  # global 2fps stride


def test_sft_llama2_multiround(rng):
    tok = SPLikeTokenizer()
    convs = [
        {"from": "human", "value": "<video>\nWhat happens?"},
        {"from": "gpt", "value": "A goal."},
        {"from": "human", "value": "Then?"},
        {"from": "gpt", "value": "Celebration."},
    ]
    out = preprocess_llama2_conversations(convs, tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == VIDEO_TOKEN_INDEX).sum() == 1
    sup = labels != IGNORE_INDEX
    assert sup.sum() > 0
    # both answers supervised: two eos tokens in the supervised set
    assert (labels[sup] == tok.eos_token_id).sum() == 2


def test_sft_plain():
    tok = SPLikeTokenizer()
    convs = [
        {"from": "human", "value": "<video>"},
        {"from": "gpt", "value": "a dog runs"},
    ]
    out = preprocess_plain(convs, tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids[1] == VIDEO_TOKEN_INDEX
    assert labels[0] == IGNORE_INDEX and labels[1] == IGNORE_INDEX
    assert (labels[2:] != IGNORE_INDEX).all()


def test_sft_dataset_and_collator(tmp_path, rng):
    tok = SPLikeTokenizer()
    records = [
        {"id": "a", "video": "a.mp4", "conversations": [
            {"from": "human", "value": "<video>\ndescribe"},
            {"from": "gpt", "value": "something happens"}]},
        {"id": "b", "conversations": [
            {"from": "human", "value": "hello"},
            {"from": "gpt", "value": "hi there friend"}]},
    ]
    jpath = tmp_path / "sft.json"
    jpath.write_text(json.dumps(records))

    def fake_loader(path, is_video):
        return np.zeros((4 if is_video else 1, 3, 8, 8), np.float32)

    ds = VideoLLaVASFTDataset(str(jpath), str(tmp_path), tok, frame_loader=fake_loader)
    assert len(ds) == 2
    lens = ds.modality_lengths
    assert lens[0] > 0 and lens[1] < 0  # text-only is negative
    s0, s1 = ds[0], ds[1]
    assert s0["video"] is not None and s1["video"] is None
    batch = collate_sft_batch([s0, s1])
    assert batch["input_ids"].shape[0] == 2
    assert batch["attention_mask"][0].sum() == s0["input_ids"].shape[1]
