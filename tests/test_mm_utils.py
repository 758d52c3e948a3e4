"""Frame sampling + tokenizer-splice parity tests."""
import numpy as np
import pytest

from streammind_tpu.constants import VIDEO_TOKEN_INDEX, IMAGE_TOKEN_INDEX
from streammind_tpu.mm_utils import (
    clip_preprocess,
    expand2square,
    frame_sample,
    tokenizer_multimodal_token,
)


class FakeTokenizer:
    """Tokenizes per whitespace word -> (100 + stable hash); prepends BOS=1."""

    bos_token_id = 1

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        ids = [self.bos_token_id]
        for w in text.split():
            ids.append(100 + (hash(w) % 1000))
        return self._Out(ids)


def test_frame_sample_uniform_segment_middle():
    # duration=100, 8 frames: matches reference segment-middle math
    ids = frame_sample(100, "uniform", num_frames=8)
    assert len(ids) == 8
    seg = 99.0 / 8
    expected = [
        (int(round(seg * i)) + int(round(seg * (i + 1)))) // 2 for i in range(8)
    ]
    assert ids == expected
    assert all(0 <= i < 100 for i in ids)


def test_frame_sample_fps():
    ids = frame_sample(100, "fps", local_fps=30.0)
    # segment_len = 30, start at 15
    assert ids[0] == 15
    assert all(b - a == 30 for a, b in zip(ids, ids[1:]))


def test_tokenizer_splice_single_video():
    tok = FakeTokenizer()
    prompt = "describe this <video> in detail"
    ids = tokenizer_multimodal_token(prompt, tok, VIDEO_TOKEN_INDEX)
    # BOS kept once; -201 spliced where the placeholder sat; later chunk BOS dropped
    assert ids[0] == tok.bos_token_id
    assert ids.count(VIDEO_TOKEN_INDEX) == 1
    assert ids.count(tok.bos_token_id) == 1
    left = tok("describe this ").input_ids
    right = tok(" in detail").input_ids
    assert ids == left + [VIDEO_TOKEN_INDEX] + right[1:]


def test_tokenizer_splice_no_placeholder():
    tok = FakeTokenizer()
    ids = tokenizer_multimodal_token("just text", tok, IMAGE_TOKEN_INDEX)
    assert ids == tok("just text").input_ids


def test_tokenizer_splice_two_placeholders():
    tok = FakeTokenizer()
    ids = tokenizer_multimodal_token("a <image> b <image> c", tok, IMAGE_TOKEN_INDEX)
    assert ids.count(IMAGE_TOKEN_INDEX) == 2


def test_expand2square_and_preprocess():
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    img = Image.new("RGB", (64, 32), (255, 0, 0))
    sq = expand2square(img, (0, 0, 0))
    assert sq.size == (64, 64)

    out = clip_preprocess([img], image_size=56)
    assert out.shape == (1, 3, 56, 56)
    assert out.dtype == np.float32
    # padded rows should be near the normalized mean-fill color ~ 0
    assert abs(out[0, 1, 0, 28]) < 0.1  # green channel of mean-colored pad
