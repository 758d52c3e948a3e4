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


def test_select_best_resolution():
    from streammind_tpu.mm_utils import select_best_resolution

    # wide image → wide grid wins (most effective pixels kept)
    grids = [(336, 336), (672, 336), (336, 672), (672, 672)]
    assert select_best_resolution((800, 400), grids) == (672, 336)
    assert select_best_resolution((400, 800), grids) == (336, 672)
    # square small image → ties on effective pixels, least waste wins
    assert select_best_resolution((100, 100), grids) == (336, 336)


def test_resize_and_pad_image_centers_and_preserves_aspect():
    from PIL import Image

    from streammind_tpu.mm_utils import resize_and_pad_image

    img = Image.new("RGB", (200, 100), (255, 0, 0))
    out = resize_and_pad_image(img, (336, 336))
    assert out.size == (336, 336)
    arr = np.asarray(out)
    # red band vertically centered, black bars above/below
    assert arr[168, 168, 0] == 255
    assert (arr[0] == 0).all() and (arr[-1] == 0).all()


def test_process_anyres_image_thumb_plus_patches():
    from PIL import Image

    from streammind_tpu.constants import GRIDS
    from streammind_tpu.mm_utils import (
        get_anyres_image_grid_shape,
        process_anyres_image,
    )

    img = Image.new("RGB", (700, 340), (0, 128, 0))
    patches = process_anyres_image(img, GRIDS, 336)
    cols, rows = get_anyres_image_grid_shape(img.size, GRIDS, 336)
    # (3,1) beats (2,1): height-limited scale keeps more effective pixels
    assert (cols, rows) == (3, 1)
    # [global thumbnail] + rows*cols crops, all patch-sized
    assert len(patches) == 1 + rows * cols
    assert all(p.size == (336, 336) for p in patches)
    # grids may also arrive as a string literal (reference accepts both)
    patches2 = process_anyres_image(img, "[(2, 2), (1, 2), (3, 1)]", 336)
    assert len(patches2) == len(patches)


def test_process_image_anyres_batch():
    from PIL import Image

    from streammind_tpu.mm_utils import process_image

    img = Image.new("RGB", (700, 340), (30, 60, 90))
    out = process_image(img, aspect_ratio="anyres")
    # thumbnail + 3x1 grid crops
    assert out.shape == (4, 3, 336, 336)
    single = process_image(img, aspect_ratio="pad")
    assert single.shape == (1, 3, 336, 336)


def test_trim_at_stop_strings():
    from streammind_tpu.api import _stop_strings
    from streammind_tpu.mm_utils import trim_at_stop_strings

    assert _stop_strings("qwen") == ["<|im_end|>"]
    assert _stop_strings("llama_2") == ["</s>"]
    assert _stop_strings("unregistered") == []
    out = trim_at_stop_strings(
        "answer<|im_end|>\n<|im_start|>user junk", _stop_strings("qwen")
    )
    assert out == "answer"
    assert trim_at_stop_strings("no stops here", ["</s>"]) == "no stops here"


def test_merge_scenes():
    from streammind_tpu.mm_utils import merge_scenes

    # no cuts → one uniform window
    out = merge_scenes([], [], [], num_frames=40, num_frame_per_scene=4)
    assert len(out) == 1 and list(out[0]) == [0, 13, 26, 39]

    # 5 scenes, max 3 → the two weakest cuts (scores 0.1, 0.2) are fused
    cuts = [10, 20, 30, 40]
    scores = [0.9, 0.1, 0.8, 0.2]
    scenes = [(0, 10), (10, 20), (20, 30), (30, 40), (40, 50)]
    out = merge_scenes(cuts, scores, scenes, num_frames=50,
                       max_scene_num=3, num_frame_per_scene=2)
    # surviving cuts 10, 30 → windows [0,10) [10,30) [30,50)
    assert [list(w) for w in out] == [[0, 9], [10, 29], [30, 49]]


def test_frame_expansion_and_base64_loader():
    import base64
    from io import BytesIO

    from PIL import Image

    from streammind_tpu.mm_utils import frame_expansion, load_image_from_base64

    frames = [Image.new("RGB", (10, 10)) for _ in range(4)]
    assert frame_expansion(frames, 2).size == (20, 20)
    buf = BytesIO()
    Image.new("RGB", (7, 5), (1, 2, 3)).save(buf, "PNG")
    img = load_image_from_base64(base64.b64encode(buf.getvalue()).decode())
    assert img.size == (7, 5)
