"""Native ingest tests: write a deterministic video with the C++ encoder,
read it back through the C++ decode+preprocess path, and cross-check the
normalization against the Python CLIP preprocessing."""
import numpy as np
import pytest

from streammind_tpu import native
from streammind_tpu.constants import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ingest lib not built"
)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    native.write_test_video(path, w=224, h=160, n_frames=30, fps=10)
    return path


def test_open_and_info(video):
    with native.NativeVideoReader(video) as vr:
        assert vr.width == 224 and vr.height == 160
        # container-muxer fps estimate can be slightly off (observed 10.34)
        assert vr.fps == pytest.approx(10.0, rel=0.1)
        assert 28 <= vr.num_frames <= 32


def test_read_shapes_and_normalization(video):
    with native.NativeVideoReader(video) as vr:
        out = vr.read([0, 5, 10], size=112)
    assert out.shape == (3, 3, 112, 112)
    assert out.dtype == np.float32
    # letterbox rows (160/224 → pad top+bottom) must equal the normalized
    # CLIP mean fill: (mean*255→round→/255 - mean)/std ≈ 0
    mean = np.asarray(CLIP_IMAGE_MEAN).reshape(3, 1)
    std = np.asarray(CLIP_IMAGE_STD).reshape(3, 1)
    fill = (np.round(mean * 255) / 255 - mean) / std
    np.testing.assert_allclose(out[0, :, 0, :], np.broadcast_to(fill, (3, 112)), atol=0.02)
    # content rows vary (gradient)
    assert out[0, 0, 56, :].std() > 0.05


def test_frames_differ_and_sequential_reads(video):
    with native.NativeVideoReader(video) as vr:
        a = vr.read([0], size=112)
        b = vr.read([20], size=112)  # forward read after cursor
        c = vr.read([0], size=112)   # backward → internal seek-to-start
    assert not np.allclose(a, b)
    np.testing.assert_allclose(a, c, atol=1e-6)


def test_matches_python_preprocess_geometry(video):
    """Same letterbox geometry as expand2square + resize (values differ by
    resampler; check the content box alignment, not exact pixels)."""
    from streammind_tpu.mm_utils import clip_preprocess
    from PIL import Image

    with native.NativeVideoReader(video) as vr:
        nat = vr.read([0], size=112)[0]
    # python path on a synthetic gradient frame of the same dims
    frame = np.zeros((160, 224, 3), np.uint8)
    for y in range(160):
        for x in range(224):
            frame[y, x] = (x + y) & 0xFF
    py = clip_preprocess([Image.fromarray(frame)], image_size=112)[0]
    # pad rows agree
    np.testing.assert_allclose(nat[:, 0, :], py[:, 0, :], atol=0.03)
    # content region correlates strongly (different codecs/resamplers)
    na = nat[:, 28:84, :].ravel()
    pa = py[:, 28:84, :].ravel()
    corr = np.corrcoef(na, pa)[0, 1]
    assert corr > 0.9, corr


def test_native_process_video(video):
    out = native.native_process_video(video, num_frames=4, size=112)
    assert out.shape == (4, 3, 112, 112)


def test_short_read_non_ascending_order(video):
    """strict=False short read with a NON-ascending request: previously the
    scatter-based unsort indexed past the truncated array (IndexError);
    surviving frames must come back in requested order."""
    with native.NativeVideoReader(video) as vr:
        n = vr.num_frames
        # request beyond the end, out of order: [way-past, 2, 5]
        out = vr.read([n + 500, 2, 5], size=112, strict=False)
        assert out.shape[0] <= 3
        # frames 2 and 5 decode; compare against direct ascending reads
        ref = vr.read([2, 5], size=112)
    if out.shape[0] >= 2:
        np.testing.assert_allclose(out[0], ref[0], atol=1e-6)  # frame 2 first
        np.testing.assert_allclose(out[1], ref[1], atol=1e-6)


def test_full_read_requested_order(video):
    with native.NativeVideoReader(video) as vr:
        out = vr.read([10, 2, 5], size=112)
        ref = vr.read([2, 5, 10], size=112)
    np.testing.assert_allclose(out[0], ref[2], atol=1e-6)
    np.testing.assert_allclose(out[1], ref[0], atol=1e-6)
    np.testing.assert_allclose(out[2], ref[1], atol=1e-6)
