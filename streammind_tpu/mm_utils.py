"""Multimodal data utilities: frame sampling, CLIP preprocessing, and the
modal-token tokenizer splice.

Behavioral parity targets (reference /root/reference/streammind/mm_utils.py):
  - ``frame_sample``            — segment-middle uniform + fps modes (:377-399)
  - ``expand2square``           — pad-to-square with CLIP mean fill (:257-269)
  - ``process_video/image``     — decode → sample → pad → CLIP normalize (:356-460)
  - ``tokenizer_multimodal_token`` — <video>/<image> split-splice (:567-607)

Everything returns numpy arrays (host side); device placement happens in the
engine.  No torch anywhere on this path.
"""
from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from .constants import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    CLIP_IMAGE_SIZE,
    MAX_FRAMES,
    MMODAL_INDEX_TOKEN,
    MMODAL_TOKEN_INDEX,
    NUM_FRAMES,
    NUM_FRAMES_PER_SECOND,
    IMAGE_TOKEN_INDEX,
)

try:  # PIL is ubiquitous but keep the import soft for minimal installs
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


# ---------------------------------------------------------------------------
# Frame index sampling
# ---------------------------------------------------------------------------
def frame_sample_uniform(duration: int, num_frames: int) -> List[int]:
    """Segment-middle uniform sampling: split [0, duration) into num_frames
    segments and take each segment's midpoint."""
    seg_size = float(duration - 1) / num_frames
    ids = []
    for i in range(num_frames):
        start = int(round(seg_size * i))
        end = int(round(seg_size * (i + 1)))
        ids.append((start + end) // 2)
    return ids


def frame_sample_fps(
    duration: int, local_fps: float, target_fps: float = NUM_FRAMES_PER_SECOND
) -> List[int]:
    """Sample one frame per 1/target_fps seconds, centered in each interval."""
    segment_len = min(int(local_fps) // int(target_fps), duration)
    segment_len = max(segment_len, 1)
    return list(np.arange(segment_len // 2, duration, segment_len, dtype=int))


def frame_sample(
    duration: int,
    mode: str = "uniform",
    num_frames: int = NUM_FRAMES,
    local_fps: Optional[float] = None,
) -> List[int]:
    if mode == "uniform":
        return frame_sample_uniform(duration, num_frames)
    if mode == "fps":
        assert local_fps is not None, "fps sampling needs the source frame rate"
        return frame_sample_fps(duration, local_fps)
    raise ValueError(f"Unsupported frame sampling mode: {mode}")


# ---------------------------------------------------------------------------
# Image preprocessing (CLIP ViT-L/14-336 pipeline, numpy end-to-end)
# ---------------------------------------------------------------------------
def expand2square(img: "Image.Image", background_color) -> "Image.Image":
    """Pad a PIL image to square, centering it on the fill color."""
    width, height = img.size
    if width == height:
        return img
    side = max(width, height)
    result = Image.new(img.mode, (side, side), background_color)
    if width > height:
        result.paste(img, (0, (side - height) // 2))
    else:
        result.paste(img, ((side - width) // 2, 0))
    return result


def clip_background_color():
    return tuple(int(x * 255) for x in CLIP_IMAGE_MEAN)


def _resize_bicubic(img: "Image.Image", size: int) -> "Image.Image":
    return img.resize((size, size), Image.BICUBIC)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top : top + size, left : left + size]


def clip_preprocess(
    images: Sequence["Image.Image"],
    image_size: int = CLIP_IMAGE_SIZE,
    pad_square: bool = True,
    dtype=np.float32,
) -> np.ndarray:
    """PIL images → (N, 3, H, W) normalized pixel values.

    With ``pad_square`` the image is first letterboxed with the CLIP mean
    color (reference 'pad' aspect-ratio mode), then bicubic-resized to the
    target square; otherwise shortest-edge resize + center crop (the stock
    CLIPImageProcessor path).
    """
    mean = np.asarray(CLIP_IMAGE_MEAN, dtype=np.float32).reshape(3, 1, 1)
    std = np.asarray(CLIP_IMAGE_STD, dtype=np.float32).reshape(3, 1, 1)
    out = np.empty((len(images), 3, image_size, image_size), dtype=dtype)
    bg = clip_background_color()
    for i, img in enumerate(images):
        if img.mode != "RGB":
            img = img.convert("RGB")
        if pad_square:
            img = expand2square(img, bg)
            img = _resize_bicubic(img, image_size)
            arr = np.asarray(img, dtype=np.float32)
        else:
            w, h = img.size
            scale = image_size / min(w, h)
            img = img.resize(
                (max(image_size, int(round(w * scale))), max(image_size, int(round(h * scale)))),
                Image.BICUBIC,
            )
            arr = _center_crop(np.asarray(img, dtype=np.float32), image_size)
        arr = arr.transpose(2, 0, 1) / 255.0
        out[i] = (arr - mean) / std
    return out


def frames_to_pil(video_data: np.ndarray) -> List["Image.Image"]:
    return [Image.fromarray(f) for f in video_data]


def create_photo_grid(frames: Sequence["Image.Image"], n: int = 2) -> "Image.Image":
    """Tile n*n frames into one grid image (reference mm_utils.py:236-251;
    the worker's optional 2x2 temporal-aug grid, model_worker.py:192-203)."""
    assert len(frames) == n * n, f"need {n*n} frames, got {len(frames)}"
    w, h = frames[0].size
    grid = Image.new("RGB", (n * w, n * h))
    for i in range(n):
        for j in range(n):
            grid.paste(frames[i * n + j], (j * w, i * h))
    return grid


# ---------------------------------------------------------------------------
# AnyRes: high-resolution single images as a best-fit grid of crops
# (reference mm_utils.py:123-232; constants.GRIDS lists the candidate grids)
# ---------------------------------------------------------------------------
def select_best_resolution(
    original_size: Tuple[int, int], possible_resolutions: Sequence[Tuple[int, int]]
) -> Tuple[int, int]:
    """Pick the candidate (w, h) that keeps the most effective pixels after
    aspect-preserving downscale, breaking ties by least wasted area
    (reference mm_utils.py:123-146)."""
    ow, oh = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for w, h in possible_resolutions:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (w, h), eff, waste
    return best


def resize_and_pad_image(
    img: "Image.Image", target_resolution: Tuple[int, int]
) -> "Image.Image":
    """Aspect-preserving resize onto a black canvas of target_resolution,
    centered (reference mm_utils.py:148-175)."""
    ow, oh = img.size
    tw, th = target_resolution
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    resized = img.resize((nw, nh))
    canvas = Image.new("RGB", (tw, th), (0, 0, 0))
    canvas.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
    return canvas


def divide_to_patches(img: "Image.Image", patch_size: int) -> List["Image.Image"]:
    """Row-major patch_size×patch_size crops (reference mm_utils.py:177-193)."""
    w, h = img.size
    return [
        img.crop((j, i, j + patch_size, i + patch_size))
        for i in range(0, h, patch_size)
        for j in range(0, w, patch_size)
    ]


def get_anyres_image_grid_shape(
    image_size: Tuple[int, int], grids, patch_size: int
) -> Tuple[int, int]:
    """(cols, rows) of the patch grid the image maps onto
    (reference mm_utils.py:195-210)."""
    if isinstance(grids, str):
        import ast

        grids = ast.literal_eval(grids)
    resolutions = [(x * patch_size, y * patch_size) for x, y in grids]
    w, h = select_best_resolution(image_size, resolutions)
    return w // patch_size, h // patch_size


def process_anyres_image(
    img: "Image.Image", grids, patch_size: int
) -> List["Image.Image"]:
    """Split a high-res image into [global thumbnail] + best-fit grid crops,
    each patch_size² (reference mm_utils.py:213-232).  Feed the result as a
    frame batch to the vision tower; the splice's multi-slot plans place the
    resulting token groups."""
    if isinstance(grids, str):
        import ast

        grids = ast.literal_eval(grids)
    resolutions = [(x * patch_size, y * patch_size) for x, y in grids]
    best = select_best_resolution(img.size, resolutions)
    patches = divide_to_patches(resize_and_pad_image(img, best), patch_size)
    thumb = resize_and_pad_image(img, (patch_size, patch_size))
    return [thumb] + patches


# ---------------------------------------------------------------------------
# Video decode
# ---------------------------------------------------------------------------
def read_video_frames(video_path: str, frame_ids: Sequence[int]) -> np.ndarray:
    """Decode specific frame indices from a video file → (T, H, W, 3) uint8.

    Prefers decord if present, falls back to imageio(+ffmpeg) or PIL for GIFs.
    The hot serving path uses the native ingest module instead
    (streammind_tpu/native) — this is the offline/convenience reader.
    """
    if video_path.endswith(".gif"):
        import imageio

        reader = imageio.get_reader(video_path)
        wanted = set(int(i) for i in frame_ids)
        by_id = {i: np.asarray(f)[..., :3] for i, f in enumerate(reader) if i in wanted}
        # honor duplicates and request order (uniform sampling of short clips
        # repeats ids; a set-only collapse would return a short stack)
        return np.stack([by_id[int(i)] for i in frame_ids])
    try:
        from decord import VideoReader, cpu  # type: ignore

        vr = VideoReader(uri=video_path, ctx=cpu(0), num_threads=1)
        return vr.get_batch(list(frame_ids)).asnumpy()
    except ImportError:
        pass
    import imageio.v2 as imageio

    reader = imageio.get_reader(video_path)
    wanted = set(int(i) for i in frame_ids)
    frames = {i: np.asarray(f) for i, f in enumerate(reader) if i in wanted}
    return np.stack([frames[int(i)] for i in frame_ids])


def video_metadata(video_path: str):
    """(duration_frames, fps) for a video file."""
    if video_path.endswith(".gif"):
        import imageio

        reader = imageio.get_reader(video_path)
        return sum(1 for _ in reader), 10.0
    try:
        from decord import VideoReader, cpu  # type: ignore

        vr = VideoReader(uri=video_path, ctx=cpu(0), num_threads=1)
        return len(vr), float(vr.get_avg_fps())
    except ImportError:
        import imageio.v2 as imageio

        reader = imageio.get_reader(video_path)
        meta = reader.get_meta_data()
        n = reader.count_frames()
        return int(n), float(meta.get("fps", 30.0))


def process_video(
    video_path: Union[str, np.ndarray],
    num_frames: int = NUM_FRAMES,
    sample_scheme: str = "uniform",
    aspect_ratio: str = "pad",
    image_size: int = CLIP_IMAGE_SIZE,
) -> np.ndarray:
    """Video file/array → (T, 3, image_size, image_size) float32 pixel
    values (default 336, the CLIP ViT-L/14-336 input; model_init binds the
    loaded config's vision.image_size so non-336 towers get matching
    frames).

    File inputs prefer the native C++ ingest (decode + letterbox + normalize
    in one pass, streammind_tpu/native.py); arrays and unsupported containers
    fall back to the Python path below.
    """
    if isinstance(video_path, str) and not video_path.endswith(".gif"):
        try:
            from . import native

            if native.available():
                return native.native_process_video(
                    video_path, num_frames=num_frames,
                    sample_scheme=sample_scheme, size=image_size,
                    pad_square=(aspect_ratio == "pad"),
                )
        except Exception:  # noqa: BLE001 — fall back to the Python reader
            pass
    if isinstance(video_path, str):
        duration, local_fps = video_metadata(video_path)
        ids = frame_sample(duration, sample_scheme, num_frames, local_fps)
        if len(ids) > MAX_FRAMES:
            ids = list(np.linspace(0, duration - 1, MAX_FRAMES, dtype=int))
        video_data = read_video_frames(video_path, ids)
    else:
        video_data = np.asarray(video_path)
        if video_data.ndim == 3:
            video_data = video_data[None]
    images = frames_to_pil(video_data)
    return clip_preprocess(images, image_size=image_size,
                           pad_square=(aspect_ratio == "pad"))


def process_image(
    image: Union[str, "Image.Image", np.ndarray], aspect_ratio: str = "pad"
) -> np.ndarray:
    """Image → (N, 3, 336, 336) float32 pixel values.

    aspect_ratio "anyres" returns the thumbnail + best-fit grid crops as a
    batch (reference process_anyres_image, mm_utils.py:213-232); otherwise a
    single frame (N=1), square-padded when "pad"."""
    if isinstance(image, str):
        image = Image.open(image)
    elif isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    if aspect_ratio == "anyres":
        from .constants import GRIDS

        crops = process_anyres_image(image.convert("RGB"), GRIDS, 336)
        return clip_preprocess(crops, pad_square=False)
    return clip_preprocess([image], pad_square=(aspect_ratio == "pad"))


# ---------------------------------------------------------------------------
# Tokenizer splice
# ---------------------------------------------------------------------------
def tokenizer_multimodal_token(
    prompt: str,
    tokenizer,
    multimodal_token_index: int = IMAGE_TOKEN_INDEX,
) -> List[int]:
    """Tokenize a prompt containing a modal placeholder (<image>/<video>/<audio>),
    splicing the negative modal token index where the placeholder sat.

    Matches reference tokenizer_MMODAL_token (mm_utils.py:567-607): each text
    chunk is tokenized independently; a leading BOS on the first chunk is kept
    once and BOS tokens of later chunks are dropped along with the separator
    slot they'd occupy.
    """
    placeholder = f"<{MMODAL_INDEX_TOKEN[multimodal_token_index].lower()}>"
    chunks = [tokenizer(c).input_ids for c in prompt.split(placeholder)]

    input_ids: List[int] = []
    offset = 0
    bos = getattr(tokenizer, "bos_token_id", None)
    if chunks and chunks[0] and bos is not None and chunks[0][0] == bos:
        offset = 1
        input_ids.append(chunks[0][0])

    sep = [multimodal_token_index] * (offset + 1)
    pieces = []
    for i, chunk in enumerate(chunks):
        pieces.append(chunk)
        if i != len(chunks) - 1:
            pieces.append(sep)
    for piece in pieces:
        input_ids.extend(piece[offset:])
    return input_ids


def frame_expansion(frames: Sequence["Image.Image"], n: int) -> "Image.Image":
    """n×n frame paste-up (reference mm_utils.py:184-196 — same grid as
    create_photo_grid with an explicit side length)."""
    return create_photo_grid(frames, n)


def chunk_list(input_list, chunk_size: int):
    """Split a list into consecutive chunk_size pieces (reference
    mm_utils.py:235-236)."""
    return [input_list[i:i + chunk_size]
            for i in range(0, len(input_list), chunk_size)]


def process_video_taug(
    video: Union[str, np.ndarray],
    num_frames: int = NUM_FRAMES,
    grid: int = 2,
    aspect_ratio: str = "pad",
    image_size: int = CLIP_IMAGE_SIZE,
) -> np.ndarray:
    """Temporal-augmentation photo-grid sampling (the reference worker's
    use_taug branch, serve/model_worker.py:196-203): sample
    num_frames*grid² frames linearly across the video, paste each
    consecutive grid² chunk into one grid×grid photo-grid, and preprocess
    the resulting num_frames grid images — grid²× the temporal coverage at
    the same spliced frame count.

    Accepts a video path (decoded like process_video) or raw frames
    (T, H, W, 3); raw inputs are resampled to num_frames*grid² linearly
    when their count differs."""
    n_sample = num_frames * grid * grid
    if isinstance(video, str):
        duration, _ = video_metadata(video)
        ids = list(np.linspace(0, duration - 1, n_sample, dtype=int))
        video_data = read_video_frames(video, ids)
    else:
        video_data = np.asarray(video)
        if video_data.ndim == 3:
            video_data = video_data[None]
    frames = frames_to_pil(video_data)
    if len(frames) != n_sample:
        idx = np.linspace(0, len(frames) - 1, n_sample).astype(int)
        frames = [frames[i] for i in idx]
    grids = [frame_expansion(chunk, grid)
             for chunk in chunk_list(frames, grid * grid)]
    return clip_preprocess(grids, image_size=image_size,
                           pad_square=(aspect_ratio == "pad"))


def load_image_from_base64(data: str) -> "Image.Image":
    """base64 string → PIL image (reference mm_utils.py:199-200; the serve
    worker's image transport format)."""
    import base64
    from io import BytesIO

    return Image.open(BytesIO(base64.b64decode(data)))


def merge_scenes(
    cut_list,
    cut_scores: Sequence[float],
    scene_list,
    num_frames: int,
    max_scene_num: int = 4,
    num_frame_per_scene: int = 8,
) -> List[np.ndarray]:
    """Scene-based frame sampling (reference mm_utils.py:22-68, unused
    upstream but part of the inventory): greedily merge the weakest cuts
    until <= max_scene_num scenes remain, then sample num_frame_per_scene
    evenly spaced frames per scene.  cut_list entries may be ints or
    PySceneDetect-style objects exposing .get_frames()."""
    if len(scene_list) == 0 and len(cut_list) == 0:
        return [np.linspace(0, num_frames - 1, num_frame_per_scene, dtype=int)]

    scene_list, cut_results = merge_scenes_not_exceed_max_scene_num(
        cut_list, cut_scores, scene_list, max_scene_num
    )

    prev = 0
    out: List[np.ndarray] = []
    cur = prev
    for cur, _score in cut_results:
        out.append(np.linspace(prev, cur - 1, num_frame_per_scene, dtype=int))
        prev = cur
    if cur < num_frames:
        out.append(np.linspace(cur, num_frames - 1, num_frame_per_scene, dtype=int))
    return out


def merge_scenes_not_exceed_max_scene_num(
    cut_list, cut_scores: Sequence[float], scene_list, max_scene_num: int
):
    """Drop the lowest-score cut and fuse its two neighbour scenes until at
    most max_scene_num scenes remain (reference mm_utils.py:42-67)."""
    frames = [c.get_frames() if hasattr(c, "get_frames") else c for c in cut_list]
    scores = list(cut_scores)
    scenes = list(scene_list)
    while len(scenes) > max_scene_num:
        i = int(np.argmin(scores))
        frames.pop(i)
        scores.pop(i)
        merged = (scenes[i][0], scenes[i + 1][1])
        scenes = scenes[:i] + [merged] + scenes[i + 2:]
    return scenes, list(zip(frames, scores))


def trim_at_stop_strings(text: str, stop_strings: Sequence[str]) -> str:
    """Cut generated text at the first stop keyword (host-side analogue of
    the reference's KeywordsStoppingCriteria, mm_utils.py:616-647 — we stop
    decode on EOS on-device and trim template separators textually)."""
    for s in stop_strings:
        if s and s in text:
            text = text.split(s)[0]
    return text.strip()


def get_model_name_from_path(model_path: str) -> str:
    parts = model_path.strip("/").split("/")
    if parts[-1].startswith("checkpoint-"):
        return parts[-2] + "_" + parts[-1]
    return parts[-1]
