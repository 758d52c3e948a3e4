"""ctypes binding for the native video-ingest library (native/ingest.cpp).

The hot serving path decodes + letterboxes + CLIP-normalizes frames in one
C++ pass (libavformat/avcodec/swscale), replacing decord + PIL
(reference mm_utils.py:377-460).  Auto-builds the .so on first use when the
toolchain is present; callers fall back to the Python path otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsm_ingest.so")
_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:  # remember failures: don't re-spawn make per call
        return None
    src = os.path.join(_NATIVE_DIR, "ingest.cpp")
    stale = (
        not os.path.exists(_LIB_PATH)
        or (os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    )
    if stale:  # build on first use AND when the source is newer than the .so
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-B"], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:  # noqa: BLE001
            if not os.path.exists(_LIB_PATH):
                _load_failed = True
                return None  # no library at all; a stale one still loads
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.sm_open.restype = ctypes.c_void_p
    lib.sm_open.argtypes = [ctypes.c_char_p]
    lib.sm_info.restype = ctypes.c_int
    lib.sm_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sm_close.argtypes = [ctypes.c_void_p]
    lib.sm_read_frames.restype = ctypes.c_int
    lib.sm_read_frames.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sm_write_test_video.restype = ctypes.c_int
    lib.sm_write_test_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeVideoReader:
    """One open container; sequential or sparse indexed reads, each returning
    model-ready (N, 3, size, size) float32 CLIP pixel values."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ingest library unavailable")
        self._lib = lib
        self._h = lib.sm_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open video: {path}")
        fps = ctypes.c_double()
        nframes = ctypes.c_longlong()
        w = ctypes.c_int()
        h = ctypes.c_int()
        lib.sm_info(self._h, ctypes.byref(fps), ctypes.byref(nframes),
                    ctypes.byref(w), ctypes.byref(h))
        self.fps = float(fps.value)
        self.num_frames = int(nframes.value)
        self.width, self.height = int(w.value), int(h.value)

    def read(self, indices: Sequence[int], size: int = 336,
             pad_square: bool = True, strict: bool = True) -> np.ndarray:
        """Decode the requested frames, returned in the REQUESTED order
        (the decoder visits them ascending internally).  strict=True raises
        when the container yields fewer frames than asked (corrupt tail)
        instead of silently returning a short batch."""
        req = [int(i) for i in indices]
        order = np.argsort(req, kind="stable")
        idx = np.asarray([req[i] for i in order], np.int64)
        out = np.empty((len(idx), 3, size, size), np.float32)
        n = self._lib.sm_read_frames(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            len(idx), size, int(pad_square),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if n < 0:
            raise IOError("native frame read failed")
        if n < len(idx):
            if strict:
                raise IOError(
                    f"short read: requested {len(idx)} frames, decoded {n} "
                    f"(frame count metadata may overestimate; pass strict=False "
                    f"to accept)"
                )
            out = out[:n]
            order = order[:n]
        # undo the ascending decode sort → original request order.  On a
        # short read the surviving rows keep their relative REQUESTED
        # order (argsort of the truncated order); the previous
        # scatter-based unsort indexed past the truncated array for
        # non-ascending requests (IndexError) and silently returned
        # decode order otherwise.
        return out[np.argsort(order, kind="stable")]

    def close(self):
        if self._h:
            self._lib.sm_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass


def write_test_video(path: str, w: int = 224, h: int = 160,
                     n_frames: int = 30, fps: int = 10) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable")
    rc = lib.sm_write_test_video(path.encode(), w, h, n_frames, fps)
    if rc != 0:
        raise IOError(f"test video write failed: {rc}")


def native_process_video(
    video_path: str,
    num_frames: int = 8,
    sample_scheme: str = "uniform",
    size: int = 336,
    pad_square: bool = True,
) -> np.ndarray:
    """Drop-in replacement for mm_utils.process_video on the native path."""
    from .mm_utils import frame_sample

    with NativeVideoReader(video_path) as vr:
        ids = frame_sample(vr.num_frames, sample_scheme, num_frames, vr.fps)
        out = vr.read(ids, size=size, pad_square=pad_square, strict=False)
        if 0 < len(out) < len(ids):
            # container frame-count metadata overestimated (common for mkv):
            # repeat the last decoded frame to keep the (num_frames, …) contract
            pad = np.repeat(out[-1:], len(ids) - len(out), axis=0)
            out = np.concatenate([out, pad], axis=0)
        return out
