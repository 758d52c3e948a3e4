"""Shared Pallas helpers."""
from __future__ import annotations

import functools

import jax


@functools.cache
def interpret_mode() -> bool:
    """True when Pallas must run interpreted (CPU backend, e.g. tests and the
    virtual multi-device mesh).  On TPU the kernels compile via Mosaic."""
    return jax.default_backend() == "cpu"
