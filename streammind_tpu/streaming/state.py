"""Per-stream carried state for the perception/cognition split."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import StreamMindConfig
from ..models.mamba import MambaState, init_mamba_state
from ..models.mistral import KVCache, init_kv_cache


class StreamState(NamedTuple):
    """Everything a live stream carries between frames.

    The reference recomputes the whole Mamba scan over all cached frame
    features each frame (videollama2_arch.py:173-205 keeps a growing
    frame_feature tensor); here the scan state is carried, the memory ring
    buffer holds *projected* memory tokens, and per-frame cost is O(1).

    mamba:      carried SSM/conv state
    memory:     (1, capacity, hidden) ring of memory tokens
    frame_idx:  int32 — frames seen (== next write slot while < capacity)
    last_fire:  int32 — frame index of the last gate fire (span start)
    """

    mamba: MambaState
    memory: jax.Array
    frame_idx: jax.Array
    last_fire: jax.Array


def init_stream_state(cfg: StreamMindConfig, dtype=jnp.float32) -> StreamState:
    return StreamState(
        mamba=init_mamba_state(cfg.mamba, batch=1),
        memory=jnp.zeros((1, cfg.max_stream_frames, cfg.text.hidden_size), dtype),
        frame_idx=jnp.zeros((), jnp.int32),
        last_fire=jnp.zeros((), jnp.int32),
    )


def init_multistream_state(
    cfg: StreamMindConfig, n_streams: int, dtype=jnp.float32
) -> StreamState:
    """Batched state for S concurrent streams (engine.perceive_step_batch):
    per-stream memory rings, frame counters and fire marks."""
    return StreamState(
        mamba=init_mamba_state(cfg.mamba, batch=n_streams),
        memory=jnp.zeros(
            (n_streams, cfg.max_stream_frames, cfg.text.hidden_size), dtype
        ),
        frame_idx=jnp.zeros((n_streams,), jnp.int32),
        last_fire=jnp.zeros((n_streams,), jnp.int32),
    )
