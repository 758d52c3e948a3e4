"""Multi-host runtime wrapper.

Replaces the reference's three NCCL layers (streammind/dist.py:20-207,
misc.py init_distributed_mode, mamba_ssm distributed_utils) with one
jax.distributed entry point plus host-level collectives for eval metric
aggregation.  In-model collectives come from GSPMD sharding, never from
here.
"""
from __future__ import annotations

import functools
import os
from typing import Any, List, Optional, Sequence

import jax
import numpy as np

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.  No-op on single process (the reference's
    CPU/non-distributed fallback, dist.py:20-28)."""
    global _initialized
    if _initialized:
        return
    n = num_processes if num_processes is not None else int(os.environ.get("WORLD_SIZE", 1))
    if n <= 1:
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def size() -> int:
    return jax.process_count()


def rank() -> int:
    return jax.process_index()


def is_master() -> bool:
    return rank() == 0


def local_device_count() -> int:
    return jax.local_device_count()


def master_only(fn):
    """Run only on process 0 (reference dist.py:171-181)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_master():
            return fn(*args, **kwargs)
        return None

    return wrapper


def barrier():
    """Cross-process sync point."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("streammind_barrier")


def allgather_object(obj: Any) -> List[Any]:
    """Gather arbitrary python objects from all processes (the reference's
    allgather_diff_shape for metric lists, dist.py:120-145)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))


def allreduce_mean(value: float) -> float:
    """Scalar metric mean over processes (dist_fmt_vals, dist.py:147-157)."""
    vals = allgather_object(float(value))
    return float(np.mean(vals))


def shard_worklist(items: Sequence, num_chunks: Optional[int] = None,
                   chunk_idx: Optional[int] = None) -> List:
    """Rank-sliced work splitting for eval — same semantics as the
    --num-chunks/--chunk-idx CLIs (eval/inference_video_mcqa_videomme.py:26-34)
    with process rank as the default chunk."""
    from ..eval.mcqa import get_chunk

    n = num_chunks if num_chunks is not None else size()
    k = chunk_idx if chunk_idx is not None else rank()
    return get_chunk(items, n, k)
