"""Device mesh construction.

Replaces the reference's three NCCL wrappers (dist.py, DeepSpeed engine,
mamba_ssm distributed_utils.py — SURVEY.md §2.4) with a single
jax.sharding.Mesh; collectives are inserted by GSPMD from sharding
annotations and ride ICI within a slice, DCN across slices.

Axes:
  dp    — data parallel (across slices / DCN)
  fsdp  — fully-sharded data parallel (ZeRO-3 equivalent; ICI)
  tp    — tensor parallel (Megatron-style; ICI)
Expert parallel reuses `tp` as the expert axis for Mixtral (one axis keeps
the mesh 3D; experts and attention heads shard the same way).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "tp")


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * fsdp * tp
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A sensible default layout for n devices: all-FSDP within one slice.

    FSDP is the right default for a 7B on v5e (ZeRO-3 parity with the
    reference's DeepSpeed configs); switch to tp for latency-bound serving.
    """
    n = n_devices or len(jax.devices())
    return make_mesh(1, n, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
