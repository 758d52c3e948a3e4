"""Tensor-parallel SERVING: sharding specs for inference-side state.

The reference treats tensor-parallel inference as first-class — its
ColumnParallelLinear / RowParallelLinear / VocabParallelEmbedding layers
(/root/reference/streammind/model/mamba_ssm/distributed/tensor_parallel.py:111-241)
hand-insert all-gathers and reduce-scatters inside every decode step.  The
TPU-native equivalent is pure data placement: parameters are sharded by the
partitioning rules (partitioning.py), and the inference-side STATE — KV
cache, Mamba conv/ssm carries, memory ring — is placed with the specs below.
GSPMD then inserts the ICI collectives inside the already-jitted engine
programs (perceive / prefill / while-loop decode); no engine code changes.

Layout:
  KV cache k/v (L, B, capacity, n_kv_heads, head_dim)
      → kv-head axis on tp (each shard attends with its own heads; the
        o-projection's row-parallel weight reduces across tp), batch axis
        on dp when the caller serves a dp-sharded row batch.
  Mamba conv (L, B, d_inner, k) / ssm (L, B, d_inner, d_state)
      → d_inner on tp (matches in_proj/out_proj column/row split).
  memory ring (S, capacity, hidden)
      → replicated by default; stream axis on dp for batched perception.

This is exactly how a bf16-7B (14.5 GB) model serves on 16 GB v5e chips:
weights and KV split across tp while the host-side session logic is
unchanged.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.mistral import KVCache
from ..streaming.state import StreamState


def kv_cache_specs(batch_axis: Optional[str] = None) -> KVCache:
    """PartitionSpecs for a KVCache: kv heads on tp, batch on `batch_axis`."""
    return KVCache(
        k=P(None, batch_axis, None, "tp", None),
        v=P(None, batch_axis, None, "tp", None),
        length=P(batch_axis),
    )


def kv_cache_shardings(mesh: Mesh, batch_axis: Optional[str] = None) -> KVCache:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), kv_cache_specs(batch_axis),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_kv_cache(cache: KVCache, mesh: Mesh,
                   batch_axis: Optional[str] = None) -> KVCache:
    """Place an existing cache onto the mesh (no-op math, pure layout)."""
    return jax.tree.map(jax.device_put, cache, kv_cache_shardings(mesh, batch_axis))


def stream_state_specs(stream_axis: Optional[str] = None) -> "StreamState":
    """PartitionSpecs for StreamState: Mamba d_inner on tp, streams on
    `stream_axis` (dp for batched multi-stream perception)."""
    from ..models.mamba import MambaState

    return StreamState(
        mamba=MambaState(
            conv=P(None, stream_axis, "tp", None),
            ssm=P(None, stream_axis, "tp", None),
        ),
        memory=P(stream_axis, None, None),
        frame_idx=P() if stream_axis is None else P(stream_axis),
        last_fire=P() if stream_axis is None else P(stream_axis),
    )


def stream_state_shardings(mesh: Mesh, stream_axis: Optional[str] = None):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), stream_state_specs(stream_axis),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_stream_state(state: StreamState, mesh: Mesh,
                       stream_axis: Optional[str] = None) -> StreamState:
    return jax.tree.map(
        jax.device_put, state, stream_state_shardings(mesh, stream_axis)
    )


def mesh_fits_inference(mesh: Mesh, cfg) -> bool:
    """True when tp divides the kv-head and Mamba d_inner axes (the two
    state axes the specs above split).  GSPMD would pad a misfit, but a
    padded kv-head shard wastes ICI and VMEM — callers should drop to a
    smaller tp instead."""
    tp = dict(mesh.shape).get("tp", 1)
    d_inner = cfg.mamba.d_model * cfg.mamba.expand
    return cfg.text.num_kv_heads % tp == 0 and d_inner % tp == 0
