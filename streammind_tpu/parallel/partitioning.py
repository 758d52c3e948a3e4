"""Parameter partitioning rules (t5x-style path-regex → PartitionSpec).

The reference's tensor/sequence-parallel layers
(/root/reference/streammind/model/mamba_ssm/distributed/tensor_parallel.py:
ColumnParallelLinear :111, RowParallelLinear :151, VocabParallelEmbedding
:194) become pure sharding annotations here: GSPMD inserts the all-gathers /
reduce-scatters those classes performed by hand.

Convention: linear weights are (out, in) — column-parallel == shard dim 0 on
tp, row-parallel == shard dim 1 on tp; the other matmul dim shards on fsdp
(ZeRO-3).  Stacked decoder layers carry a leading layer axis (never sharded).
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.params import flatten_with_paths

# (path regex, rank -> PartitionSpec). First match wins.  Paths look like
#   text.layers.q.weight   vision.layers.fc1.weight   projector.mamba.blocks.0.in_proj.weight
RULES: List[Tuple[str, dict]] = [
    # --- decoder (stacked layers: leading L axis) ---
    # w_int8 / w_int4 (quantized loading, --bits) shard exactly like the
    # fp weight they replace (int4's packed in-axis halves but the spec is
    # positional, so the same rule applies); per-channel `scale` (L, out)
    # and group-wise `scale4` (L, out, groups) follow the out-dim shard
    (r"text\.layers\.(q|k|v)\.(weight|w_int8|w_int4)", {3: P(None, "tp", "fsdp")}),
    (r"text\.layers\.(q|k|v)\.scale4", {3: P(None, "tp", None)}),
    (r"text\.layers\.(q|k|v)\.scale", {2: P(None, "tp")}),
    # Qwen2 q/k/v biases: (L, out) — out-dim follows the weight's tp shard
    (r"text\.layers\.(q|k|v)\.bias", {2: P(None, "tp")}),
    (r"text\.layers\.o\.(weight|w_int8|w_int4)", {3: P(None, "fsdp", "tp")}),
    (r"text\.layers\.o\.scale4", {3: P(None, "fsdp", None)}),
    (r"text\.layers\.o\.scale", {2: P(None, "fsdp")}),
    (r"text\.layers\.mlp\.(gate|up)\.(weight|w_int8|w_int4)", {3: P(None, "tp", "fsdp")}),
    (r"text\.layers\.mlp\.(gate|up)\.scale4", {3: P(None, "tp", None)}),
    (r"text\.layers\.mlp\.(gate|up)\.scale", {2: P(None, "tp")}),
    (r"text\.layers\.mlp\.down\.(weight|w_int8|w_int4)", {3: P(None, "fsdp", "tp")}),
    (r"text\.layers\.mlp\.down\.scale4", {3: P(None, "fsdp", None)}),
    (r"text\.layers\.mlp\.down\.scale", {2: P(None, "fsdp")}),
    # LoRA factors: A (L, r, in) rides the in-dim shard, B (L, out, r) the
    # out-dim shard (matmul-time application, train/lora.py::attach_lora)
    (r"lora\.layers\.(q|k|v)\.A", {3: P(None, None, "fsdp")}),
    (r"lora\.layers\.(q|k|v)\.B", {3: P(None, "tp", None)}),
    (r"lora\.layers\.o\.A", {3: P(None, None, "tp")}),
    (r"lora\.layers\.o\.B", {3: P(None, "fsdp", None)}),
    (r"lora\.layers\.mlp\.(gate|up)\.A", {3: P(None, None, "fsdp")}),
    (r"lora\.layers\.mlp\.(gate|up)\.B", {3: P(None, "tp", None)}),
    (r"lora\.layers\.mlp\.down\.A", {3: P(None, None, "tp")}),
    (r"lora\.layers\.mlp\.down\.B", {3: P(None, "fsdp", None)}),
    # MoE experts: (L, E, out, in) — expert axis on tp (expert parallel)
    (r"text\.layers\.experts\.(gate|up)", {4: P(None, "tp", None, "fsdp")}),
    (r"text\.layers\.experts\.down", {4: P(None, "tp", None, "fsdp")}),
    (r"text\.layers\.router\.weight", {3: P(None, None, "fsdp")}),
    (r"text\.layers\..*norm.*", {2: P(None, None)}),
    (r"text\.embed_tokens", {2: P("tp", "fsdp")}),
    (r"text\.lm_head\.weight", {2: P("tp", "fsdp")}),
    (r"text\.final_norm.*", {1: P(None)}),
    # --- gate LM (tiny; shard like the decoder) ---
    (r"projector\.cls_net\.layers\.(q|k|v)\.weight", {3: P(None, "tp", "fsdp")}),
    (r"projector\.cls_net\.layers\.o\.weight", {3: P(None, "fsdp", "tp")}),
    (r"projector\.cls_net\.layers\.mlp\.(gate|up)\.weight", {3: P(None, "tp", "fsdp")}),
    (r"projector\.cls_net\.layers\.mlp\.down\.weight", {3: P(None, "fsdp", "tp")}),
    (r"projector\.cls_net\.embed_tokens", {2: P(None, "fsdp")}),
    (r"projector\.cls_net\.lm_head\.weight", {2: P(None, "fsdp")}),
    # --- Mamba mixer: d_inner is the independent channel axis → tp ---
    (r"projector\.mamba\.blocks\.\d+\.in_proj\.weight", {2: P("tp", "fsdp")}),
    (r"projector\.mamba\.blocks\.\d+\.out_proj\.weight", {2: P("fsdp", "tp")}),
    (r"projector\.mamba\.blocks\.\d+\.x_proj\.weight", {2: P(None, "tp")}),
    (r"projector\.mamba\.blocks\.\d+\.dt_proj\.weight", {2: P("tp", None)}),
    (r"projector\.mamba\.blocks\.\d+\.dt_proj\.bias", {1: P("tp")}),
    (r"projector\.mamba\.blocks\.\d+\.conv1d\.weight", {2: P("tp", None)}),
    (r"projector\.mamba\.blocks\.\d+\.conv1d\.bias", {1: P("tp")}),
    (r"projector\.mamba\.blocks\.\d+\.A_log", {2: P("tp", None)}),
    (r"projector\.mamba\.blocks\.\d+\.D", {1: P("tp")}),
    # --- projector pre/post nets ---
    (r"projector\.(pre_net|post_net)\.weight", {2: P("fsdp", None)}),
    # --- vision tower: small; fsdp-shard the big matrices only ---
    (r"vision\.layers\.(q|k|v|fc1)\.weight", {3: P(None, "tp", "fsdp")}),
    (r"vision\.layers\.(o|fc2)\.weight", {3: P(None, "fsdp", "tp")}),
    (r"vision\.patch_embedding", {2: P("fsdp", None)}),
]


def spec_for(path: str, ndim: int) -> P:
    for pattern, by_rank in RULES:
        if re.match(pattern, path):
            spec = by_rank.get(ndim)
            if spec is not None:
                return spec
    return P()  # replicate


def _set_by_path(tree, path: str, value):
    keys = path.split(".")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def param_specs(params) -> dict:
    """Mirror tree of PartitionSpecs for a param tree (dicts + lists)."""

    def build(tree, prefix):
        if isinstance(tree, dict):
            return {k: build(v, prefix + k + ".") for k, v in tree.items()}
        if isinstance(tree, list):
            return [build(v, prefix + str(i) + ".") for i, v in enumerate(tree)]
        return spec_for(prefix.rstrip("."), tree.ndim)

    return build(params, "")


def param_shardings(params, mesh: Mesh) -> dict:
    specs = param_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh according to the rules."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, sh)
