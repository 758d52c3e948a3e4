"""Checkpoint save/load + auto-resume.

Covers the reference's checkpoint behaviors (SURVEY.md §5):
  - periodic `checkpoint-{step}` dirs with auto-resume from the latest
    (train_new_stream.py:1035-1037)
  - adapter-only checkpoints: just the projector ("mm_projector"), the
    reference's stage-1/tune_mm_mlp_adapter artifact
    (videollama2_trainer_score.py:420-443)
  - torch-interop: export/import the projector in the reference's
    mm_projector.bin key naming so checkpoints interchange both ways.

Storage format: one .npz per tree + a JSON manifest (portable, no orbax
version pinning; arrays restore to jnp with original dtypes).
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray], list_paths, dtypes=None) -> Any:
    root: Dict = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = (path, value)
    def fix(node, path=""):
        if isinstance(node, dict):
            if path in list_paths:
                return [fix(node[str(i)], f"{path}/{i}") for i in range(len(node))]
            return {k: fix(v, f"{path}/{k}" if path else k) for k, v in node.items()}
        leaf_path, value = node
        arr = jnp.asarray(value)
        if dtypes and leaf_path in dtypes:
            arr = arr.astype(dtypes[leaf_path])
        return arr
    return fix(root)


def _list_paths(tree, prefix="") -> list:
    paths = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            paths.extend(_list_paths(v, f"{prefix}/{k}" if prefix else k))
    elif isinstance(tree, (list, tuple)):
        paths.append(prefix)
        for i, v in enumerate(tree):
            paths.extend(_list_paths(v, f"{prefix}/{i}"))
    return paths


def _np_storable(v: np.ndarray):
    """np.savez silently stores bfloat16 as opaque void bytes that can never
    be read back; upcast to fp32 on disk and record the true dtype."""
    if str(v.dtype) == "bfloat16":
        return np.asarray(v, np.float32), "bfloat16"
    return v, str(v.dtype)


def save_tree(path: str, tree, name: str = "params") -> None:
    os.makedirs(path, exist_ok=True)
    flat = _flatten(tree)
    stored = {}
    dtypes = {}
    for k, v in flat.items():
        arr, true_dtype = _np_storable(v)
        stored[k] = arr
        dtypes[k] = true_dtype
    np.savez(os.path.join(path, f"{name}.npz"), **stored)
    manifest = {
        "name": name,
        "list_paths": _list_paths(tree),
        "leaves": {k: [list(v.shape), dtypes[k]] for k, v in flat.items()},
    }
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        json.dump(manifest, f)


def load_tree(path: str, name: str = "params"):
    with open(os.path.join(path, f"{name}.json")) as f:
        manifest = json.load(f)
    data = np.load(os.path.join(path, f"{name}.npz"))
    flat = {k: data[k] for k in data.files}
    dtypes = {k: spec[1] for k, spec in manifest["leaves"].items()}
    return _unflatten(flat, set(manifest["list_paths"]), dtypes)


def save_checkpoint(
    ckpt_root: str,
    step: int,
    params,
    opt_state=None,
    adapter_only: bool = False,
    keep: int = 3,
    extra: Optional[Dict] = None,
) -> str:
    """Write checkpoint-{step}; optionally only the projector subtree."""
    path = os.path.join(ckpt_root, f"checkpoint-{step}")
    os.makedirs(path, exist_ok=True)
    if adapter_only:
        save_tree(path, {"projector": params["projector"]}, "params")
    else:
        save_tree(path, params, "params")
    if opt_state is not None:
        save_tree(path, jax.tree.map(np.asarray, opt_state), "opt_state")
    meta = {"step": step, "adapter_only": adapter_only}
    if extra:
        meta.update(extra)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    _rotate(ckpt_root, keep)
    return path


def _rotate(ckpt_root: str, keep: int):
    ckpts = sorted_checkpoints(ckpt_root)
    for old in ckpts[:-keep]:
        shutil.rmtree(os.path.join(ckpt_root, f"checkpoint-{old}"), ignore_errors=True)


def sorted_checkpoints(ckpt_root: str) -> list:
    if not os.path.isdir(ckpt_root):
        return []
    steps = []
    for d in os.listdir(ckpt_root):
        m = re.match(r"checkpoint-(\d+)$", d)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(ckpt_root: str) -> Optional[str]:
    steps = sorted_checkpoints(ckpt_root)
    return os.path.join(ckpt_root, f"checkpoint-{steps[-1]}") if steps else None


def load_checkpoint(path: str) -> Tuple[Any, Optional[Any], Dict]:
    params = load_tree(path, "params")
    opt_state = None
    # legacy manifest-based opt_state trees only; optax states use
    # save_opt_state/load_opt_state (flat-leaf format, no manifest)
    if os.path.exists(os.path.join(path, "opt_state.json")):
        opt_state = load_tree(path, "opt_state")
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return params, opt_state, meta


# ---------------------------------------------------------------------------
# Orbax backend (optional): multi-host/sharded checkpoints for large runs.
# The npz store above is the default (single-host, dependency-light);
# save_tree_orbax/load_tree_orbax are standalone helpers for distributed
# saves where every host writes its own param shards.
# ---------------------------------------------------------------------------
def save_tree_orbax(path: str, tree, name: str = "params") -> None:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(os.path.abspath(path), name + "_orbax"), tree)


def load_tree_orbax(path: str, name: str = "params", template=None,
                    shardings=None):
    """Restore an orbax tree.

    shardings: optional pytree of jax.sharding.Sharding (same structure as
    the saved tree, or a prefix thereof via param_specs+NamedSharding).
    When given, each leaf is restored DIRECTLY into its target sharding —
    every host reads only its own shards, so a 7B+ tree never has to fit in
    one host's RAM (the multi-host path the npz store can't serve).
    """
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        target = os.path.join(os.path.abspath(path), name + "_orbax")
        if shardings is not None:
            restore_args = jax.tree_util.tree_map(
                lambda s: ocp.ArrayRestoreArgs(sharding=s), shardings
            )
            return ckptr.restore(
                target,
                args=ocp.args.PyTreeRestore(
                    item=template,
                    restore_args=restore_args,
                ),
            )
        if template is not None:
            return ckptr.restore(target, item=template)
        return ckptr.restore(target)


# ---------------------------------------------------------------------------
# optimizer state (optax pytrees: NamedTuples with exotic nodes) — stored as
# a flat leaf list; restored into a freshly init'd state's treedef.
# ---------------------------------------------------------------------------
def save_opt_state(path: str, opt_state) -> None:
    leaves = [np.asarray(v) for v in jax.tree_util.tree_leaves(opt_state)]
    stored, dtypes = {}, []
    for i, v in enumerate(leaves):
        arr, true_dtype = _np_storable(v)
        stored[f"l{i}"] = arr
        dtypes.append(true_dtype)
    np.savez(os.path.join(path, "opt_state.npz"), **stored)
    with open(os.path.join(path, "opt_state_dtypes.json"), "w") as f:
        json.dump(dtypes, f)


def load_opt_state(path: str, template_opt_state):
    """Restore into the structure of a freshly-initialized optimizer state."""
    f = os.path.join(path, "opt_state.npz")
    if not os.path.exists(f):
        return None
    data = np.load(f)
    dtypes = None
    dpath = os.path.join(path, "opt_state_dtypes.json")
    if os.path.exists(dpath):
        with open(dpath) as g:
            dtypes = json.load(g)
    leaves = []
    for i in range(len(data.files)):
        arr = jnp.asarray(data[f"l{i}"])
        if dtypes:
            arr = arr.astype(dtypes[i])
        leaves.append(arr)
    treedef = jax.tree_util.tree_structure(template_opt_state)
    if treedef.num_leaves != len(leaves):
        return None  # optimizer config changed; start fresh
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# torch interop: mm_projector.bin
# ---------------------------------------------------------------------------
def export_projector_torch_sd(projector_params) -> Dict[str, "np.ndarray"]:
    """Our projector tree → the reference's Video_Mamba_seq state-dict keys
    (inverse of utils.convert.convert_projector)."""
    p = projector_params
    sd: Dict[str, np.ndarray] = {
        "pre_net.fc3.weight": np.asarray(p["pre_net"]["weight"]),
        "pre_net.fc3.bias": np.asarray(p["pre_net"]["bias"]),
        "post_net.fc3.weight": np.asarray(p["post_net"]["weight"]),
        "post_net.fc3.bias": np.asarray(p["post_net"]["bias"]),
        "mamba_model.norm_fn.weight": np.asarray(p["mamba"]["final_norm"]["weight"]),
        "mamba_model.norm_fn.bias": np.asarray(p["mamba"]["final_norm"]["bias"]),
    }
    for i, b in enumerate(p["mamba"]["blocks"]):
        mx = f"mamba_model.ssms.{i}.mixer."
        sd[f"mamba_model.ssms.{i}.norm.weight"] = np.asarray(b["norm"]["weight"])
        sd[f"mamba_model.ssms.{i}.norm.bias"] = np.asarray(b["norm"]["bias"])
        sd[mx + "in_proj.weight"] = np.asarray(b["in_proj"]["weight"])
        sd[mx + "conv1d.weight"] = np.asarray(b["conv1d"]["weight"])[:, None, :]
        if "bias" in b["conv1d"]:
            sd[mx + "conv1d.bias"] = np.asarray(b["conv1d"]["bias"])
        sd[mx + "x_proj.weight"] = np.asarray(b["x_proj"]["weight"])
        sd[mx + "dt_proj.weight"] = np.asarray(b["dt_proj"]["weight"])
        sd[mx + "dt_proj.bias"] = np.asarray(b["dt_proj"]["bias"])
        sd[mx + "A_log"] = np.asarray(b["A_log"])
        sd[mx + "D"] = np.asarray(b["D"])
        sd[mx + "out_proj.weight"] = np.asarray(b["out_proj"]["weight"])
    if "cls_net" in p:
        g = p["cls_net"]
        sd["cls_net.cls_model.model.embed_tokens.weight"] = np.asarray(g["embed_tokens"])
        sd["cls_net.cls_model.model.norm.weight"] = np.asarray(g["final_norm"]["weight"])
        if "lm_head" in g:
            sd["cls_net.cls_model.lm_head.weight"] = np.asarray(g["lm_head"]["weight"])
        L = g["layers"]["q"]["weight"].shape[0]
        name_map = {
            "q": "self_attn.q_proj", "k": "self_attn.k_proj",
            "v": "self_attn.v_proj", "o": "self_attn.o_proj",
        }
        for i in range(L):
            base = f"cls_net.cls_model.model.layers.{i}."
            for ours, theirs in name_map.items():
                sd[base + theirs + ".weight"] = np.asarray(g["layers"][ours]["weight"][i])
            sd[base + "input_layernorm.weight"] = np.asarray(g["layers"]["input_norm"]["weight"][i])
            sd[base + "post_attention_layernorm.weight"] = np.asarray(g["layers"]["post_norm"]["weight"][i])
            sd[base + "mlp.gate_proj.weight"] = np.asarray(g["layers"]["mlp"]["gate"]["weight"][i])
            sd[base + "mlp.up_proj.weight"] = np.asarray(g["layers"]["mlp"]["up"]["weight"][i])
            sd[base + "mlp.down_proj.weight"] = np.asarray(g["layers"]["mlp"]["down"]["weight"][i])
    return sd


def save_mm_projector_bin(projector_params, out_path: str) -> None:
    import torch

    sd = {k: torch.tensor(v) for k, v in export_projector_torch_sd(projector_params).items()}
    torch.save(sd, out_path)
