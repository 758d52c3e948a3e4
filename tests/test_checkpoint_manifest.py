"""Checkpoint key-manifest pin (VERDICT r2 item 3).

The released checkpoints are unreachable here, but their key surface is
fully determined by the reference module tree (HF classes + the meta-arch
submodules).  utils/manifest.py reconstructs that surface on torch's meta
device; the vendored tests/data/*.json files pin it at released 7B dims.
Contract:
  - the vendored 7B manifests match the generator (guards file drift),
  - at tiny dims, convert_streammind_checkpoint CONSUMES every manifest
    key (unique fill values must all appear in the output tree — the
    converter does name-mapping + reshape only, so values survive) and
    PRODUCES every target leaf (tree structure == init_streammind_params).
With naming pinned, the remaining real-weights risk is numerics only
(blocked on weights in this environment).
"""
import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.utils.manifest import (
    clip_vision_manifest,
    full_sft_manifest_7b,
    mistral_lm_manifest,
    mm_projector_bin_manifest_7b,
    projector_manifest,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_vendored_7b_manifests_match_generator():
    with open(os.path.join(DATA, "checkpoint_manifest_full_sft_7b.json")) as f:
        vendored = json.load(f)
    assert vendored == full_sft_manifest_7b()
    with open(os.path.join(DATA, "checkpoint_manifest_mm_projector_7b.json")) as f:
        vendored_p = json.load(f)
    assert vendored_p == mm_projector_bin_manifest_7b()

    # spot-pin released dims (builder.py: Mistral-7B decoder, ViT-L/14-336,
    # d_model 4096 mamba, 7B-width 4-layer gate)
    assert vendored["model.layers.31.mlp.down_proj.weight"] == [4096, 14336]
    assert vendored["model.embed_tokens.weight"] == [32000, 4096]
    assert vendored["model.mm_projector.mamba_model.ssms.0.mixer.dt_proj.weight"] == [8192, 256]
    assert vendored["model.mm_projector.cls_net.cls_model.lm_head.weight"] == [2, 4096]
    assert vendored[
        "model.vision_tower.vision_tower.vision_model.encoder.layers.23.mlp.fc1.weight"
    ] == [4096, 1024]
    assert "model.mm_projector.cls_net.cls_model.model.layers.3.self_attn.q_proj.weight" in vendored
    assert "model.mm_projector.cls_net.cls_model.model.layers.4.self_attn.q_proj.weight" not in vendored


def _tiny_manifest(cfg):
    """The same key surface at tiny dims (layer counts/dims from cfg)."""
    out = {}
    out.update(mistral_lm_manifest(
        hidden_size=cfg.text.hidden_size,
        intermediate_size=cfg.text.intermediate_size,
        num_layers=cfg.text.num_layers,
        num_heads=cfg.text.num_heads,
        num_kv_heads=cfg.text.num_kv_heads,
        vocab_size=cfg.text.vocab_size,
        head_dim=cfg.text.head_dim,
    ))
    proj = projector_manifest(
        mm_hidden_size=cfg.mm_hidden_size,
        hidden_size=cfg.text.hidden_size,
        n_ssm=cfg.mamba.n_layers,
        d_state=cfg.mamba.d_state,
        d_conv=cfg.mamba.d_conv,
        expand=cfg.mamba.expand,
        gate_layers=cfg.gate.num_layers,
        gate_vocab=cfg.gate.vocab_size,
        gate_hidden=cfg.gate.hidden_size,
        gate_intermediate=cfg.gate.intermediate_size,
        gate_heads=cfg.gate.num_heads,
        gate_kv_heads=cfg.gate.num_kv_heads,
    )
    for k, v in proj.items():
        out["model.mm_projector." + k] = v
    vis = clip_vision_manifest(
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.intermediate_size,
        num_layers=cfg.vision.num_layers,
        num_heads=cfg.vision.num_heads,
        image_size=cfg.vision.image_size,
        patch_size=cfg.vision.patch_size,
    )
    for k, v in vis.items():
        out["model.vision_tower.vision_tower." + k] = v
    return out


def test_tiny_and_7b_manifests_share_key_structure():
    """Key NAMES are dimension-independent: tiny manifest keys == 7B keys
    modulo layer indices — so the tiny conversion test below really
    exercises the released naming."""
    def canon(keys, pairs):
        import re

        out = set()
        for k in keys:
            for pat in pairs:
                k = re.sub(pat, r"\1N\2", k)
            out.add(k)
        return out

    pats = [r"(layers\.)\d+(\.)", r"(ssms\.)\d+(\.)"]
    tiny = canon(_tiny_manifest(tiny_streammind_config()), pats)
    big = canon(full_sft_manifest_7b(), pats)
    assert tiny == big


def test_converter_consumes_every_key_and_fills_every_leaf(tmp_path):
    """Round-trip at tiny dims: a fake full-SFT checkpoint with a UNIQUE
    fill value per key must convert into a tree where (a) every fill value
    appears (no key silently dropped), (b) the tree matches
    init_streammind_params structurally (no leaf missing)."""
    import torch

    from streammind_tpu.models.meta import init_streammind_params
    from streammind_tpu.utils.convert import convert_streammind_checkpoint

    cfg = tiny_streammind_config()
    manifest = _tiny_manifest(cfg)
    fills = {}
    sd = {}
    for i, (k, shape) in enumerate(sorted(manifest.items())):
        val = float(i + 1)
        fills[k] = val
        sd[k] = torch.full(shape, val, dtype=torch.float32)
    torch.save(sd, tmp_path / "pytorch_model.bin")

    params = convert_streammind_checkpoint(str(tmp_path), cfg)
    assert set(params) == {"text", "projector", "vision"}

    # (b) structural completeness vs the init tree
    ref = init_streammind_params(jax.random.PRNGKey(0), cfg)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    missing = ref_paths - got_paths
    assert not missing, f"converted tree is missing leaves: {sorted(missing)[:10]}"
    # shape agreement for shared paths
    ref_leaves = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_flatten_with_path(ref)[0]}
    for p, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        ps = jax.tree_util.keystr(p)
        if ps in ref_leaves:
            assert tuple(v.shape) == tuple(ref_leaves[ps]), ps

    # (a) every manifest key's fill value survives into some output leaf
    intentionally_unused = {
        # CLIP's final post_layernorm is never applied: the reference
        # selects hidden layer -2 (clip_encoder.py feature_select
        # mm_vision_select_layer=-2), so those activations are pre-norm
        "model.vision_tower.vision_tower.vision_model.post_layernorm.weight",
        "model.vision_tower.vision_tower.vision_model.post_layernorm.bias",
    }
    leaves = [np.asarray(v) for v in jax.tree_util.tree_leaves(params)]
    unconsumed = [
        k for k, val in fills.items()
        if k not in intentionally_unused
        and not any(np.any(leaf == np.float32(val)) for leaf in leaves)
    ]
    assert not unconsumed, f"converter dropped keys: {unconsumed[:10]}"
