"""Checkpoint conversion: HF/torch state dicts → streammind-tpu param trees.

Covers the reference's checkpoint zoo (model/builder.py:30-210):
  - full SFT checkpoints (decoder + vision tower + mm_projector in one)
  - base model + mm_projector.bin adapter (builder.py:110-142)
  - LoRA: lora_A/B pairs merged into base weights + non_lora_trainables.bin
    (builder.py:60-109)

State dicts may come from torch .bin (torch.load) or .safetensors.  All
conversion is name-mapping + reshape; no numerics change, so fp32 parity
tests against transformers' own forward validate the model math.
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..config import MambaConfig, StreamMindConfig, TextConfig, VisionConfig


def _np(t):
    """torch tensor / numpy → numpy fp32 (bf16 safe)."""
    if hasattr(t, "detach"):
        t = t.detach()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        t = t.cpu().numpy()
    return np.asarray(t)


def load_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    """Load one or many checkpoint shards (bin/safetensors) into numpy."""
    sd = {}
    files = []
    # non-weight artifacts the HF Trainer writes next to the shards —
    # training_args.bin in particular is a pickled TrainingArguments that
    # torch.load(weights_only=True) refuses (and would corrupt the dict
    # otherwise)
    skip_prefixes = ("training_args", "optimizer", "scheduler",
                     "rng_state", "trainer_state", "scaler")
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if (f.endswith((".bin", ".safetensors"))
                    and not f.startswith(skip_prefixes)):
                files.append(os.path.join(path, f))
    else:
        files = [path]
    for f in files:
        if f.endswith(".safetensors"):
            from safetensors import safe_open

            with safe_open(f, framework="np") as g:
                for k in g.keys():
                    sd[k] = g.get_tensor(k)
        else:
            import torch

            raw = torch.load(f, map_location="cpu", weights_only=True)
            sd.update({k: _np(v) for k, v in raw.items()})
    return sd


def _strip(sd: Dict, prefix: str) -> Dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# CLIP vision tower (HF CLIPVisionModel naming)
# ---------------------------------------------------------------------------
def convert_clip_vision(sd: Dict, cfg: VisionConfig, dtype=jnp.float32) -> Dict:
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    g = lambda k: jnp.asarray(sd[pre + k], dtype)

    layers = {
        "ln1": {"weight": [], "bias": []},
        "q": {"weight": [], "bias": []},
        "k": {"weight": [], "bias": []},
        "v": {"weight": [], "bias": []},
        "o": {"weight": [], "bias": []},
        "ln2": {"weight": [], "bias": []},
        "fc1": {"weight": [], "bias": []},
        "fc2": {"weight": [], "bias": []},
    }
    name_map = {
        "ln1": "layer_norm1",
        "q": "self_attn.q_proj",
        "k": "self_attn.k_proj",
        "v": "self_attn.v_proj",
        "o": "self_attn.out_proj",
        "ln2": "layer_norm2",
        "fc1": "mlp.fc1",
        "fc2": "mlp.fc2",
    }
    for i in range(cfg.num_layers):
        for ours, theirs in name_map.items():
            base = f"encoder.layers.{i}.{theirs}"
            layers[ours]["weight"].append(g(base + ".weight"))
            layers[ours]["bias"].append(g(base + ".bias"))
    stacked = {
        ours: {k: jnp.stack(v) for k, v in d.items()} for ours, d in layers.items()
    }
    patch = g("embeddings.patch_embedding.weight")  # (D, 3, P, P)
    return {
        "class_embedding": g("embeddings.class_embedding"),
        "patch_embedding": patch.reshape(patch.shape[0], -1),
        "position_embedding": g("embeddings.position_embedding.weight"),
        "pre_layernorm": {
            "weight": g("pre_layrnorm.weight"),
            "bias": g("pre_layrnorm.bias"),
        },
        "layers": stacked,
    }


# ---------------------------------------------------------------------------
# Mistral / Llama / Mixtral decoder (HF naming)
# ---------------------------------------------------------------------------
def convert_hf_text(sd: Dict, cfg: TextConfig, dtype=jnp.float32) -> Dict:
    pre = "model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    g = lambda k: jnp.asarray(sd[k], dtype)

    def stack(fmt):
        return jnp.stack([g(fmt.format(i=i)) for i in range(cfg.num_layers)])

    layers = {
        "input_norm": {"weight": stack(pre + "layers.{i}.input_layernorm.weight")},
        "q": {"weight": stack(pre + "layers.{i}.self_attn.q_proj.weight")},
        "k": {"weight": stack(pre + "layers.{i}.self_attn.k_proj.weight")},
        "v": {"weight": stack(pre + "layers.{i}.self_attn.v_proj.weight")},
        "o": {"weight": stack(pre + "layers.{i}.self_attn.o_proj.weight")},
        "post_norm": {
            "weight": stack(pre + "layers.{i}.post_attention_layernorm.weight")
        },
    }
    if cfg.qkv_bias:  # Qwen2 biases live on q/k/v only
        for name in ("q", "k", "v"):
            layers[name]["bias"] = stack(
                pre + "layers.{i}.self_attn." + name + "_proj.bias"
            )
    if cfg.num_experts > 1:
        layers["router"] = {
            "weight": stack(pre + "layers.{i}.block_sparse_moe.gate.weight")
        }
        def estack(which):
            return jnp.stack(
                [
                    jnp.stack(
                        [
                            g(
                                pre
                                + f"layers.{i}.block_sparse_moe.experts.{e}.w{which}.weight"
                            )
                            for e in range(cfg.num_experts)
                        ]
                    )
                    for i in range(cfg.num_layers)
                ]
            )
        # Mixtral: w1=gate, w3=up, w2=down
        layers["experts"] = {
            "gate": estack(1),
            "up": estack(3),
            "down": estack(2),
        }
    else:
        layers["mlp"] = {
            "gate": {"weight": stack(pre + "layers.{i}.mlp.gate_proj.weight")},
            "up": {"weight": stack(pre + "layers.{i}.mlp.up_proj.weight")},
            "down": {"weight": stack(pre + "layers.{i}.mlp.down_proj.weight")},
        }

    out = {
        "embed_tokens": g(pre + "embed_tokens.weight"),
        "layers": layers,
        "final_norm": {"weight": g(pre + "norm.weight")},
    }
    if not cfg.tie_word_embeddings:
        out["lm_head"] = {"weight": g("lm_head.weight")}
    return out


# ---------------------------------------------------------------------------
# STC/STP connector (timm RegStage naming, reference builder.py:574-760)
# ---------------------------------------------------------------------------
def convert_stc_connector(sd: Dict, depth: int = 4, mlp_depth: int = 2,
                          variant: str = "stc", dtype=jnp.float32) -> Dict:
    """timm-style STCConnector state dict → our connectors tree.

    The reference builds RegStage(norm_layer=LayerNorm2d, act_layer=SiLU)
    (builder.py:593-601), so timm's 'bn' keys hold LayerNorm2d affines here.
    Keys: s{1,2}.b{n}.{conv1,conv2,conv3}.{conv.weight,bn.weight,bn.bias},
    .se.fc{1,2}.{weight,bias}, .downsample.{conv.weight,bn.*} (first block of
    s1 when widths differ), sampler.0.{weight,bias} (stc variants),
    readout.{0,2,...}.{weight,bias}.  cls_net.* keys (the reference embeds
    its gate in the connector) are ignored — the gate is a separate
    component in this framework."""
    g = lambda k: jnp.asarray(sd[k], dtype)

    def block(prefix):
        p = {
            "conv1": g(prefix + ".conv1.conv.weight"),
            "ln1": {"weight": g(prefix + ".conv1.bn.weight"),
                    "bias": g(prefix + ".conv1.bn.bias")},
            "conv2": g(prefix + ".conv2.conv.weight"),
            "ln2": {"weight": g(prefix + ".conv2.bn.weight"),
                    "bias": g(prefix + ".conv2.bn.bias")},
            "se_fc1": g(prefix + ".se.fc1.weight"),
            "se_fc1_bias": g(prefix + ".se.fc1.bias"),
            "se_fc2": g(prefix + ".se.fc2.weight"),
            "se_fc2_bias": g(prefix + ".se.fc2.bias"),
            "conv3": g(prefix + ".conv3.conv.weight"),
            "ln3": {"weight": g(prefix + ".conv3.bn.weight"),
                    "bias": g(prefix + ".conv3.bn.bias")},
        }
        if prefix + ".downsample.conv.weight" in sd:
            p["proj"] = g(prefix + ".downsample.conv.weight")
            p["proj_ln"] = {"weight": g(prefix + ".downsample.bn.weight"),
                            "bias": g(prefix + ".downsample.bn.bias")}
        return p

    out = {
        "s1": [block(f"s1.b{i + 1}") for i in range(depth)],
        "s2": [block(f"s2.b{i + 1}") for i in range(depth)],
        "readout": [
            {"weight": g(f"readout.{2 * i}.weight"),
             "bias": g(f"readout.{2 * i}.bias")}
            for i in range(mlp_depth)
        ],
    }
    if variant in ("stc", "stc_v35"):
        out["sampler"] = {"weight": g("sampler.0.weight"),
                          "bias": g("sampler.0.bias")}
    return out


# ---------------------------------------------------------------------------
# mm_projector (Video_Mamba_seq torch module naming)
# ---------------------------------------------------------------------------
def convert_projector(sd: Dict, cfg: StreamMindConfig, dtype=jnp.float32) -> Dict:
    """Keys per the reference module tree (builder.py:390-401):
      pre_net.fc3.{weight,bias}
      mamba_model.ssms.{i}.norm.{weight,bias}
      mamba_model.ssms.{i}.mixer.{in_proj,conv1d,x_proj,dt_proj,out_proj,A_log,D}
      mamba_model.norm_fn.{weight,bias}
      post_net.fc3.{weight,bias}
      cls_net.cls_model.(model.*|lm_head.*)  — HF Mistral naming
    """
    for candidate in ("model.mm_projector.", "mm_projector.", ""):
        if any(k.startswith(candidate + "pre_net") for k in sd):
            sd = _strip(sd, candidate) if candidate else sd
            break
    g = lambda k: jnp.asarray(sd[k], dtype)

    blocks = []
    for i in range(cfg.mamba.n_layers):
        mx = f"mamba_model.ssms.{i}.mixer."
        block = {
            "norm": {
                "weight": g(f"mamba_model.ssms.{i}.norm.weight"),
                "bias": g(f"mamba_model.ssms.{i}.norm.bias"),
            },
            "in_proj": {"weight": g(mx + "in_proj.weight")},
            "conv1d": {
                "weight": jnp.squeeze(g(mx + "conv1d.weight"), 1),  # (D,1,W)→(D,W)
            },
            "x_proj": {"weight": g(mx + "x_proj.weight")},
            "dt_proj": {
                "weight": g(mx + "dt_proj.weight"),
                "bias": g(mx + "dt_proj.bias"),
            },
            "A_log": jnp.asarray(sd[mx + "A_log"], jnp.float32),
            "D": jnp.asarray(sd[mx + "D"], jnp.float32),
            "out_proj": {"weight": g(mx + "out_proj.weight")},
        }
        if mx + "conv1d.bias" in sd:
            block["conv1d"]["bias"] = g(mx + "conv1d.bias")
        if mx + "in_proj.bias" in sd:
            block["in_proj"]["bias"] = g(mx + "in_proj.bias")
        if mx + "out_proj.bias" in sd:
            block["out_proj"]["bias"] = g(mx + "out_proj.bias")
        blocks.append(block)

    out = {
        "pre_net": {
            "weight": g("pre_net.fc3.weight"),
            "bias": g("pre_net.fc3.bias"),
        },
        "mamba": {
            "blocks": blocks,
            "final_norm": {
                "weight": g("mamba_model.norm_fn.weight"),
                "bias": g("mamba_model.norm_fn.bias"),
            },
        },
        "post_net": {
            "weight": g("post_net.fc3.weight"),
            "bias": g("post_net.fc3.bias"),
        },
    }
    cls_sd = _strip(sd, "cls_net.cls_model.")
    if cls_sd:
        out["cls_net"] = convert_hf_text(cls_sd, cfg.gate, dtype)
    return out


def convert_simple_projector(sd: Dict, cfg: StreamMindConfig,
                             dtype=jnp.float32) -> Dict:
    """linear / mlpNx_gelu projector state dicts (reference
    build_vision_projector, builder.py:119-132): a bare nn.Linear
    ({weight,bias}) or an nn.Sequential with GELU gaps ({0,2,4,...}.*)."""
    t = cfg.mm_projector_type
    g = lambda k: jnp.asarray(sd[k], dtype)
    if t == "linear":
        return {"proj": {"weight": g("weight"), "bias": g("bias")}}
    m = re.match(r"^mlp(\d+)x_gelu$", t)
    if m:
        depth = int(m.group(1))
        return {"mlp": [
            {"weight": g(f"{2 * i}.weight"), "bias": g(f"{2 * i}.bias")}
            for i in range(depth)
        ]}
    raise ValueError(f"not a simple projector type: {t!r}")


def convert_projector_dispatch(sd: Dict, cfg: StreamMindConfig,
                               dtype=jnp.float32) -> Dict:
    """Route mm_projector keys to the right converter by
    cfg.mm_projector_type (the reference instantiates the module from the
    same config field, builder.py:119-158).  Previously every projector
    went to the mamba converter and non-mamba checkpoints crashed on its
    key lookups."""
    t = cfg.mm_projector_type
    if t == "mamba":
        return convert_projector(sd, cfg, dtype)
    for candidate in ("model.mm_projector.", "mm_projector.", ""):
        if candidate == "" or any(k.startswith(candidate) for k in sd):
            psd = _strip(sd, candidate) if candidate else dict(sd)
            break
    if t in ("stc_connector", "stp_connector", "stc_connector_v35"):
        variant = {"stc_connector": "stc", "stp_connector": "stp",
                   "stc_connector_v35": "stc_v35"}[t]
        out = convert_stc_connector(psd, variant=variant, dtype=dtype)
        # the reference embeds its gate inside the connector module; our
        # tree keeps it as projector["cls_net"]
        cls_sd = _strip(psd, "cls_net.cls_model.")
        if cls_sd:
            out["cls_net"] = convert_hf_text(cls_sd, cfg.gate, dtype)
        return out
    if t in ("spatial_conv", "spatial_pool"):
        # depth-0 STC/STP layouts (reference builder.py:780-794): no RegNet
        # stages, sampler.0.* only for the conv variant, 2-layer readout
        variant = "stc" if t == "spatial_conv" else "stp"
        out = convert_stc_connector(psd, depth=0, variant=variant, dtype=dtype)
        cls_sd = _strip(psd, "cls_net.cls_model.")
        if cls_sd:
            out["cls_net"] = convert_hf_text(cls_sd, cfg.gate, dtype)
        return out
    if t == "identity":
        return {}
    if t in ("linear",) or re.match(r"^mlp(\d+)x_gelu$", t):
        return convert_simple_projector(psd, cfg, dtype)
    raise NotImplementedError(
        f"no converter for mm_projector_type={t!r} checkpoints; "
        f"use one of mamba/linear/mlpNx_gelu/stc/stp/spatial or train from "
        f"scratch"
    )


# ---------------------------------------------------------------------------
# LoRA merge
# ---------------------------------------------------------------------------
def merge_lora(sd: Dict, lora_sd: Dict, scaling: Optional[float] = None,
               r: Optional[int] = None, alpha: Optional[float] = None) -> Dict:
    """Merge peft-style lora_A/lora_B pairs into base weights:
    W' = W + scaling * B @ A  (reference path: builder.py:96-104 via peft)."""
    out = dict(sd)
    pairs = {}
    for k, v in lora_sd.items():
        m = re.match(r"(?:base_model\.model\.)?(.+)\.lora_(A|B)(?:\.default)?\.weight", k)
        if not m:
            continue
        base, which = m.groups()
        pairs.setdefault(base, {})[which] = np.asarray(v, np.float32)
    for base, ab in pairs.items():
        if "A" not in ab or "B" not in ab:
            continue
        A, B = ab["A"], ab["B"]
        s = scaling if scaling is not None else (alpha / (r or A.shape[0]) if alpha else 1.0)
        key = base + ".weight"
        if key in out:
            out[key] = np.asarray(out[key], np.float32) + s * (B @ A)
    return out


def _strip_lora_prefixes(sd: Dict) -> Dict:
    """The reference's non_lora_trainables prefix handling
    (model/builder.py:98-102): drop 'base_model.' and a doubled 'model.'."""
    out = {(k[len("base_model."):] if k.startswith("base_model.") else k): v
           for k, v in sd.items()}
    if any(k.startswith("model.model.") for k in out):
        out = {(k[len("model."):] if k.startswith("model.") else k): v
               for k, v in out.items()}
    return out


def convert_streammind_checkpoint(
    model_path: str,
    cfg: StreamMindConfig,
    dtype=jnp.float32,
    vision_path: Optional[str] = None,
    base_path: Optional[str] = None,
) -> Dict:
    """Assemble a full param tree from a checkpoint directory.

    Covers the reference checkpoint zoo (model/builder.py:30-210):
      - full SFT: one state dict holding model.* (decoder),
        model.mm_projector.*, and optionally model.vision_tower.*; vision
        can also come from a separate CLIP checkpoint dir (vision_path);
      - base + mm_projector.bin: point model_path at the adapter dir (the
        projector keys keep their model.mm_projector. prefix) and
        base_path at the base decoder dir;
      - LoRA (builder.py:60-109): model_path holds adapter_model.bin
        (+ adapter_config.json for r/alpha) and non_lora_trainables.bin;
        base_path holds the base decoder.  The lora_A/B pairs are merged
        into the base weights and the non-LoRA trainables overlaid before
        conversion.
    """
    adapter_file = None
    if os.path.isdir(model_path):
        for f in ("adapter_model.bin", "adapter_model.safetensors"):
            p = os.path.join(model_path, f)
            if os.path.exists(p):
                adapter_file = p
                break

    if adapter_file is not None:
        if not base_path:
            raise ValueError(
                f"{model_path} holds a LoRA adapter checkpoint "
                f"(adapter_model.bin); merging needs the BASE decoder — "
                f"pass base_path / model_base (the reference's --model-base, "
                f"model/builder.py:60-109).  Without it the lora_A/B pairs "
                f"would silently match nothing and the decoder would fall "
                f"back to random init."
            )
        sd = load_state_dict(base_path)
        scaling = None
        acfg = os.path.join(model_path, "adapter_config.json")
        if os.path.exists(acfg):
            import json as _json

            with open(acfg) as f:
                a = _json.load(f)
            if a.get("r"):
                scaling = float(a.get("lora_alpha", a["r"])) / float(a["r"])
        sd = merge_lora(sd, load_state_dict(adapter_file), scaling=scaling)
        nlt = os.path.join(model_path, "non_lora_trainables.bin")
        if os.path.exists(nlt):
            sd.update(_strip_lora_prefixes(load_state_dict(nlt)))
    else:
        sd = load_state_dict(model_path)
        if base_path:
            base_sd = load_state_dict(base_path)
            base_sd.update(sd)  # adapter keys win over the base
            sd = base_sd

    params = {}
    text_sd = {
        k: v
        for k, v in sd.items()
        if (k.startswith("model.") and not k.startswith(("model.mm_projector", "model.vision_tower")))
        or k.startswith("lm_head")
    }
    if text_sd:
        params["text"] = convert_hf_text(text_sd, cfg.text, dtype)
    if any(k.startswith("model.mm_projector") or k.startswith("pre_net") for k in sd):
        params["projector"] = convert_projector_dispatch(sd, cfg, dtype)
    vision_sd = _strip(sd, "model.vision_tower.vision_tower.")
    if vision_sd:
        params["vision"] = convert_clip_vision(vision_sd, cfg.vision, dtype)
    elif vision_path:
        params["vision"] = convert_clip_vision(load_state_dict(vision_path), cfg.vision, dtype)
    return params
