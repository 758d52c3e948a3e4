"""Multimodal projectors: Video_Mamba_seq (StreamMind default) + baselines.

Reference behaviors reimplemented TPU-first
(/root/reference/streammind/model/multimodal_projector/builder.py):
  - Video_Mamba_seq (builder.py:390-564): per-frame spatial mean-pool
    576→1 token, PreNet linear + leaky-relu (:161-169), VideoMamba scan,
    PostNet leaky-relu + linear (:172-180); hosts the gate LM.
  - ClsNet (builder.py:370-385): 4-layer Mistral, vocab_size=2; gate labels
    0=silence / 1=respond; weighted CE (0.15, 0.85) (:348-355).
  - linear / mlpNx_gelu projectors (builder.py:119-135).

The streaming variants keep carried Mamba state — the reference re-scans all
cached frames every frame (videollama2_arch.py:173-205); here perception is
O(1) per frame, which is what makes the 100 fps target reachable.
"""
from __future__ import annotations

import re
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MambaConfig, StreamMindConfig, TextConfig
from ..utils.params import linear, torch_linear_init
from .mamba import (
    MambaState,
    init_mamba_state,
    init_video_mamba_params,
    video_mamba_forward,
    video_mamba_step,
)
from . import mistral as lm


def init_projector_params(key, cfg: StreamMindConfig, dtype=jnp.float32):
    t = cfg.mm_projector_type
    d_in, d_out = cfg.mm_hidden_size, cfg.text.hidden_size
    if t == "mamba":
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "pre_net": torch_linear_init(k1, d_out, d_in, dtype=dtype),
            "mamba": init_video_mamba_params(k2, cfg.mamba, dtype),
            "post_net": torch_linear_init(k3, d_out, d_out, dtype=dtype),
            "cls_net": lm.init_text_params(k4, cfg.gate, dtype),
        }
    if t == "linear":
        return {"proj": torch_linear_init(key, d_out, d_in, dtype=dtype)}
    m = re.match(r"^mlp(\d+)x_gelu$", t)
    if m:
        depth = int(m.group(1))
        ks = jax.random.split(key, depth)
        layers = [torch_linear_init(ks[0], d_out, d_in, dtype=dtype)]
        layers += [torch_linear_init(ks[i], d_out, d_out, dtype=dtype) for i in range(1, depth)]
        return {"mlp": layers}
    if t == "identity":
        return {}
    if t in ("stc_connector", "stp_connector", "stc_connector_v35"):
        from . import connectors

        k1, k2 = jax.random.split(key)
        variant = {"stc_connector": "stc", "stp_connector": "stp",
                   "stc_connector_v35": "stc_v35"}[t]
        p = connectors.init_stc_connector(k1, cfg, variant=variant, dtype=dtype)
        p["cls_net"] = lm.init_text_params(k2, cfg.gate, dtype)
        return p
    if t in ("spatial_conv", "spatial_pool"):
        # depth-0 STC/STP connectors (reference builder.py:780-794); like
        # every reference connector they embed a ClsNet gate
        from . import connectors

        k1, k2 = jax.random.split(key)
        init = (connectors.init_spatial_conv if t == "spatial_conv"
                else connectors.init_spatial_pool)
        p = init(k1, cfg, dtype=dtype)
        p["cls_net"] = lm.init_text_params(k2, cfg.gate, dtype)
        return p
    raise ValueError(f"Unknown projector type: {t}")


def spatial_pool(frames_features: jax.Array) -> jax.Array:
    """(B, T, N, H) → (B, T, H): per-frame mean over the 576 patch tokens
    (reference builder.py:405 torch.mean(x, dim=2))."""
    return jnp.mean(frames_features, axis=2)


def mamba_project(
    params,
    cfg: StreamMindConfig,
    frames_features: jax.Array,  # (B, T, N, H)
    impl: str = "auto",
) -> Tuple[jax.Array, MambaState]:
    """Video_Mamba_seq main path: mean-pool → PreNet → Mamba → PostNet.

    Returns per-frame memory tokens (B, T, hidden) and the final Mamba state
    (so a streaming session can continue from a prefill).
    """
    x = spatial_pool(frames_features)
    x = jax.nn.leaky_relu(linear(x, params["pre_net"]), negative_slope=0.01)
    x, state = video_mamba_forward(params["mamba"], cfg.mamba, x, impl=impl)
    x = linear(jax.nn.leaky_relu(x, negative_slope=0.01), params["post_net"])
    return x, state


def mamba_project_chunk(
    params,
    cfg: StreamMindConfig,
    frames_features: jax.Array,  # (B, T, N, H) burst of frames mid-stream
    state: MambaState,
) -> Tuple[jax.Array, MambaState]:
    """Stateful chunked projection: continue the carried Mamba state over a
    burst of T frames in one scan (catch-up path; equals T single steps)."""
    x = spatial_pool(frames_features)
    x = jax.nn.leaky_relu(linear(x, params["pre_net"]), negative_slope=0.01)
    x, state = video_mamba_forward(params["mamba"], cfg.mamba, x, state=state)
    x = linear(jax.nn.leaky_relu(x, negative_slope=0.01), params["post_net"])
    return x, state


def mamba_project_step(
    params,
    cfg: StreamMindConfig,
    frame_features: jax.Array,  # (B, N, H) one frame
    state: MambaState,
) -> Tuple[jax.Array, MambaState]:
    """O(1) streaming projection of one frame → one memory token (B, hidden)."""
    x = jnp.mean(frame_features, axis=1)
    x = jax.nn.leaky_relu(linear(x, params["pre_net"]), negative_slope=0.01)
    x, state = video_mamba_step(params["mamba"], cfg.mamba, x, state)
    x = linear(jax.nn.leaky_relu(x, negative_slope=0.01), params["post_net"])
    return x, state


_PROJ_COUNT_MEMO: dict = {}


def projected_token_count(cfg: StreamMindConfig, t: int, n_patches: int) -> int:
    """How many memory tokens one <video> slot expands to.

    Mamba: one per frame (t).  Every other projector type: derived from
    the projector's OWN output shape via eval_shape of simple_project
    (exact for conv-downsampling connectors without duplicating their
    stride arithmetic here).  The splice-plan builders need this number
    host-side before any device work."""
    ty = cfg.mm_projector_type
    if ty == "mamba":
        return t
    key = (ty, cfg.mm_hidden_size, cfg.text.hidden_size, t, n_patches)
    if key not in _PROJ_COUNT_MEMO:
        feats = jax.ShapeDtypeStruct((1, t, n_patches, cfg.mm_hidden_size), jnp.float32)
        pshapes = jax.eval_shape(
            lambda k: init_projector_params(k, cfg), jax.random.PRNGKey(0)
        )
        out = jax.eval_shape(lambda p, f: simple_project(p, cfg, f), pshapes, feats)
        _PROJ_COUNT_MEMO[key] = int(out.shape[1])
    return _PROJ_COUNT_MEMO[key]


def project_memory(params, cfg: StreamMindConfig, frames_features: jax.Array) -> jax.Array:
    """Projector-generic full-clip projection → (B, M, hidden) memory
    tokens (M = projected_token_count).  Mamba returns per-frame tokens;
    the other registry types go through simple_project (the reference's
    temporal_aggregator dispatch, videollama2_arch.py:286)."""
    if cfg.mm_projector_type == "mamba":
        memory, _ = mamba_project(params, cfg, frames_features)
        return memory
    return simple_project(params, cfg, frames_features)


def simple_project(params, cfg: StreamMindConfig, frames_features: jax.Array) -> jax.Array:
    """linear / mlpNx_gelu / identity projectors over mean-pooled video
    features (reference temporal_aggregator mean-pool branch,
    videollama2_arch.py:295-298)."""
    t = cfg.mm_projector_type
    if t in ("stc_connector", "stp_connector", "stc_connector_v35"):
        from . import connectors

        variant = {"stc_connector": "stc", "stp_connector": "stp",
                   "stc_connector_v35": "stc_v35"}[t]
        return connectors.stc_forward(frames_features, params, variant=variant)
    if t == "spatial_conv":
        from . import connectors

        return connectors.spatial_conv_forward(frames_features, params)
    if t == "spatial_pool":
        from . import connectors

        return connectors.spatial_pool_forward(frames_features, params)
    video_features = jnp.mean(frames_features, axis=1)  # (B, N, H) mean over time
    if t == "identity":
        return video_features
    if t == "linear":
        return linear(video_features, params["proj"])
    x = linear(video_features, params["mlp"][0])
    for layer in params["mlp"][1:]:
        x = linear(jax.nn.gelu(x, approximate=False), layer)
    return x


# ---------------------------------------------------------------------------
# Gate LM (ClsNet)
# ---------------------------------------------------------------------------
def gate_logits(
    params,
    cfg: StreamMindConfig,
    memory_tokens: jax.Array,  # (B, S, hidden) sequence fed to the gate LM
    attn_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Run the 4-layer gate LM over an embedded sequence → (B, S, 2) logits."""
    # full unroll: the gate is pure weight bandwidth at its 1-token
    # streaming shape and only 4 layers deep — let XLA pipeline the
    # per-layer weight fetches (same rationale as the ViT tower unroll)
    logits, _ = lm.text_forward(
        params["cls_net"], cfg.gate, inputs_embeds=memory_tokens,
        attn_mask=attn_mask, unroll="full",
    )
    return logits


def gate_decision_step(
    params,
    cfg: StreamMindConfig,
    memory_token: jax.Array,  # (B, hidden) the newest memory token
) -> jax.Array:
    """Demo/streaming gate: feed only the current memory token and read the
    2-way logits at the last position (reference builder.py:547-562 feeds
    x[0][-1] alone through cls_net).  Returns (B, 2) logits."""
    logits = gate_logits(params, cfg, memory_token[:, None, :])
    return logits[:, -1, :]


def gate_loss(
    logits: jax.Array,   # (B, S, 2)
    labels: jax.Array,   # (B, S) in {-100, 0, 1}
    class_weights: Tuple[float, float] = (0.15, 0.85),
) -> jax.Array:
    """Class-weighted causal CE over the 2-way gate vocabulary.

    Shift-by-one like a normal LM loss; IGNORE_INDEX (-100) masked out;
    per-class weights follow the reference's weighted CrossEntropyLoss
    (builder.py:348-355) including its weighted-mean normalization.
    """
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    picked = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, jnp.float32)[safe_labels]
    w = jnp.where(valid, w, 0.0)
    return -jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1e-8)
