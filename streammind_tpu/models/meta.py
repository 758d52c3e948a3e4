"""Meta-architecture: ties vision tower + projector + gate + decoder together
and implements the modal-token splice.

Reference parity:
  - prepare_inputs_labels_for_multimodal_score_stream
    (/root/reference/streammind/model/videollama2_arch.py:613-757): replace
    each -201 slot with the projected memory-token span, pad, extend labels
    with IGNORE_INDEX over the spliced span.
  - encode_images_or_videos_* (:135-205): ViT per frame (600-frame cap) →
    temporal aggregator.

TPU-first splice: the host builds a static-size *splice plan* (numpy index
arrays); the device program is a fixed gather + select — no dynamic shapes,
so one compiled program serves every prompt/span combination up to the
bucket size.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StreamMindConfig
from ..constants import IGNORE_INDEX, MAX_VISION_BATCH_FRAMES
from . import mistral as lm
from . import projector as proj
from .vit import init_vit_params, vit_forward


def init_streammind_params(key, cfg: StreamMindConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vision": init_vit_params(k1, cfg.vision, dtype),
        "projector": init_projector(k2, cfg, dtype),
        "text": lm.init_text_params(k3, cfg.text, dtype),
    }


def init_projector(key, cfg: StreamMindConfig, dtype=jnp.float32):
    return proj.init_projector_params(key, cfg, dtype)


def encode_frames(params, cfg: StreamMindConfig, pixels: jax.Array, attn_impl="auto"):
    """(T, 3, H, W) → (1, T, N, mm_hidden): per-frame ViT features.

    Enforces the reference's 600-frame cap (videollama2_arch.py:150-151).
    """
    if pixels.shape[0] > MAX_VISION_BATCH_FRAMES:
        pixels = pixels[-MAX_VISION_BATCH_FRAMES:]
    feats = vit_forward(params["vision"], cfg.vision, pixels, attn_impl=attn_impl)
    return feats[None]


# ---------------------------------------------------------------------------
# Splice plan: host-side index computation, device-side gather/select.
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class SplicePlan:
    """Static-size plan for replacing modal slots with memory-token spans.

    token_ids: (P,) vocab ids (0 where a memory token goes)
    mem_index: (P,) index into the flattened memory-token sequence
    use_mem:   (P,) bool — True where the position takes a memory token
    attn_mask: (P,) bool — valid positions
    labels:    (P,) labels with IGNORE_INDEX over prompt/memory/pad
    length:    true sequence length
    """

    token_ids: np.ndarray
    mem_index: np.ndarray
    use_mem: np.ndarray
    attn_mask: np.ndarray
    labels: np.ndarray
    length: int


def build_splice_plan(
    input_ids: Sequence[int],
    span_lengths: Sequence[int],
    modal_token_index: int,
    pad_to: int,
    labels: Optional[Sequence[int]] = None,
) -> SplicePlan:
    """Expand each modal slot (== modal_token_index) to its span length.

    span_lengths[i] is the number of memory tokens for the i-th modal slot;
    memory tokens are indexed consecutively across spans (matching the
    reference's start_feature_idx/feature_idx windows,
    videollama2_arch.py:676-690).
    """
    ids = list(input_ids)
    labs = list(labels) if labels is not None else None
    out_ids: List[int] = []
    out_mem: List[int] = []
    out_use: List[bool] = []
    out_lab: List[int] = []
    span_i = 0
    mem_base = 0
    for pos, tok in enumerate(ids):
        if tok == modal_token_index:
            if span_i >= len(span_lengths):
                raise ValueError(
                    f"prompt has more modal slots than the {len(span_lengths)} "
                    "span(s) provided"
                )
            n = span_lengths[span_i]
            for j in range(n):
                out_ids.append(0)
                out_mem.append(mem_base + j)
                out_use.append(True)
                out_lab.append(IGNORE_INDEX)
            mem_base += n
            span_i += 1
        else:
            out_ids.append(tok)
            out_mem.append(0)
            out_use.append(False)
            out_lab.append(labs[pos] if labs is not None else IGNORE_INDEX)
    if span_i != len(span_lengths):
        raise ValueError(
            f"{len(span_lengths)} spans provided but {span_i} modal slots found"
        )
    length = len(out_ids)
    if length > pad_to:
        raise ValueError(f"spliced length {length} exceeds bucket {pad_to}")
    pad = pad_to - length
    return SplicePlan(
        token_ids=np.asarray(out_ids + [0] * pad, np.int32),
        mem_index=np.asarray(out_mem + [0] * pad, np.int32),
        use_mem=np.asarray(out_use + [False] * pad, bool),
        attn_mask=np.asarray([True] * length + [False] * pad, bool),
        labels=np.asarray(out_lab + [IGNORE_INDEX] * pad, np.int32),
        length=length,
    )


def splice_embeds(
    text_params,
    plan_token_ids: jax.Array,  # (B, P)
    plan_mem_index: jax.Array,  # (B, P)
    plan_use_mem: jax.Array,    # (B, P)
    memory_tokens: jax.Array,   # (B, M, D) flattened memory-token sequence
) -> jax.Array:
    """Device-side splice: token embeds where use_mem is False, gathered
    memory tokens where True.  Fully static shapes."""
    tok_emb = text_params["embed_tokens"][plan_token_ids]
    mem_emb = jnp.take_along_axis(
        memory_tokens, plan_mem_index[..., None], axis=1
    )
    return jnp.where(plan_use_mem[..., None], mem_emb.astype(tok_emb.dtype), tok_emb)


def bucket_length(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (compile-once per bucket)."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds largest bucket {buckets[-1]}")
