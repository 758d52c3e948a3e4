"""Training objectives for the two StreamMind stages.

Stage 1 (LLM): spliced multimodal LM cross-entropy — reference
train path prepare_inputs_labels_for_multimodal_score_stream →
Mistral forward (videollama2_arch.py:613-753, videollama2_mistral.py:226-243).

Stage 2 (gate): (memory-token, label-embed) pair sequences through the
4-layer gate LM with class-weighted CE (builder.py:500-545 "else" branch:
pairs rearranged (b t) c -> b t c with t=2; silence=0 for every frame before
a caption timestamp, respond=1 at the timestamp).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import StreamMindConfig
from ..constants import GATE_CLASS_WEIGHTS, IGNORE_INDEX
from ..models import mistral as lm
from ..models import projector as proj
from ..models.meta import splice_embeds


def lm_cross_entropy(
    logits: jax.Array,  # (B, S, V)
    labels: jax.Array,  # (B, S) with IGNORE_INDEX masking
) -> Tuple[jax.Array, jax.Array]:
    """Shifted causal CE.  Returns (mean_loss, num_target_tokens)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    # clip: an out-of-vocab label would otherwise hit take_along_axis's NaN
    # fill path and silently poison the whole loss
    safe = jnp.clip(jnp.where(valid, shift_labels, 0), 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, picked, 0.0)) / n
    return loss, jnp.sum(valid)


def stage1_llm_loss(
    params,
    cfg: StreamMindConfig,
    frames_features: jax.Array,  # (1, T, N, mm_hidden) pre-extracted CLIP feats
    plan_token_ids: jax.Array,   # (1, P)
    plan_mem_index: jax.Array,   # (1, P)
    plan_use_mem: jax.Array,     # (1, P)
    plan_attn_mask: jax.Array,   # (1, P)
    labels: jax.Array,           # (1, P)
    remat: bool = False,
    attn_impl: str = "auto",
    with_tokens: bool = False,
) -> jax.Array:
    """Spliced multimodal LM loss.  Memory tokens come from the configured
    projector over the frame features (mamba for StreamMind; linear/mlp/
    STC/STP for the vllava baselines); the vision tower is frozen upstream
    (features are inputs, matching the reference's offline feature shards,
    videollama2_trainer_score.py:474-507).

    with_tokens=True also returns the supervised-token count — the correct
    accumulation weight: each chunk loss is a token mean, so weighting
    chunks by token count reproduces the global token mean of an unpadded
    combined batch exactly."""
    # projector-generic (the reference's temporal_aggregator dispatch):
    # mamba yields per-frame tokens, linear/mlp/STC/STP their own counts —
    # the batch builders size the splice plan via projected_token_count
    memory = proj.project_memory(params["projector"], cfg, frames_features)
    embeds = splice_embeds(
        params["text"], plan_token_ids, plan_mem_index, plan_use_mem, memory
    )
    logits, _ = lm.text_forward(
        params["text"], cfg.text, inputs_embeds=embeds, attn_mask=plan_attn_mask,
        remat=remat, attn_impl=attn_impl,
    )
    loss, n = lm_cross_entropy(logits, labels)
    if with_tokens:
        return loss, n.astype(jnp.float32)
    return loss


def text_only_llm_loss(
    params,
    cfg: StreamMindConfig,
    token_ids: jax.Array,   # (B, P)
    attn_mask: jax.Array,   # (B, P)
    labels: jax.Array,      # (B, P)
    remat: bool = False,
    attn_impl: str = "auto",
    with_tokens: bool = False,
) -> jax.Array:
    """Plain LM loss for text-only SFT records (no modal slot — the
    reference splices an empty feature span, videollama2_arch.py:655-663)."""
    logits, _ = lm.text_forward(
        params["text"], cfg.text, input_ids=token_ids, attn_mask=attn_mask,
        remat=remat, attn_impl=attn_impl,
    )
    loss, n = lm_cross_entropy(logits, labels)
    if with_tokens:
        return loss, n.astype(jnp.float32)
    return loss


def stage2_gate_loss(
    params,
    cfg: StreamMindConfig,
    frames_features: jax.Array,  # (1, T, N, mm_hidden)
    gate_labels: jax.Array,      # (1, T) per-frame {0,1}
    label_mask: jax.Array,       # (1, T) bool — frames that carry a label
    with_tokens: bool = False,
) -> jax.Array:
    """Gate training: project frames to memory tokens, build the
    (frame, label-embed) pair sequences, class-weighted CE on the 2-way head.

    Pairs: input = [mem_t, embed(y_t)], labels = [IGNORE, y_t]; the shift in
    gate_loss makes position 0 (the frame) predict y_t.
    """
    memory, _ = proj.mamba_project(params["projector"], cfg, frames_features)
    b, t, d = memory.shape
    gate_embed = params["projector"]["cls_net"]["embed_tokens"]  # (2, D)
    label_emb = gate_embed[jnp.clip(gate_labels, 0, 1)]          # (B, T, D)
    pairs = jnp.stack([memory, label_emb.astype(memory.dtype)], axis=2)  # (B,T,2,D)
    pairs = pairs.reshape(b * t, 2, d)
    pair_labels = jnp.stack(
        [jnp.full_like(gate_labels, IGNORE_INDEX), gate_labels], axis=2
    ).reshape(b * t, 2)
    pair_labels = jnp.where(
        label_mask.reshape(b * t, 1), pair_labels, IGNORE_INDEX
    )
    logits = proj.gate_logits(params["projector"], cfg, pairs)
    loss = proj.gate_loss(logits, pair_labels, GATE_CLASS_WEIGHTS)
    if with_tokens:
        # the gate loss is a class-weight-normalized mean: its accumulation
        # weight is the class-weight sum (the loss denominator)
        shift = pair_labels[:, 1:]
        valid = shift != IGNORE_INDEX
        w = jnp.asarray(GATE_CLASS_WEIGHTS, jnp.float32)[jnp.where(valid, shift, 0)]
        return loss, jnp.sum(jnp.where(valid, w, 0.0))
    return loss
