"""Training runtime: freeze masks, optimizer, sharded train step.

Replaces the reference's HF Trainer + DeepSpeed stack
(/root/reference/streammind/videollama2_trainer_score.py:319-1202,
train_new_stream.py:683-1060):
  - stage control / freeze logic (train_new_stream.py:879-900):
      stage1 'llm'      — train decoder + projector except gate params
      stage2 'cls'      — train ONLY the gate (cls) params
      'adapter'         — tune_mm_mlp_adapter: only the projector
  - separate projector LR (videollama2_trainer_score.py:341-384)
  - ZeRO-equivalent sharding comes from the fsdp mesh axis; the train step
    is one pjit program (gradients reduce over dp/fsdp automatically).
"""
from __future__ import annotations

import dataclasses
import re
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import StreamMindConfig
from ..parallel.partitioning import param_shardings
from ..utils.params import flatten_with_paths


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# Freeze masks
# ---------------------------------------------------------------------------
_GATE_PAT = re.compile(r"projector\.cls_net\.")
_PROJECTOR_PAT = re.compile(r"projector\.")
_VISION_PAT = re.compile(r"vision\.")


def trainable_mask(params, stage: str) -> Any:
    """Bool tree: True == trainable.  Vision tower is always frozen
    (reference never unfreezes CLIP)."""

    def decide(path: str) -> bool:
        if _VISION_PAT.match(path):
            return False
        is_gate = bool(_GATE_PAT.match(path))
        is_proj = bool(_PROJECTOR_PAT.match(path))
        if stage == "llm":       # stage 1: everything but the gate
            return not is_gate
        if stage == "cls":       # stage 2: only the gate
            return is_gate
        if stage == "adapter":   # mm-adapter pretrain: projector minus gate
            return is_proj and not is_gate
        raise ValueError(f"unknown stage {stage!r}")

    def build(tree, prefix):
        if isinstance(tree, dict):
            return {k: build(v, prefix + k + ".") for k, v in tree.items()}
        if isinstance(tree, list):
            return [build(v, prefix + str(i) + ".") for i, v in enumerate(tree)]
        return decide(prefix.rstrip("."))

    return build(params, "")


def make_optimizer(
    learning_rate,
    mask,
    projector_lr=None,
    params=None,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
):
    """AdamW with frozen-leaf masking and an optional separate projector LR
    (reference mm_projector_lr, videollama2_trainer_score.py:355-384)."""

    def adamw(lr):
        return optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay)

    if projector_lr is None:
        tx = optax.chain(adamw(learning_rate))
    else:
        def label(tree):
            def build(t, prefix):
                if t is None:  # partitioned trees: frozen leaves are None
                    return None
                if isinstance(t, dict):
                    return {k: build(v, prefix + k + ".") for k, v in t.items()}
                if isinstance(t, list):
                    return [build(v, prefix + str(i) + ".") for i, v in enumerate(t)]
                return "proj" if prefix.startswith("projector.") else "base"
            return build(tree, "")

        tx = optax.multi_transform(
            {"base": adamw(learning_rate), "proj": adamw(projector_lr)}, label
        )

    # ONE global-norm clip over all TRAINABLE gradients, inside the mask
    # (frozen-leaf grads must not inflate the norm) but OUTSIDE the
    # per-group transform: with the clip inside each multi_transform
    # branch, base and projector were clipped independently — a combined
    # update of up to sqrt(2)*grad_clip, silently different from the
    # single-LR path and the reference's max_grad_norm.  Then zero-out
    # updates for frozen leaves.
    return optax.chain(
        optax.masked(
            optax.chain(optax.clip_by_global_norm(grad_clip), tx), mask
        ),
        optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, mask)),
    )


def cosine_schedule(peak_lr: float, total_steps: int, warmup_ratio: float = 0.03):
    """Reference stage scripts: cosine with 3% warmup (finetune_stage1.sh)."""
    warmup = max(int(total_steps * warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),  # cosine needs ≥1 decay step
        end_value=0.0,
    )


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


# ---------------------------------------------------------------------------
# Frozen-subtree split: in the adapter/cls stages the 7B decoder is frozen,
# but value_and_grad over the FULL tree still materializes a decoder-sized
# gradient (a ~14.5 GB transient at 7B — more than a v5e chip has left after
# weights).  Partitioning the params so jax.grad only sees the trainable
# leaves removes that allocation entirely; measured: the full adapter stage
# (ViT features → Mamba projector → spliced 7B forward/backward, 2048 ctx,
# remat + flash bwd, AdamW) fits and runs at 608 ms/step on ONE v5e chip
# with an int8 frozen base.  jax pytrees drop None leaves, which is exactly
# what makes the trainable tree grad-sized — but it also means jax.tree.map
# can't build these trees; hand-rolled recursion below.
# ---------------------------------------------------------------------------
def partition_params(params, mask):
    """Split params by the bool mask tree into (trainable, frozen), each with
    None at the other side's positions (None leaves vanish from the pytree,
    so grads/optimizer state exist only for the trainable side)."""
    if isinstance(params, dict):
        t, f = {}, {}
        for k in params:
            t[k], f[k] = partition_params(params[k], mask[k])
        return t, f
    if isinstance(params, list):
        pairs = [partition_params(p, m) for p, m in zip(params, mask)]
        return [a for a, _ in pairs], [b for _, b in pairs]
    return (params, None) if mask else (None, params)


def combine_params(t, f):
    """Inverse of partition_params (runs under jit; plain recursion)."""
    if isinstance(t, dict):
        return {k: combine_params(t[k], f[k]) for k in t}
    if isinstance(t, list):
        return [combine_params(a, b) for a, b in zip(t, f)]
    return t if t is not None else f


def make_split_train_step(loss_fn: Callable, optimizer, mask) -> Callable:
    """make_train_step for frozen-subtree stages: grads and optimizer state
    cover ONLY mask=True leaves.  The optimizer must have been init'd on the
    partitioned trainable tree (init_split_train_state)."""

    def step(state: TrainState, batch) -> tuple:
        t, f = partition_params(state.params, mask)
        loss, grads = jax.value_and_grad(
            lambda tt: loss_fn(combine_params(tt, f), batch)
        )(t)
        updates, opt_state = optimizer.update(grads, state.opt_state, t)
        t = optax.apply_updates(t, updates)
        return (
            TrainState(step=state.step + 1, params=combine_params(t, f),
                       opt_state=opt_state),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    return step


def make_split_grad_step(loss_fn: Callable, mask, has_aux: bool = False) -> Callable:
    """Accumulation half: (params, batch) -> ((loss[, aux]), trainable-only
    grads)."""

    def grad_step(params, batch):
        t, f = partition_params(params, mask)
        return jax.value_and_grad(
            lambda tt: loss_fn(combine_params(tt, f), batch), has_aux=has_aux
        )(t)

    return grad_step


def make_split_accum_apply(optimizer, mask) -> Callable:
    """make_accum_apply over the trainable subtree only."""

    def apply(state: TrainState, grad_sum, loss_sum, total_weight):
        t, f = partition_params(state.params, mask)
        grads = jax.tree.map(lambda g: g / total_weight, grad_sum)
        updates, opt_state = optimizer.update(grads, state.opt_state, t)
        t = optax.apply_updates(t, updates)
        return (
            TrainState(step=state.step + 1, params=combine_params(t, f),
                       opt_state=opt_state),
            {"loss": loss_sum / total_weight,
             "grad_norm": optax.global_norm(grads)},
        )

    return apply


def init_split_train_state(params, optimizer, mask) -> TrainState:
    t, _ = partition_params(params, mask)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(t),
    )


def make_train_step(loss_fn: Callable, optimizer) -> Callable:
    """loss_fn(params, batch) -> scalar.  Returns jittable
    step(state, batch) -> (state, metrics).  Shard params/batch before jit;
    GSPMD handles the rest."""

    def step(state: TrainState, batch) -> tuple:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss": loss, "grad_norm": gnorm},
        )

    return step


def make_grad_step(loss_fn: Callable, has_aux: bool = False) -> Callable:
    """loss_fn(params, batch) -> scalar (or (scalar, aux) with has_aux).
    Returns jittable grad_step(params, batch) -> ((loss[, aux]), grads) for
    gradient accumulation (reference trains with
    GRADIENT_ACCUMULATION_STEPS=2, scripts/custom/finetune_stage1.sh:52)."""

    def grad_step(params, batch):
        return jax.value_and_grad(loss_fn, has_aux=has_aux)(params, batch)

    return grad_step


def tree_add(a, b):
    """Accumulate one grad tree into another (jit with donate_argnums=(0,)
    so the accumulator is updated in place)."""
    return jax.tree.map(jnp.add, a, b)


def tree_axpy(acc, g, w):
    """acc + w·g — weighted grad accumulation (jit, donate acc)."""
    return jax.tree.map(lambda a, b: a + w * b, acc, g)


def tree_scale(g, w):
    """w·g — first weighted chunk of an accumulation."""
    return jax.tree.map(lambda x: w * x, g)


def make_accum_apply(optimizer) -> Callable:
    """Returns jittable apply(state, grad_sum, loss_sum, total_weight) ->
    (state, metrics): divides the (weighted) accumulated grads by the total
    weight and takes ONE optimizer step.  With per-chunk weight = real
    sample count, accumulation over unequal-size modality chunks weights
    every sample equally, matching an unpadded k-times-larger batch (the HF
    convention — equal chunk weighting — is unbiased only when all chunks
    have the same size, which modality grouping does not guarantee)."""

    def apply(state: TrainState, grad_sum, loss_sum, total_weight):
        grads = jax.tree.map(lambda g: g / total_weight, grad_sum)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss": loss_sum / total_weight,
             "grad_norm": optax.global_norm(grads)},
        )

    return apply


def count_trainable(params, mask) -> int:
    leaves = jax.tree.leaves(
        jax.tree.map(lambda p, m: int(p.size) if m else 0, params, mask)
    )
    return sum(leaves)
