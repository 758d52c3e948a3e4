"""train() entry point — the reference's train_new_stream.train
(/root/reference/streammind/train_new_stream.py:683-1060) as one sharded
JAX training loop.

Stage control (reference :879-900 + scripts/custom/finetune_stage{1,2}.sh):
  --score-dataset-train-llm  → stage 1: decoder + projector (lr 2e-5)
  --score-dataset-train-cls  → stage 2: gate only (lr 2e-6)
  --tune-mm-mlp-adapter      → adapter pretrain: projector only
  --train-skip-cls           → initialize the gate LM from the first
                               gate-depth decoder layers (:655-681, :1039-1043)

Checkpoints: checkpoint-{step} dirs with auto-resume from the latest
(reference :1035-1037); stage-2/adapter runs save adapter-only trees.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StreamMindConfig
from ..constants import VIDEO_TOKEN_INDEX
from ..models.meta import build_splice_plan, bucket_length, init_streammind_params
from ..models.vit import vit_forward
from ..parallel import make_mesh, shard_params
from ..utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_opt_state,
    save_checkpoint,
    save_opt_state,
)
from ..utils.logging import MetricLogger, build_logger
from .args import DataArguments, ModelArguments, TrainingArguments, parse_args
from .objectives import stage1_llm_loss, stage2_gate_loss
from .trainer import (
    cosine_schedule,
    count_trainable,
    init_split_train_state,
    init_train_state,
    make_accum_apply,
    make_grad_step,
    make_optimizer,
    make_split_accum_apply,
    make_split_grad_step,
    make_split_train_step,
    make_train_step,
    partition_params,
    trainable_mask,
    tree_axpy,
    tree_scale,
)

logger = build_logger("train", "train.log")

PLAN_BUCKETS = (128, 256, 512, 1024, 2048)
FRAME_BUCKETS = (8, 16, 32, 64, 128, 256, 600)


def copy_decoder_layers_into_gate(params, cfg: StreamMindConfig):
    """train_skip_cls: gate layers i ← decoder layers i (weights whose shapes
    line up; the 2-vocab embed/lm_head stay as initialized)."""
    gate = params["projector"]["cls_net"]["layers"]
    text = params["text"]["layers"]
    n = params["projector"]["cls_net"]["layers"]["q"]["weight"].shape[0]

    def take(src, dst):
        """Copy src leaves into dst's STRUCTURE, leaf by leaf: a backbone
        whose layer dicts differ from the gate's (Qwen2 carries q/k/v
        biases the gate lacks; Mixtral/Qwen2 intermediate sizes differ)
        must transfer what lines up and keep the rest initialized, not
        crash on a tree mismatch or copy wrong-shaped weights.

        jnp.copy: a full-extent slice would alias the source buffer and
        break donation (same array donated twice in the train step)."""
        if isinstance(dst, dict):
            return {
                k: (take(src[k], v) if isinstance(src, dict) and k in src else v)
                for k, v in dst.items()
            }
        if not isinstance(src, dict) and src.shape[1:] == dst.shape[1:] \
                and src.shape[0] >= n:
            return jnp.copy(src[:n]).astype(dst.dtype)
        return dst

    for name in ("q", "k", "v", "o", "input_norm", "post_norm"):
        gate[name] = take(text[name], gate[name])
    if "mlp" in text:
        gate["mlp"] = take(text["mlp"], gate["mlp"])
    else:
        # MoE decoder (Mixtral): there is no dense mlp to copy into the
        # dense gate — attention + norms transfer, the gate MLP stays as
        # initialized (the reference only ran skip_cls on the Mistral
        # backbone; its per-name copy would likewise find no mlp match)
        logger.info("skip_cls: MoE decoder has no dense mlp; gate MLP keeps init")
    params["projector"]["cls_net"]["layers"] = gate
    logger.info("complete aligning cls_weight (decoder → gate)")
    return params


def _stage_of(model_args: ModelArguments, data_args: DataArguments) -> str:
    if data_args.score_dataset_train_cls:
        return "cls"
    if model_args.tune_mm_mlp_adapter:
        return "adapter"
    return "llm"


import functools


@functools.lru_cache(maxsize=4)
def _jitted_vit(cfg_vision):
    return jax.jit(lambda p, px: vit_forward(p, cfg_vision, px))


def _encode_frames_frozen(params, cfg, pixels):
    """Frozen ViT feature extraction (no grad; outside the loss).  Jitted —
    frames are bucketed upstream so this compiles once per bucket size
    instead of dispatching every ViT op from Python each step."""
    feats = _jitted_vit(cfg.vision)(params["vision"], pixels)
    return feats[None]


def _encode_video(video: np.ndarray, t_bucket: int, cfg, vision_params):
    """(T,3,H,W) pixels or (T,P,D) features → (1, t_bucket, N, D) features.
    Pixels are padded to the bucket BEFORE the ViT so the encoder compiles
    once per bucket (not once per raw frame count); trailing pad frames are
    harmless — the projector scan is causal and the splice never gathers
    memory positions past the real span."""
    t = video.shape[0]
    if t < t_bucket:
        video = np.pad(video, ((0, t_bucket - t),) + ((0, 0),) * (video.ndim - 1))
    if video.ndim == 3:  # (T, P, D) pre-extracted features skip the tower
        return jnp.asarray(video)[None]
    return _encode_frames_frozen({"vision": vision_params}, cfg, jnp.asarray(video))


def _plan_geometry(sample, cfg, stage: str, frame_bucket=None):
    """Single source of truth for frame truncation, frame bucket and the
    splice span sizes — shared by make_sft_batch, make_batch_from_sample
    and _natural_buckets, whose arithmetic must agree EXACTLY for
    shared-bucket stacking (previously triplicated by hand).

    Mamba: spans count FRAMES (one memory token per frame); frames pad to
    a bucket and the plan indexes only the real ones.  Other projector
    types: each <video> slot expands to M = projected_token_count tokens
    computed on the (padded) frame bucket the projector will actually
    consume; the reference trains these with a fixed --num-frames
    (scripts/vllava), so frame counts should be constant per batch.

    Returns (t, frame_bucket, spans); spans is None for cls rows.
    """
    from ..models.projector import projected_token_count

    mamba = cfg.mm_projector_type == "mamba"
    video = np.asarray(sample["video"])
    t = min(video.shape[0], FRAME_BUCKETS[-1])
    fb = frame_bucket or (bucket_length(t, FRAME_BUCKETS) if mamba else t)
    t = min(t, fb)
    if stage == "cls":
        return t, fb, None
    if "span_frames" in sample and "modal" not in sample:
        if not mamba:
            raise ValueError(
                "multi-turn streaming samples need per-frame memory tokens "
                f"(mm_projector_type='mamba'); got {cfg.mm_projector_type!r}"
            )
        # frame truncation keeps the LAST t frames, so shrink spans from
        # the FRONT (earliest turns), never below 1 per slot — the slot
        # count must keep matching the <video> tokens in input_ids
        spans = list(sample["span_frames"])
        drop = sum(spans) - t
        i = 0
        while drop > 0 and i < len(spans):
            take = min(spans[i] - 1, drop)
            spans[i] -= take
            drop -= take
            i += 1
        return t, fb, spans
    if mamba:
        return t, fb, [t]
    if video.ndim == 3:  # pre-extracted features carry their token count
        n_patches = video.shape[1]
    else:
        n_patches = (cfg.vision.image_size // cfg.vision.patch_size) ** 2
        if getattr(cfg.vision, "select_feature", "patch") == "cls_patch":
            n_patches += 1  # CLS token kept (vit.py feature_select)
    return t, fb, [projected_token_count(cfg, fb, n_patches)]


def _truncate_to_cap(ids, labels, spans):
    """Right-truncate a sample whose SPLICED length exceeds the largest
    plan bucket (the reference truncates spliced embeds to
    tokenizer.model_max_length; previously this raised
    ValueError('exceeds largest bucket') hours into a run).  Truncation
    never cuts a modal slot — spans must keep matching the <video> tokens."""
    cap = PLAN_BUCKETS[-1]
    n_spliced = len(ids) - len(spans) + sum(spans)
    if n_spliced <= cap:
        return ids, labels
    overflow = n_spliced - cap
    keep = len(ids) - overflow
    last_modal = max((i for i, t in enumerate(ids) if t < 0), default=-1)
    if keep <= last_modal:
        raise ValueError(
            f"sample too long to truncate: spliced length {n_spliced} > "
            f"{cap} and the overflow reaches back into a modal slot"
        )
    logger.warning(
        f"truncating over-long sample: spliced {n_spliced} > cap {cap} "
        f"({overflow} trailing tokens dropped)"
    )
    return ids[:keep], labels[:keep]


def make_sft_batch(sample, cfg, vision_params, token_bucket=None, frame_bucket=None):
    """SFT record (data/sft.py) → batch.  Text-only records return a
    token-only batch (no frames key); media records go through the splice.
    token_bucket/frame_bucket override the natural buckets so samples in the
    same microbatch stack to one shape."""
    from ..constants import IGNORE_INDEX, MMODAL_TOKEN_INDEX

    ids = list(np.asarray(sample["input_ids"])[0])
    labels = list(np.asarray(sample["labels"])[0])
    if sample.get("modal") is None:
        if len(ids) > PLAN_BUCKETS[-1]:
            ids, labels = _truncate_to_cap(ids, labels, [])
        bucket = token_bucket or bucket_length(len(ids), PLAN_BUCKETS)
        pad = bucket - len(ids)
        return {
            "kind": "text",
            "token_ids": jnp.asarray(ids + [0] * pad)[None],
            "attn_mask": jnp.asarray([True] * len(ids) + [False] * pad)[None],
            "labels": jnp.asarray(labels + [IGNORE_INDEX] * pad)[None],
        }
    modal_index = MMODAL_TOKEN_INDEX[sample["modal"]]
    video = np.asarray(sample["video"], np.float32)
    t, t_bucket, spans = _plan_geometry(sample, cfg, "llm", frame_bucket)
    video = video[-t:] if video.shape[0] > t else video
    feats = _encode_video(video, t_bucket, cfg, vision_params)
    ids, labels = _truncate_to_cap(ids, labels, spans)
    bucket = token_bucket or bucket_length(
        len(ids) - len(spans) + sum(spans), PLAN_BUCKETS
    )
    plan = build_splice_plan(ids, spans, modal_index, bucket, labels=labels)
    return {
        "kind": "media",
        "frames": feats,
        "token_ids": jnp.asarray(plan.token_ids)[None],
        "mem_index": jnp.asarray(plan.mem_index)[None],
        "use_mem": jnp.asarray(plan.use_mem)[None],
        "attn_mask": jnp.asarray(plan.attn_mask)[None],
        "labels": jnp.asarray(plan.labels)[None],
    }


def make_batch_from_sample(sample, cfg, vision_params, stage: str,
                           token_bucket=None, frame_bucket=None):
    """Host-side: sample dict → device batch with a bucketed splice plan.

    sample["video"] is either (T, 3, H, W) pixels or (T, P, D) pre-extracted
    CLIP features (the shard pipeline, data/extract.py) — features skip the
    frozen vision tower entirely.  Multi-turn streaming samples (Ego4D,
    data/ego4d.py) carry "span_frames": one <video> slot per turn, spans
    indexed consecutively over the frame sequence.
    """
    video = np.asarray(sample["video"], np.float32)
    t, t_bucket, spans = _plan_geometry(sample, cfg, stage, frame_bucket)
    video = video[-t:] if video.shape[0] > t else video
    feats = _encode_video(video, t_bucket, cfg, vision_params)

    if stage == "cls":
        gate_labels = np.zeros((1, t_bucket), np.int64)
        gate_labels[0, t - 1] = 0 if sample["caption_info"] == "</s>" else 1
        mask = np.zeros((1, t_bucket), bool)
        mask[0, :t] = True
        return {
            "frames": feats,
            "labels": jnp.asarray(gate_labels),
            "mask": jnp.asarray(mask),
        }

    ids = list(np.asarray(sample["input_ids"])[0])
    labels = list(np.asarray(sample["labels"])[0])
    ids, labels = _truncate_to_cap(ids, labels, spans)
    n_spliced = len(ids) - len(spans) + sum(spans)
    bucket = token_bucket or bucket_length(n_spliced, PLAN_BUCKETS)
    plan = build_splice_plan(ids, spans, VIDEO_TOKEN_INDEX, bucket, labels=labels)
    return {
        "frames": feats,
        "token_ids": jnp.asarray(plan.token_ids)[None],
        "mem_index": jnp.asarray(plan.mem_index)[None],
        "use_mem": jnp.asarray(plan.use_mem)[None],
        "attn_mask": jnp.asarray(plan.attn_mask)[None],
        "labels": jnp.asarray(plan.labels)[None],
    }


def _natural_buckets(sample, cfg, stage: str):
    """(frame_bucket, token_bucket) this sample needs — host metadata only,
    no device work.  Used to pick shared buckets for a stacked microbatch.
    Delegates the truncation/span arithmetic to _plan_geometry so it can
    never desynchronize from the batch builders.  For mamba, the clamped
    frame count never exceeds the natural frame bucket, so a LARGER shared
    frame bucket cannot change the token bucket; non-mamba microbatches
    must share one frame count (make_microbatch enforces it)."""
    cap = PLAN_BUCKETS[-1]
    if "modal" in sample and sample.get("modal") is None:
        ids_len = int(np.asarray(sample["input_ids"]).shape[-1])
        return 0, bucket_length(min(ids_len, cap), PLAN_BUCKETS)
    t, fb, spans = _plan_geometry(sample, cfg, stage)
    if stage == "cls":
        return fb, 0
    ids_len = int(np.asarray(sample["input_ids"]).shape[-1])
    # min(cap): over-long samples are right-truncated by the builders
    # (_truncate_to_cap), so the metadata pass must saturate the same way
    return fb, bucket_length(min(ids_len - len(spans) + sum(spans), cap),
                             PLAN_BUCKETS)


def make_microbatch(samples, cfg, vision_params, stage: str, pad_to: int = 0):
    """Stack same-kind samples into one (B, ...) device batch at shared
    buckets.  pad_to > len(samples) appends copies of samples[0] with all
    labels masked out (zero valid tokens → no effect on the token-mean loss)
    so the batch dimension stays divisible by the dp mesh axis.

    Returns (kind, batch): kind is "text" | "media" | "cls".
    """
    from ..constants import IGNORE_INDEX

    n_real = len(samples)
    if pad_to > n_real:
        samples = list(samples) + [samples[0]] * (pad_to - n_real)
    metas = [_natural_buckets(s, cfg, stage) for s in samples]
    if cfg.mm_projector_type != "mamba":
        fbs = {m[0] for m in metas if m[0]}
        if len(fbs) > 1:
            raise ValueError(
                f"mm_projector_type={cfg.mm_projector_type!r} needs a fixed "
                f"frame count per batch (its memory-token count depends on "
                f"the frame axis it convolves/pools over; the reference "
                f"samples a fixed --num-frames) — got {sorted(fbs)}"
            )
    fb = max(m[0] for m in metas) or None
    tb = max(m[1] for m in metas) or None
    rows, kind = [], "cls" if stage == "cls" else "media"
    built = {}  # id(sample) → row: pad rows duplicate samples[0]; build
    # (and ViT-encode) each distinct sample once, not once per copy
    for j, s in enumerate(samples):
        if id(s) in built:
            row = dict(built[id(s)])
        elif "modal" in s:
            row = make_sft_batch(s, cfg, vision_params, token_bucket=tb, frame_bucket=fb)
            kind = row.pop("kind")
            built[id(s)] = row
        else:
            row = make_batch_from_sample(s, cfg, vision_params, stage,
                                         token_bucket=tb, frame_bucket=fb)
            built[id(s)] = row
        if j >= n_real:  # neutralize pad rows
            row = dict(row)
            if stage == "cls":
                row["mask"] = jnp.zeros_like(row["mask"])
            else:
                row["labels"] = jnp.full_like(row["labels"], IGNORE_INDEX)
        rows.append(row)
    batch = {k: jnp.concatenate([r[k] for r in rows], axis=0) for k in rows[0]}
    return kind, batch


def train(model_args=None, data_args=None, training_args=None, dataset=None,
          cfg: Optional[StreamMindConfig] = None, max_steps_override=None):
    if model_args is None:
        model_args, data_args, training_args = parse_args()
    stage = _stage_of(model_args, data_args)
    logger.info(f"training stage: {stage}")

    # -- model -------------------------------------------------------------
    if cfg is None:
        if model_args.model_path and os.path.isdir(model_args.model_path):
            # derive the decoder config from the checkpoint's config.json —
            # the reference's cfg_pretrained backbone dispatch
            # (model/builder.py:124-129); this is what makes a Mixtral dir
            # train as MoE (num_local_experts → TextConfig.num_experts)
            from ..api import _load_config

            cfg = _load_config(model_args.model_path).replace(
                mm_projector_type=model_args.mm_projector_type
            )
        else:
            cfg = StreamMindConfig(mm_projector_type=model_args.mm_projector_type)
    if stage == "cls" and cfg.mm_projector_type != "mamba":
        raise ValueError(
            "gate (stage-2) training requires mm_projector_type='mamba' — "
            "the 2-way gate LM lives inside the mamba projector (cls_net, "
            f"reference builder.py:390-401); got {cfg.mm_projector_type!r}"
        )
    dtype = jnp.bfloat16 if training_args.bf16 else jnp.float32
    if model_args.model_path and os.path.isdir(model_args.model_path):
        from ..utils.convert import convert_streammind_checkpoint

        params = convert_streammind_checkpoint(
            model_args.model_path, cfg, dtype,
            vision_path=model_args.vision_tower,
            base_path=model_args.model_base,
        )
        missing = {"vision", "projector", "text"} - set(params)
        if missing:
            init = init_streammind_params(
                jax.random.PRNGKey(training_args.seed), cfg, dtype
            )
            params.update({k: init[k] for k in missing})
    else:
        params = init_streammind_params(
            jax.random.PRNGKey(training_args.seed), cfg, dtype
        )
    if model_args.pretrain_mm_mlp_adapter:
        # load a pre-trained projector (mm_projector.bin, torch naming) —
        # the torch format exists only for the mamba projector
        if cfg.mm_projector_type != "mamba":
            raise ValueError(
                "--pretrain-mm-mlp-adapter expects mm_projector_type='mamba' "
                f"(got {cfg.mm_projector_type!r}); other projector types load "
                "from framework checkpoints (checkpoint-N dirs) instead"
            )
        from ..utils.convert import convert_projector, load_state_dict

        loaded_proj = convert_projector(
            load_state_dict(model_args.pretrain_mm_mlp_adapter), cfg, dtype
        )
        params["projector"].update(loaded_proj)
        logger.info(f"loaded projector from {model_args.pretrain_mm_mlp_adapter}")
    if model_args.train_skip_cls:
        params = copy_decoder_layers_into_gate(params, cfg)

    if model_args.bits not in (4, 8, 16):
        raise ValueError(f"--bits must be 4, 8 or 16, got {model_args.bits}")
    if model_args.bits in (4, 8):
        # reference --bits bnb path (train_new_stream.py:694-712): the frozen
        # decoder rests quantized during adapter/cls training — the full 7B
        # adapter stage then fits one v5e chip (int8 base: 608 ms/step at
        # 2048 ctx, remat + flash bwd)
        if stage == "llm" and not training_args.lora_enable:
            raise NotImplementedError(
                "bits<16 freezes the decoder: use the adapter/cls stages, "
                "or enable LoRA (QLoRA — matmul-time adapters over the "
                "quantized base)"
            )
        from ..utils.quantize import quantize_text_params

        params["text"] = quantize_text_params(
            params["text"], bits=model_args.bits, free_source=True
        )
        logger.info(f"frozen decoder quantized to int{model_args.bits}")

    # -- data ----------------------------------------------------------------
    if dataset is None:
        if data_args.dataset == "matchtime":
            from ..data import MatchTimeDataset

            try:
                import transformers

                tokenizer = transformers.AutoTokenizer.from_pretrained(
                    model_args.model_path
                )
            except Exception as e:  # noqa: BLE001
                raise RuntimeError(
                    "need a tokenizer; pass dataset= for tests"
                ) from e
            dataset = MatchTimeDataset(
                data_args.data_path, tokenizer, cur_fps=data_args.cur_fps,
                seed=training_args.seed,
            )
        elif data_args.dataset == "ego4d":
            from ..data.ego4d import Ego4dNarrationDataset
            import transformers

            tokenizer = transformers.AutoTokenizer.from_pretrained(model_args.model_path)
            dataset = Ego4dNarrationDataset(
                data_args.data_folder or ".", data_args.anno_path, tokenizer,
                model_type="llm", data_type="train",
            )
        elif data_args.dataset == "sft":
            from ..data.sft import VideoLLaVASFTDataset
            import transformers

            tokenizer = transformers.AutoTokenizer.from_pretrained(model_args.model_path)
            dataset = VideoLLaVASFTDataset(
                data_args.data_path, data_args.data_folder or ".", tokenizer,
                num_frames=model_args.num_frames,
                style="plain" if model_args.tune_mm_mlp_adapter else "llama_2",
                seed=training_args.seed,
            )
        else:
            raise ValueError(f"unknown dataset {data_args.dataset}")

    # global batch = dp × per-device batch × grad accumulation (reference:
    # torchrun DDP world × batch 1 × accum 2, finetune_stage1.sh:25-31,52)
    accum = max(training_args.gradient_accumulation_steps, 1)
    per_device = max(training_args.per_device_train_batch_size, 1)
    micro_bs = per_device * max(training_args.dp, 1)
    global_bs = micro_bs * accum
    if training_args.max_steps > 0 or max_steps_override:
        total_steps = max_steps_override or training_args.max_steps
    else:  # optimizer steps for num_train_epochs passes over the data
        steps_per_epoch = max(len(dataset) // global_bs, 1)
        total_steps = steps_per_epoch * max(training_args.num_train_epochs, 1)

    # -- LoRA (reference lora_enable path, train_new_stream.py:813-829) -----
    lora_scaling = None
    if training_args.lora_enable and stage == "llm":
        from .lora import init_lora_params

        params["lora"] = init_lora_params(
            jax.random.PRNGKey(training_args.seed + 1), params["text"],
            r=training_args.lora_r, dtype=dtype,
        )
        lora_scaling = training_args.lora_alpha / training_args.lora_r
        logger.info(
            f"LoRA enabled: r={training_args.lora_r} alpha={training_args.lora_alpha}"
        )

    # -- optimizer + sharding -----------------------------------------------
    if lora_scaling is not None:
        # base decoder frozen; LoRA deltas + projector (minus gate) train
        mask = trainable_mask(
            {k: v for k, v in params.items() if k != "lora"}, "adapter"
        )
        mask["lora"] = jax.tree.map(lambda _: True, params["lora"])
    else:
        mask = trainable_mask(params, stage)
    logger.info(
        f"trainable params: {count_trainable(params, mask)/1e6:.1f}M"
    )
    schedule = cosine_schedule(
        training_args.learning_rate, total_steps, training_args.warmup_ratio
    )
    # frozen-subtree stages (adapter/cls/LoRA: the decoder base never gets a
    # grad) partition the params so jax.grad and the optimizer only ever see
    # the trainable leaves — removes the decoder-sized gradient transient
    # that otherwise OOMs single-chip 7B adapter/LoRA training, and is
    # REQUIRED for --bits (int8/int4 leaves are not differentiable)
    split_frozen = stage in ("adapter", "cls") or (
        training_args.lora_enable and stage == "llm"
    )
    opt_mask = partition_params(mask, mask)[0] if split_frozen else mask
    optimizer = make_optimizer(
        schedule, opt_mask,
        projector_lr=training_args.mm_projector_lr,
        weight_decay=training_args.weight_decay,
        grad_clip=training_args.grad_clip,
    )

    mesh = make_mesh(training_args.dp, training_args.fsdp, training_args.tp)
    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        if split_frozen:
            state = init_split_train_state(params, optimizer, mask)
        else:
            state = init_train_state(params, optimizer)

        # resume
        start_step = 0
        if training_args.resume:
            latest = latest_checkpoint(training_args.output_dir)
            if latest:
                loaded, _, meta = load_checkpoint(latest)
                if meta.get("lora_only"):
                    # LoRA checkpoints carry only {lora, projector}; the base
                    # decoder/vision stay at their initialized values
                    new_params = dict(state.params)
                    for k in ("lora", "projector"):
                        if k in loaded:
                            new_params[k] = shard_params({k: loaded[k]}, mesh)[k] \
                                if k == "projector" else loaded[k]
                    restored_opt = load_opt_state(latest, state.opt_state)
                    state = state._replace(
                        params=new_params,
                        opt_state=(restored_opt if restored_opt is not None
                                   else state.opt_state),
                        step=jnp.int32(meta["step"]),
                    )
                    start_step = meta["step"]
                    logger.info(
                        f"resumed LoRA adapters from {latest}"
                        + ("" if restored_opt is not None
                           else " (fresh optimizer state)")
                    )
                elif meta.get("adapter_only"):
                    # adapter checkpoints carry only the projector subtree;
                    # restore it (and the step) so stage-2/adapter runs resume
                    new_params = dict(state.params)
                    new_params["projector"] = shard_params(
                        {"projector": loaded["projector"]}, mesh
                    )["projector"]
                    state = state._replace(
                        params=new_params, step=jnp.int32(meta["step"])
                    )
                    start_step = meta["step"]
                    logger.info(f"resumed adapter from {latest} (fresh optimizer state)")
                else:
                    restored_opt = load_opt_state(latest, state.opt_state)
                    state = state._replace(
                        params=shard_params(loaded, mesh),
                        opt_state=restored_opt if restored_opt is not None else state.opt_state,
                        step=jnp.int32(meta["step"]),
                    )
                    start_step = meta["step"]
                    logger.info(
                        f"resumed from {latest}"
                        + ("" if restored_opt is not None else " (fresh optimizer state)")
                    )

        from .objectives import text_only_llm_loss

        def _effective(p):
            if lora_scaling is None:
                return p
            # matmul-time attach (never materializes merged weights; works
            # over a quantized base — QLoRA when --bits 4/8)
            from .lora import attach_lora

            return {**p, "text": attach_lora(p["text"], p["lora"], lora_scaling)}

        # "auto": Pallas flash fwd+bwd on TPU (9.6x over jnp+remat at 2048
        # ctx); on dp/fsdp/tp meshes the attention dispatcher shard_maps the
        # kernels over the ambient mesh (batch on dp, heads on tp — see
        # ops/attention.py::flash_mha_sharded).  jnp reference on CPU where
        # Pallas runs interpreted.
        attn_impl = training_args.attn_impl
        if attn_impl == "auto":
            attn_impl = "flash" if jax.default_backend() == "tpu" else "auto"
        if attn_impl == "flash":
            # strict per-call policy: a mesh that can't divide (B, H) would
            # silently fall back to the O(S²) jnp path and tank every step —
            # 'flash!' makes that a trace-time error for TRAINING calls only
            # (no process-global mutation; serving in the same process keeps
            # its warn-and-degrade contract)
            attn_impl = "flash!"

        if stage == "cls":
            def loss_fn(p, b, with_tokens=False):
                return stage2_gate_loss(p, cfg, b["frames"], b["labels"],
                                        b["mask"], with_tokens=with_tokens)
        else:
            def loss_fn(p, b, with_tokens=False):
                return stage1_llm_loss(
                    _effective(p), cfg, b["frames"], b["token_ids"], b["mem_index"],
                    b["use_mem"], b["attn_mask"], b["labels"],
                    remat=training_args.gradient_checkpointing,
                    attn_impl=attn_impl, with_tokens=with_tokens,
                )

        def text_loss_fn(p, b, with_tokens=False):
            return text_only_llm_loss(
                _effective(p), cfg, b["token_ids"], b["attn_mask"], b["labels"],
                remat=training_args.gradient_checkpointing,
                attn_impl=attn_impl, with_tokens=with_tokens,
            )

        # accumulation variants return (loss, supervised-token count): each
        # chunk loss is a token mean, so token-count weighting reproduces the
        # global token mean of an unpadded combined batch exactly
        loss_fn_aux = functools.partial(loss_fn, with_tokens=True)
        text_loss_fn_aux = functools.partial(text_loss_fn, with_tokens=True)

        if split_frozen:
            step_fn = jax.jit(make_split_train_step(loss_fn, optimizer, mask),
                              donate_argnums=(0,))
            step_fn_text = jax.jit(
                make_split_train_step(text_loss_fn, optimizer, mask),
                donate_argnums=(0,))
            grad_fn = jax.jit(make_split_grad_step(loss_fn_aux, mask, has_aux=True))
            grad_fn_text = jax.jit(
                make_split_grad_step(text_loss_fn_aux, mask, has_aux=True))
            apply_fn = jax.jit(make_split_accum_apply(optimizer, mask),
                               donate_argnums=(0,))
        else:
            step_fn = jax.jit(make_train_step(loss_fn, optimizer), donate_argnums=(0,))
            step_fn_text = jax.jit(make_train_step(text_loss_fn, optimizer), donate_argnums=(0,))
            # gradient-accumulation programs (reference recipe: per-device
            # batch 1 × GRADIENT_ACCUMULATION_STEPS=2, finetune_stage1.sh:52)
            grad_fn = jax.jit(make_grad_step(loss_fn_aux, has_aux=True))
            grad_fn_text = jax.jit(make_grad_step(text_loss_fn_aux, has_aux=True))
            apply_fn = jax.jit(make_accum_apply(optimizer), donate_argnums=(0,))
        acc_fn = jax.jit(tree_axpy, donate_argnums=(0,))
        scale_fn = jax.jit(tree_scale)

        # -- data order: shuffled, length/modality-grouped, dp×accum batches --
        from itertools import islice

        from ..utils.prefetch import prefetch_iter
        from .sampler import LengthGroupedSampler

        lengths = getattr(dataset, "modality_lengths", None)
        sampler = LengthGroupedSampler(
            len(dataset), batch_size=per_device,
            world_size=max(training_args.dp, 1) * accum,
            lengths=lengths, seed=training_args.seed,
            group_by_modality=lengths is not None,
        )

        def index_stream():
            epoch = 0
            while True:
                yield from sampler.epoch_indices(epoch)
                epoch += 1

        stream = index_stream()
        for _ in range(start_step * global_bs):  # resume: replay the order
            next(stream)
        n_samples_left = (total_steps - start_step) * global_bs
        sample_stream = prefetch_iter(
            dataset.__getitem__, islice(stream, n_samples_left),
            num_workers=getattr(data_args, "num_workers", 4),
            depth=max(2 * global_bs, 8),
        )

        batch_sharding = None
        if micro_bs > 1 or training_args.dp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(mesh, P("dp"))

        def put(batch):
            if batch_sharding is None:
                return batch
            return {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}

        from ..utils.metrics_writer import MetricsWriter

        metrics_log = MetricLogger()
        writer = MetricsWriter(os.path.join(training_args.output_dir, "logs"))
        t0 = time.time()
        for step in range(start_step, total_steps):
            batch_samples = [next(sample_stream) for _ in range(global_bs)]
            # modality-pure microbatches (the sampler already groups; this
            # guards the megabatch seams and mixed tails)
            text_s = [s for s in batch_samples if s.get("modal", "?") is None]
            media_s = [s for s in batch_samples if s.get("modal", "?") is not None]
            chunks = [
                ("text" if group is text_s else "media", group[c : c + micro_bs])
                for group in (media_s, text_s) if group
                for c in range(0, len(group), micro_bs)
            ]
            if len(chunks) == 1:
                kind, batch = make_microbatch(
                    chunks[0][1], cfg, state.params["vision"], stage, pad_to=micro_bs
                )
                fn = step_fn_text if kind == "text" else step_fn
                state, metrics = fn(state, put(batch))
            else:
                # weight each chunk's grads by its supervised-TOKEN count
                # (each chunk loss is a token mean, so token weighting makes
                # accumulation over unequal modality chunks exactly equal to
                # the global token mean of one unpadded combined batch)
                grad_sum, loss_sum, w_total = None, None, None
                for kind, chunk in chunks:
                    kind, batch = make_microbatch(
                        chunk, cfg, state.params["vision"], stage, pad_to=micro_bs
                    )
                    g = grad_fn_text if kind == "text" else grad_fn
                    (loss, w), grads = g(state.params, put(batch))
                    if grad_sum is None:
                        grad_sum = scale_fn(grads, w)
                        loss_sum = loss * w
                        w_total = w
                    else:
                        grad_sum = acc_fn(grad_sum, grads, w)
                        loss_sum = loss_sum + loss * w
                        w_total = w_total + w
                state, metrics = apply_fn(state, grad_sum, loss_sum, w_total)
            metrics_log.update(loss=float(metrics["loss"]),
                               grad_norm=float(metrics["grad_norm"]))
            if (step + 1) % training_args.logging_steps == 0:
                logger.info(
                    f"step {step+1}/{total_steps} {metrics_log} "
                    f"({(time.time()-t0)/(step-start_step+1):.2f}s/it)"
                )
                writer.write(step + 1, {
                    "train/loss": float(metrics["loss"]),
                    "train/grad_norm": float(metrics["grad_norm"]),
                })
            if (step + 1) % training_args.save_steps == 0 or step + 1 == total_steps:
                ckpt_params = jax.tree.map(np.asarray, state.params)
                if lora_scaling is not None:
                    # LoRA runs checkpoint only the trainables (the
                    # reference's lora + non_lora_trainables split)
                    ckpt_params = {
                        "lora": ckpt_params["lora"],
                        "projector": ckpt_params["projector"],
                    }
                path = save_checkpoint(
                    training_args.output_dir, step + 1,
                    ckpt_params,
                    adapter_only=(stage in ("cls", "adapter")),
                    keep=training_args.save_total_limit,
                    extra={"lora_only": lora_scaling is not None},
                )
                if stage not in ("cls", "adapter"):
                    save_opt_state(path, state.opt_state)
        writer.close()
    return state


if __name__ == "__main__":
    train()
