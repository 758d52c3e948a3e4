"""Public inference API — mirrors the reference surface
(/root/reference/streammind/__init__.py:14-117):

  model_init(model_path) -> (model, processor, tokenizer, version)
  infer(model, video, instruct, tokenizer, ...) -> str
  x_infer(video, question, model, tokenizer, mode=...) -> str

`model` here is a StreamMindModel bundle (params + config + engine) rather
than a torch nn.Module; everything else keeps the same call shapes so eval
scripts port 1:1.
"""
from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import StreamMindConfig
from .constants import DEFAULT_MMODAL_TOKEN, MMODAL_TOKEN_INDEX, NUM_FRAMES
from .conversation import SeparatorStyle, conv_templates
from .mm_utils import (
    get_model_name_from_path,
    process_video,
    tokenizer_multimodal_token,
    trim_at_stop_strings,
)
from .models import projector as proj_mod
from .models.meta import build_splice_plan, bucket_length, encode_frames, init_streammind_params
from .streaming.engine import StreamMindEngine, StreamSession


@dataclasses.dataclass
class StreamMindModel:
    """Loaded model bundle: params on device + config + compiled engine."""

    params: dict
    cfg: StreamMindConfig
    engine: StreamMindEngine
    model_path: str = ""

    def new_session(self, tokenizer, **kw) -> StreamSession:
        return StreamSession(self.engine, tokenizer, **kw)


def _load_config(model_path: str) -> StreamMindConfig:
    p = os.path.join(model_path, "streammind_config.json")
    if os.path.exists(p):
        with open(p) as f:
            return StreamMindConfig.from_json(f.read())
    # HF-layout checkpoint: derive the decoder config from config.json the way
    # the reference builds from cfg_pretrained (builder.py:124-129) — picks
    # the mistral/mixtral/qwen2 branch from model_type.
    p = os.path.join(model_path, "config.json")
    if os.path.exists(p):
        from .config import text_config_from_hf

        with open(p) as f:
            raw = json.load(f)
        cfg = StreamMindConfig()
        text = text_config_from_hf(raw)
        return cfg.replace(
            text=text,
            gate=dataclasses.replace(
                cfg.gate, hidden_size=text.hidden_size,
                head_dim=text.hidden_size // cfg.gate.num_heads,
            ),
        )
    return StreamMindConfig()


def model_init(
    model_path: Optional[str] = None,
    model_name: Optional[str] = None,  # None → derive from model_path
    cfg: Optional[StreamMindConfig] = None,
    dtype=jnp.bfloat16,
    params: Optional[dict] = None,
    tokenizer=None,
    seed: int = 0,
    quantize_gate: bool = False,
    fast_vision=False,  # False | True (bf16 softmax) | "int8" (int8-MXU ViT)
    load_8bit: bool = False,
    load_4bit: bool = False,
    model_base: Optional[str] = None,  # base decoder dir for LoRA /
    # base+mm_projector.bin checkpoints (the reference's --model-base,
    # model/builder.py:60-142)
    vit_attn: str = "auto",  # ViT attention impl: auto (fp32-softmax jnp
    # reference) | exact (Pallas VMEM-resident full-row fp32 softmax — the
    # reference's reduction structure with none of its S^2 HBM traffic)
    # | flash (Pallas online softmax, fp32 accumulation) | bf16
):
    """Load (or randomly initialize, for tests) a StreamMind model.

    Returns (model, processor, tokenizer, version) like the reference's
    model_init (+version as in eval scripts' 4-tuple variant).
    """
    model_name = model_name or get_model_name_from_path(model_path or "StreamMind-7B")
    if cfg is None:
        cfg = _load_config(model_path) if model_path else StreamMindConfig()

    if params is None:
        if model_path:
            if not os.path.isdir(model_path):
                raise FileNotFoundError(
                    f"model_path {model_path!r} is not a local checkpoint "
                    "directory — refusing to silently fall back to random "
                    "weights; pass params=/cfg= explicitly for scratch models"
                )
            from .utils.convert import convert_streammind_checkpoint

            params = convert_streammind_checkpoint(
                model_path, cfg, dtype, base_path=model_base
            )
            missing = {"vision", "projector", "text"} - set(params)
            if missing:
                import warnings

                warnings.warn(
                    f"checkpoint {model_path} lacks {sorted(missing)}; those "
                    "components are randomly initialized"
                )
                init = init_streammind_params(jax.random.PRNGKey(seed), cfg, dtype)
                for k in missing:
                    params[k] = init[k]
        else:
            params = init_streammind_params(jax.random.PRNGKey(seed), cfg, dtype)

    if tokenizer is None and model_path:
        try:
            import transformers

            tokenizer = transformers.AutoTokenizer.from_pretrained(model_path)
            if tokenizer.unk_token is not None:
                tokenizer.pad_token = tokenizer.unk_token
        except Exception:
            tokenizer = None

    if load_8bit or load_4bit:
        # quantized decoder loading — the reference's load_8bit/load_4bit
        # bitsandbytes flags (model/builder.py:43-52): the 7B text tower
        # rests at int8 (per-channel) or packed int4 (group-64).
        # load_4bit="pc" selects the int4 decode SPEED tier instead:
        # per-channel scales + the column-halved pack the fused Pallas
        # matvec consumes (utils/quantize.py quantize_text_params scheme)
        from .utils.quantize import quantize_text_params

        params = dict(params)
        params["text"] = quantize_text_params(
            params["text"], bits=4 if load_4bit else 8, free_source=True,
            scheme="pc" if load_4bit == "pc" else "group",
        )

    eos_id = getattr(tokenizer, "eos_token_id", None) if tokenizer else None
    if eos_id is None:  # `or 2` would remap a legitimate eos_token_id of 0
        eos_id = 2
    engine = StreamMindEngine(
        params, cfg, eos_token_id=eos_id,
        quantize_gate=quantize_gate, fast_vision=fast_vision,
        attn_impl=vit_attn,
    )
    # the bundle shares the ENGINE's param tree (qkv-fused vision, any
    # serving-tier quantization applied): keeping the pre-transform tree
    # here would leave both the fused and unfused encoder projections
    # resident on device for the worker's lifetime (ADVICE r4).
    # vit_forward handles the fused layout transparently.
    model = StreamMindModel(params=engine.params, cfg=cfg, engine=engine,
                            model_path=model_path or "")

    if "vicuna" in model_name.lower():
        version = "v1"
    elif "qwen" in model_name.lower():
        # qwen1.5/qwen2 (reference __init__.py:27-29; we also supply the
        # ChatML template the reference's conv table is missing)
        version = "qwen"
    else:
        version = "llama_2"
    processor = partial(process_video, num_frames=cfg.num_frames or NUM_FRAMES,
                        aspect_ratio=None, image_size=cfg.vision.image_size)
    return model, processor, tokenizer, version


def _prepare_cognition_inputs(model: StreamMindModel, video, instruct: str,
                              tokenizer, version: str, history=None,
                              sample_type: str = "all",
                              sample_per: float = 0.5):
    """Shared front half of infer/infer_beams: prompt → splice plan +
    memory ring buffer (keeps the 600-frame cap / bucket / sizing logic in
    one place).  history: [(user, assistant), ...] prior turns; the <video>
    token is attached to the FIRST user turn only.  sample_type/sample_per:
    memory-token subsampling before the splice (reference stream kwargs,
    videollama2_mistral.py:166-167 → videollama2_arch.py:676-681)."""
    cfg, engine = model.cfg, model.engine
    modal_index = MMODAL_TOKEN_INDEX["VIDEO"]
    conv = conv_templates["mistral_instruct" if version == "llama_2" else version].copy()
    turns = list(history or []) + [(instruct, None)]
    for i, (user, assistant) in enumerate(turns):
        text = (DEFAULT_MMODAL_TOKEN["VIDEO"] + "\n" + user) if i == 0 else user
        conv.append_message(conv.roles[0], text)
        conv.append_message(conv.roles[1], assistant)
    input_ids = tokenizer_multimodal_token(conv.get_prompt(), tokenizer, modal_index)

    pixels = jnp.asarray(np.asarray(video), engine_dtype(model))
    feats = encode_frames(model.params, cfg, pixels)
    # projector-generic (mamba → per-frame tokens; linear/mlp/STC → their
    # own counts): the plan below sizes the modal span from memory.shape[1]
    memory = proj_mod.project_memory(model.params["projector"], cfg, feats)
    if sample_type not in (None, "all") and memory.shape[1] > 1:
        from .streaming.memory_subsample import subsample_span_indices

        values = (np.asarray(memory[0]) if sample_type == "similarity"
                  else None)
        idx = subsample_span_indices(
            memory.shape[1], sample_type, sample_per, values
        )
        memory = memory[:, jnp.asarray(idx), :]
    T = memory.shape[1]
    plan = build_splice_plan(
        input_ids, [T], modal_index,
        bucket_length(len(input_ids) - 1 + T, engine.buckets),
    )
    mem_buf = jnp.zeros((1, max(cfg.max_stream_frames, T), memory.shape[-1]), memory.dtype)
    mem_buf = jax.lax.dynamic_update_slice(mem_buf, memory, (0, 0, 0))
    return plan, mem_buf


def infer(
    model: StreamMindModel,
    video,
    instruct: str,
    tokenizer,
    do_sample: bool = False,
    version: str = "llama_2",
    max_new_tokens: int = 1024,
    seed: int = 0,
    temperature: Optional[float] = None,
    top_k: int = 0,
    top_p: float = 0.0,
    history=None,
    sample_type: str = "all",
    sample_per: float = 0.5,
):
    """Offline video QA: encode all frames → Mamba memory tokens → splice →
    prefill + decode.  video: (T, 3, H, W) array of CLIP pixel values.
    history: prior (user, assistant) turns for multi-turn chat.
    top_k/top_p: sampling filters applied when temperature > 0 (the
    reference decode engine's filter set, generation.py:37-119)."""
    engine = model.engine
    plan, mem_buf = _prepare_cognition_inputs(
        model, video, instruct, tokenizer, version, history=history,
        sample_type=sample_type, sample_per=sample_per,
    )

    if temperature is None:
        temperature = 0.2 if do_sample else 0.0
    # one-shot: right-size the cache — dense decode attention reads the
    # whole ring per step (30 ms/token at the 8192 session default vs
    # 12 at 1024, 7B int8)
    cache = engine.new_kv_cache(
        dtype=mem_buf.dtype,
        capacity=engine.cache_capacity_for(len(plan.token_ids), max_new_tokens),
    )
    last, cache = engine.prefill(plan, mem_buf, cache)
    from .streaming.engine import stop_id_matrix

    tokens, _ = engine.generate_from_prefill(
        last, cache, max_new_tokens=max_new_tokens,
        temperature=temperature, top_k=top_k, top_p=top_p,
        rng_key=jax.random.PRNGKey(seed),
        # in-decode stop at the template separator (the reference's
        # KeywordsStoppingCriteria) — saves the wasted decode steps when
        # the model emits the separator without EOS; text is still trimmed
        # host-side below
        stop_ids=stop_id_matrix(tokenizer, _stop_strings(version)),
    )
    if not hasattr(tokenizer, "decode"):
        return ""
    try:
        text = tokenizer.decode(tokens, skip_special_tokens=True).strip()
    except TypeError:  # minimal tokenizers without the HF kwarg
        text = tokenizer.decode(tokens).strip()
    return trim_at_stop_strings(text, _stop_strings(version))


def infer_beams(
    model: StreamMindModel,
    video,
    instruct: str,
    tokenizer,
    num_beams: int = 5,
    num_return_sequences: int = 5,
    max_new_tokens: int = 512,
    version: str = "llama_2",
):
    """Beam-search inference returning K candidate texts (the reference LTA
    eval's generate(num_beams=5, num_return_sequences=5))."""
    engine = model.engine
    plan, mem_buf = _prepare_cognition_inputs(model, video, instruct, tokenizer, version)
    beams = engine.beam_generate(
        plan, mem_buf, num_beams=num_beams,
        num_return_sequences=num_return_sequences,
        max_new_tokens=max_new_tokens, kv_dtype=mem_buf.dtype,
    )
    out = []
    for tokens, _score in beams:
        try:
            text = tokenizer.decode(tokens, skip_special_tokens=True).strip()
        except TypeError:
            text = tokenizer.decode(tokens).strip()
        out.append(trim_at_stop_strings(text, _stop_strings(version)))
    return out


def _stop_strings(version: str) -> list:
    """Template separator to trim from decoded text — the reference's
    KeywordsStoppingCriteria keyword choice (eval scripts: conv.sep for
    SINGLE/MPT styles, conv.sep2 otherwise).  qwen's <|im_end|> is often not
    a tokenizer special token, so text-level trimming is load-bearing there."""
    conv = conv_templates.get(version)
    if conv is None:
        return []
    if conv.sep_style in (SeparatorStyle.SINGLE, SeparatorStyle.MPT):
        stop = conv.sep.strip()
    else:
        stop = conv.sep2
    return [stop] if stop else []


def engine_dtype(model: StreamMindModel):
    from .streaming.engine import _float_dtype

    return _float_dtype(model.params["vision"])


def x_infer(video, question, model, tokenizer, mode: str = "vanilla",
            do_sample: bool = False, version: str = "llama_2"):
    """Benchmark-mode wrapper (reference x_infer, __init__.py:94-117)."""
    if mode == "mcqa":
        instruction = (
            f"{question}\nAnswer with the option's letter from the given "
            f"choices directly and only give the best option."
        )
    elif mode == "openend":
        instruction = (
            f"{question}\nAnswer the question using a single word or a short "
            f"phrase with multiple words."
        )
    elif mode == "vanilla":
        instruction = question
    else:
        raise ValueError(f"unknown x_infer mode: {mode}")
    return infer(model=model, tokenizer=tokenizer, video=video,
                 instruct=instruction, do_sample=do_sample, version=version)
