"""Real-weights smoke check: one command to validate a RELEASED checkpoint.

Everything else in this repo is proven against torch mirrors at tiny dims
(tests/test_convert.py, test_full_pipeline_parity.py) — but released tensors
have never flowed through utils/convert.py, because weights/network are
unavailable in the build environment.  The day a released StreamMind
checkpoint directory lands, validation is:

  python -m streammind_tpu.tools.real_weights_smoke --model-path /path/to/ckpt

which runs BASELINE.json configs 1-2 and prints fp32 deltas:

  1. Single frame -> CLIP ViT feature extract, checked against a torch
     CLIPVisionModel loaded from the SAME checkpoint tensors (layer -2,
     drop CLS — reference clip_encoder.py:18,31), then a one-turn caption.
  2. 8-frame offline video QA (x_infer mode='openend'): decoder prefill
     logits checked against a torch MistralForCausalLM built from the same
     tensors, then the generated answer + per-stage wall times.

Exit code is non-zero when any delta exceeds --tol (default 2e-4 rms),
so this doubles as a CI gate once weights are present.  Works at tiny dims
too (tests/test_real_weights_smoke.py drives it on a synthetic checkpoint).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _rms(a, b) -> float:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    denom = float(np.sqrt(np.mean(b * b))) or 1.0
    return float(np.sqrt(np.mean((a - b) ** 2))) / denom


def _load_sd(model_path: str, base_path=None) -> dict:
    from ..utils.convert import load_state_dict

    sd = load_state_dict(model_path)
    if base_path:
        base = load_state_dict(base_path)
        base.update(sd)
        sd = base
    return sd


def check_vision(model, sd, pixels) -> float:
    """Our fp32 ViT features vs torch CLIPVisionModel on the same tensors."""
    import jax.numpy as jnp
    import torch
    import transformers

    from ..models.vit import vit_forward

    v = model.cfg.vision
    conf = transformers.CLIPVisionConfig(
        hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
        num_hidden_layers=v.num_layers, num_attention_heads=v.num_heads,
        image_size=v.image_size, patch_size=v.patch_size,
        attn_implementation="eager",
    )
    mirror = transformers.CLIPVisionModel(conf).eval()
    vision_sd = {
        k[len("model.vision_tower.vision_tower."):]: torch.as_tensor(np.asarray(t))
        for k, t in sd.items()
        if k.startswith("model.vision_tower.vision_tower.")
    }
    missing, unexpected = mirror.load_state_dict(vision_sd, strict=False)
    # position_ids buffers etc. are expected misses; real weights are not
    real_missing = [k for k in missing if "position_ids" not in k]
    if real_missing or unexpected:
        print(f"[vision] mirror load: missing={real_missing} "
              f"unexpected={list(unexpected)}")
    with torch.no_grad():
        hs = mirror(torch.tensor(pixels), output_hidden_states=True).hidden_states
    ref = hs[v.select_layer][:, 1:].numpy()
    ours = vit_forward(model.params["vision"], v, jnp.asarray(pixels))
    return _rms(ours, ref)


def check_decoder(model, sd, token_ids) -> float:
    """Our fp32 prefill logits vs torch MistralForCausalLM."""
    import jax.numpy as jnp
    import torch
    import transformers

    from ..models import mistral as lm

    t = model.cfg.text
    if t.num_experts > 1:
        print("[decoder] mixtral mirror not wired in the smoke tool; "
              "skipping logits delta (projector/vision deltas still run)")
        return 0.0
    conf = transformers.MistralConfig(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size, num_hidden_layers=t.num_layers,
        num_attention_heads=t.num_heads, num_key_value_heads=t.num_kv_heads,
        head_dim=t.head_dim, rope_theta=t.rope_theta,
        rms_norm_eps=t.rms_norm_eps,
        max_position_embeddings=t.max_position_embeddings,
        attn_implementation="eager", tie_word_embeddings=t.tie_word_embeddings,
    )
    mirror = transformers.MistralForCausalLM(conf).eval()
    text_sd = {
        k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
        if (k.startswith("model.")
            and not k.startswith(("model.mm_projector", "model.vision_tower")))
        or k.startswith("lm_head")
    }
    missing, unexpected = mirror.load_state_dict(text_sd, strict=False)
    real_missing = [k for k in missing if "rotary_emb" not in k]
    if real_missing or unexpected:
        print(f"[decoder] mirror load: missing={real_missing[:4]}... "
              f"unexpected={list(unexpected)[:4]}")
    ids = np.asarray(token_ids, np.int64)[None]
    with torch.no_grad():
        ref = mirror(torch.tensor(ids)).logits.numpy()[0]
    ours, _ = lm.text_forward(
        model.params["text"], t, input_ids=jnp.asarray(ids, jnp.int32)
    )
    return _rms(np.asarray(ours)[0], ref)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True,
                        help="released checkpoint directory")
    parser.add_argument("--model-base", default=None,
                        help="base decoder dir for LoRA / projector-only "
                             "checkpoints (the reference --model-base)")
    parser.add_argument("--video", default=None,
                        help="optional video file for config 2 (synthetic "
                             "frames when omitted)")
    parser.add_argument("--tol", type=float, default=2e-4,
                        help="max relative-rms delta vs the torch mirrors")
    parser.add_argument("--max-new-tokens", type=int, default=32)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from ..api import infer, model_init, x_infer

    t0 = time.time()
    model, processor, tokenizer, version = model_init(
        args.model_path, dtype=jnp.float32, model_base=args.model_base
    )
    print(f"[load] {args.model_path} converted in {time.time() - t0:.1f}s "
          f"(fp32, version={version})")
    sd = _load_sd(args.model_path, args.model_base)

    rng = np.random.default_rng(0)
    size = model.cfg.vision.image_size
    deltas = {}

    # -- config 1: single frame -> ViT features + one-turn caption ----------
    pixels = rng.standard_normal((1, 3, size, size)).astype(np.float32)
    if any(k.startswith("model.vision_tower.") for k in sd):
        t0 = time.time()
        deltas["vit_feature_rms"] = check_vision(model, sd, pixels)
        print(f"[config1] ViT fp32 feature rms delta "
              f"{deltas['vit_feature_rms']:.2e} ({time.time() - t0:.1f}s)")
    else:
        print("[config1] checkpoint carries no vision tower; ViT delta "
              "skipped (pass a full-SFT dir to check it)")
    if tokenizer is not None:
        t0 = time.time()
        caption = infer(model, pixels, "Describe the image.", tokenizer,
                        version=version,
                        max_new_tokens=args.max_new_tokens)
        print(f"[config1] caption ({time.time() - t0:.1f}s): {caption!r}")

    # -- config 2: decoder logits parity + 8-frame video QA -----------------
    prompt_ids = list(range(1, 17))
    t0 = time.time()
    deltas["decoder_logits_rms"] = check_decoder(model, sd, prompt_ids)
    print(f"[config2] decoder fp32 prefill-logits rms delta "
          f"{deltas['decoder_logits_rms']:.2e} ({time.time() - t0:.1f}s)")
    if tokenizer is not None:
        if args.video:
            video = processor(args.video)
        else:
            video = rng.standard_normal((8, 3, size, size)).astype(np.float32)
        t0 = time.time()
        answer = x_infer(video, "What is happening in this video?", model,
                         tokenizer, mode="openend", version=version)
        print(f"[config2] 8-frame QA ({time.time() - t0:.1f}s): {answer!r}")
    else:
        print("[config2] no tokenizer in the checkpoint dir; QA turn skipped")

    print(json.dumps({"deltas": deltas, "tol": args.tol}))
    failed = {k: v for k, v in deltas.items() if v > args.tol}
    if failed:
        print(f"FAIL: deltas over tol: {failed}", file=sys.stderr)
        return 1
    print("OK: all deltas within tol")
    return 0


if __name__ == "__main__":
    sys.exit(main())
