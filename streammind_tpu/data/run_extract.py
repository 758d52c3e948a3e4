"""Feature pre-extraction CLI — the reference's encode_video_ori.py run as a
rank-sliced sweep over the MatchTime tree.

  python -m streammind_tpu.data.run_extract \
      --vision-path clip-ckpt/ --data-path MatchTime/features_video \
      [--num-chunks N --chunk-idx K] [--restride-fps 2]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--vision-path", required=True,
                        help="CLIP checkpoint dir (HF naming) or 'random' for smoke runs")
    parser.add_argument("--data-path", required=True)
    parser.add_argument("--chunk-frames", type=int, default=500)
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--out-tag", default="features_video_encode")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ..config import VisionConfig
    from ..eval.mcqa import get_chunk
    from ..models.vit import init_vit_params, vit_forward
    from ..utils.params import cast_tree
    from .extract import extract_video_features
    from .matchtime import extract_video_half, find_half_videos

    cfg = VisionConfig()
    if args.vision_path == "random":
        params = init_vit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    else:
        from ..utils.convert import convert_clip_vision, load_state_dict

        params = convert_clip_vision(load_state_dict(args.vision_path), cfg)
    params = cast_tree(params, jnp.bfloat16)

    fwd = jax.jit(lambda px: vit_forward(params, cfg, px))

    def encode_fn(pixels: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(pixels), args.batch):
            blk = pixels[i : i + args.batch]
            pad = args.batch - len(blk)
            if pad:
                blk = np.concatenate([blk, np.zeros_like(blk[:1].repeat(pad, 0))])
            feats = np.asarray(fwd(jnp.asarray(blk, jnp.bfloat16)), np.float16)
            outs.append(feats[: len(pixels[i : i + args.batch])])
        return np.concatenate(outs)

    videos = get_chunk(find_half_videos(args.data_path), args.num_chunks, args.chunk_idx)
    total = 0
    for path in videos:
        shards = extract_video_features(
            path, encode_fn, extract_video_half(path), chunk=args.chunk_frames,
            out_tag=args.out_tag,
        )
        total += len(shards)
        print(f"[extract] {path}: {len(shards)} shards")
    print(json.dumps({"videos": len(videos), "shards": total}))


if __name__ == "__main__":
    main()
