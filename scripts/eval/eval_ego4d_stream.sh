#!/usr/bin/env bash
# Ego4D streaming eval: --eval-type llm (PPL/fluency) or cls (gate TimeDiff).
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <ckpt> <video-root> <annos.json> [llm|cls]}
python -m streammind_tpu.eval.run_ego4d_stream \
  --model-path "$CKPT" --video-root "$2" --anno-path "$3" \
  --eval-type "${4:-llm}" --caption-path inference_result/ego4d_captions.csv
