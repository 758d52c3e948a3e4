#!/usr/bin/env bash
# MatchTime streaming-gate F1 (reference scripts/eval/evaluation.sh soccer path).
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <checkpoint-dir> <features_video-root> [chunks] [idx]}
DATA=${2:?}
python -m streammind_tpu.eval.run_gate_stream \
  --model-path "$CKPT" --data-path "$DATA" \
  --num-chunks "${3:-1}" --chunk-idx "${4:-0}" \
  --output inference_result/gate_stream.json
