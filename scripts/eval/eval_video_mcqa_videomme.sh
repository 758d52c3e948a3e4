#!/usr/bin/env bash
# VideoMME MCQA (reference scripts/eval/eval_video_mcqa_videomme.sh):
# one chunk per process; merge + score with --score-only afterwards.
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <ckpt> <questions.json> <video-root> [chunks] [idx]}
python -m streammind_tpu.eval.run_mcqa \
  --model-path "$CKPT" --benchmark videomme \
  --question-file "$2" --video-root "$3" \
  --answer-file "inference_result/videomme_${5:-0}.jsonl" \
  --num-chunks "${4:-1}" --chunk-idx "${5:-0}"
