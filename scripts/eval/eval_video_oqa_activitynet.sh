#!/usr/bin/env bash
# ActivityNet open-ended QA + GPT judge (reference
# scripts/eval/eval_video_oqa_vcgpt_activitynet_streamMind.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <ckpt> <questions.json> <video-root>}
python -m streammind_tpu.eval.run_oqa \
  --model-path "$CKPT" --question-file "$2" --video-root "$3" \
  --answer-file inference_result/activitynet.jsonl
python -m streammind_tpu.eval.run_oqa --judge-only \
  --answer-file inference_result/activitynet.jsonl \
  --judge-dim generic --judge-dir inference_result/activitynet_judge
