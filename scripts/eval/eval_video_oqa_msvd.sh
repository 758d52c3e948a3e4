#!/usr/bin/env bash
# MSVD open-ended QA + GPT judge (reference
# scripts/eval/eval_video_oqa_vcgpt_msvd_streammind.sh →
# eval/inference_video_oqa_vcgpt_msvd.py + eval_video_oqa_vcgpt_streammind_msvd.py).
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <ckpt> <questions.json> <video-root> [chunks]}
QFILE=$2; VROOT=$3; CHUNKS=${4:-1}
OUT=${OUTPUT_DIR:-inference_result}/msvd
mkdir -p "$OUT"
for IDX in $(seq 0 $((CHUNKS - 1))); do
  python -m streammind_tpu.eval.run_oqa \
    --model-path "$CKPT" \
    --question-file "$QFILE" --video-root "$VROOT" \
    --answer-file "$OUT/${CHUNKS}_${IDX}.jsonl" \
    --num-chunks "$CHUNKS" --chunk-idx "$IDX"
done
cat "$OUT/${CHUNKS}_"*.jsonl > "$OUT/merge.jsonl"
if [ -n "${OPENAI_API_KEY:-}${AZURE_OPENAI_ENDPOINT:-}" ]; then
  python -m streammind_tpu.eval.run_oqa --judge-only \
    --answer-file "$OUT/merge.jsonl" \
    --judge-dim generic --judge-dir "$OUT/judge"
else
  echo "[msvd] no OPENAI_API_KEY / AZURE_OPENAI_ENDPOINT: judge skipped" >&2
fi
