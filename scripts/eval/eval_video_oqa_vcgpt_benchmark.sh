#!/usr/bin/env bash
# Video-ChatGPT 5-dimension benchmark (reference
# eval/inference_video_oqa_vcgpt_general.py + _consistency.py and the five
# eval_video_oqa_vcgpt_{1_correctness,...,5_consistency}.py judges).
#
# Three question files drive three inference passes — general (scored on
# correctness / detailed orientation / context), temporal, and consistency
# (paired question_1/question_2 per record; run_oqa emits pred+pred2).
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <ckpt> <general_q.json> <temporal_q.json> <consistency_q.json> <video-root> [chunks]}
GEN=$2; TEMP=$3; CONS=$4; VROOT=$5; CHUNKS=${6:-1}
OUT=${OUTPUT_DIR:-inference_result}/vcgpt
mkdir -p "$OUT"

run_pass() { # name question-file
  local name=$1 qfile=$2 idx
  for idx in $(seq 0 $((CHUNKS - 1))); do
    python -m streammind_tpu.eval.run_oqa \
      --model-path "$CKPT" \
      --question-file "$qfile" --video-root "$VROOT" \
      --answer-file "$OUT/${name}_${CHUNKS}_${idx}.jsonl" \
      --num-chunks "$CHUNKS" --chunk-idx "$idx"
  done
  cat "$OUT/${name}_${CHUNKS}_"*.jsonl > "$OUT/${name}_merge.jsonl"
}

run_pass general "$GEN"
run_pass temporal "$TEMP"
run_pass consistency "$CONS"

if [ -n "${OPENAI_API_KEY:-}${AZURE_OPENAI_ENDPOINT:-}" ]; then
  for DIM in correctness detail context; do
    python -m streammind_tpu.eval.run_oqa --judge-only \
      --answer-file "$OUT/general_merge.jsonl" \
      --judge-dim "$DIM" --judge-dir "$OUT/judge_$DIM"
  done
  python -m streammind_tpu.eval.run_oqa --judge-only \
    --answer-file "$OUT/temporal_merge.jsonl" \
    --judge-dim temporal --judge-dir "$OUT/judge_temporal"
  python -m streammind_tpu.eval.run_oqa --judge-only \
    --answer-file "$OUT/consistency_merge.jsonl" \
    --judge-dim consistency --judge-dir "$OUT/judge_consistency"
else
  echo "[vcgpt] no OPENAI_API_KEY / AZURE_OPENAI_ENDPOINT: judges skipped" >&2
fi
