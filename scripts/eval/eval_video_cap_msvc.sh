#!/usr/bin/env bash
# MSVC multi-sentence captioning + the two GPT judges (reference
# eval/inference_video_cap_msvc.py, eval_video_cap_msvc_correctness.py,
# eval_video_cap_msvc_detailedness.py).  The judge passes need
# OPENAI_API_KEY / AZURE_OPENAI_* (eval/gpt_judge.py) and are skipped when
# neither is set.
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <ckpt> <questions.json> <video-root> [chunks]}
QFILE=$2; VROOT=$3; CHUNKS=${4:-1}
OUT=${OUTPUT_DIR:-inference_result}/msvc
mkdir -p "$OUT"
for IDX in $(seq 0 $((CHUNKS - 1))); do
  python -m streammind_tpu.eval.run_oqa \
    --model-path "$CKPT" --captioning \
    --question-file "$QFILE" --video-root "$VROOT" \
    --answer-file "$OUT/${CHUNKS}_${IDX}.jsonl" \
    --num-chunks "$CHUNKS" --chunk-idx "$IDX"
done
cat "$OUT/${CHUNKS}_"*.jsonl > "$OUT/merge.jsonl"
if [ -n "${OPENAI_API_KEY:-}${AZURE_OPENAI_ENDPOINT:-}" ]; then
  for DIM in msvc_correctness msvc_detailedness; do
    python -m streammind_tpu.eval.run_oqa --judge-only \
      --answer-file "$OUT/merge.jsonl" \
      --judge-dim "$DIM" --judge-dir "$OUT/judge_$DIM"
  done
else
  echo "[msvc] no OPENAI_API_KEY / AZURE_OPENAI_ENDPOINT: judges skipped" >&2
fi
