#!/usr/bin/env bash
# MVBench MCQA (reference eval/inference_video_mcqa_mvbench.py +
# eval_video_mcqa_mvbench.py, launched per-chunk like the reference
# scripts/eval loops).  TPU work is serialized: chunks run one process at a
# time instead of the reference's per-GPU background jobs.
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <ckpt> <questions.json> <video-root> [chunks]}
QFILE=$2; VROOT=$3; CHUNKS=${4:-1}
OUT=${OUTPUT_DIR:-inference_result}/mvbench
mkdir -p "$OUT"
for IDX in $(seq 0 $((CHUNKS - 1))); do
  python -m streammind_tpu.eval.run_mcqa \
    --model-path "$CKPT" --benchmark mvbench \
    --question-file "$QFILE" --video-root "$VROOT" \
    --answer-file "$OUT/${CHUNKS}_${IDX}.jsonl" \
    --num-chunks "$CHUNKS" --chunk-idx "$IDX"
done
cat "$OUT/${CHUNKS}_"*.jsonl > "$OUT/merge.jsonl"
python -m streammind_tpu.eval.run_mcqa --score-only \
  --model-path "$CKPT" --benchmark mvbench \
  --question-file "$QFILE" --video-root "$VROOT" \
  --answer-file "$OUT/merge.jsonl"
