#!/usr/bin/env bash
# EgoSchema MCQA (reference eval/inference_video_mcqa_egoschema.py; the
# reference scores via the Kaggle leaderboard CSV — here the local scorer
# runs when the question file carries answers).
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: $0 <ckpt> <questions.json> <video-root> [chunks]}
QFILE=$2; VROOT=$3; CHUNKS=${4:-1}
OUT=${OUTPUT_DIR:-inference_result}/egoschema
mkdir -p "$OUT"
for IDX in $(seq 0 $((CHUNKS - 1))); do
  python -m streammind_tpu.eval.run_mcqa \
    --model-path "$CKPT" --benchmark egoschema \
    --question-file "$QFILE" --video-root "$VROOT" \
    --answer-file "$OUT/${CHUNKS}_${IDX}.jsonl" \
    --num-chunks "$CHUNKS" --chunk-idx "$IDX"
done
cat "$OUT/${CHUNKS}_"*.jsonl > "$OUT/merge.jsonl"
python -m streammind_tpu.eval.run_mcqa --score-only \
  --model-path "$CKPT" --benchmark egoschema \
  --question-file "$QFILE" --video-root "$VROOT" \
  --answer-file "$OUT/merge.jsonl"
