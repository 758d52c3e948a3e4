#!/usr/bin/env bash
# Stage 2 (gate) launch — reference scripts/custom/finetune_stage2.sh rebuilt.
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m streammind_tpu.train.run --config scripts/custom/finetune_stage2.json "$@"
