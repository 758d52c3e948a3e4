#!/usr/bin/env bash
# Stage 1 (LLM) launch — reference scripts/custom/finetune_stage1.sh rebuilt
# for the JAX stack: no torchrun/DeepSpeed; sharding comes from the
# dp/fsdp/tp mesh in the config (ZeRO-3 == fsdp axis).
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m streammind_tpu.train.run --config scripts/custom/finetune_stage1.json "$@"
