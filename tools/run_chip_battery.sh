#!/bin/bash
# Round-5 measurement battery — run SOLO on the tunneled TPU.
# Serializes every experiment (two processes on the chip corrupt results)
# and logs each to _chip_r5_results/.  Order: cheap/short first so a
# mid-battery outage still leaves the high-value records.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p _chip_r5_results
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TIMEOUT" "$@" 2>&1 | tee "_chip_r5_results/$name.log"
  echo "rc=${PIPESTATUS[0]} $name" | tee -a _chip_r5_results/battery.status
}
TIMEOUT=1800 run perceive   python tools/chip_r5.py perceive
TIMEOUT=1200 run stages     python tools/chip_r5.py stages
TIMEOUT=1800 run vitattn    python tools/chip_r5.py vitattn
TIMEOUT=1800 run scaling    python tools/chip_r5.py scaling
TIMEOUT=3600 run sweep      python _sweep_unroll.py 8 4pc
TIMEOUT=1800 run latency    python bench_latency.py
TIMEOUT=3600 run bench      python bench.py
TIMEOUT=3600 run paged      env PAGED_BENCH_K=4 python bench_paged_serving.py
echo "battery done"
