#!/bin/bash
# Pending round-3 TPU measurements (ROADMAP.md item 8) — run when the axon
# tunnel is back. Sequenced to share the chip politely (one job at a time;
# the remote compile queue serializes and killing a client mid-compile
# wedges it — see ROADMAP environment notes).
#
# Usage:  bash scripts/run_pending_tpu_measurements.sh
# Output: /tmp/pending_{probe,int8_2m,serving_int8,bench}.log
set -u
cd "$(dirname "$0")/.."

echo "== 1/4 probe the chip (bounded) =="
timeout 180 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee /tmp/pending_probe.log
if ! grep -q "TPU" /tmp/pending_probe.log; then
    echo "tunnel still down — aborting"; exit 1
fi

echo "== 2/4 int8 dense at 2M x 768 (4x HBM-capacity demo; H2D ~10 min) =="
timeout 3000 python scripts/bench_dense_int8.py --n 2000000 --q 256,1024 \
    > /tmp/pending_int8_2m.log 2>&1
tail -3 /tmp/pending_int8_2m.log

echo "== 3/4 serving bench, int8 profile at the production shape =="
timeout 3000 python scripts/bench_serving.py --docs 500000 --dim 768 \
    --clients 32 --requests 960 --profile int8 \
    > /tmp/pending_serving_int8.log 2>&1
tail -3 /tmp/pending_serving_int8.log

echo "== 4/4 bench.py sanity (flagship metric) =="
timeout 1200 python bench.py > /tmp/pending_bench.log 2>&1
tail -2 /tmp/pending_bench.log

echo "done — record results in docs/BENCHMARKS.md + CLAUDE.md, then delete"
echo "ROADMAP.md item 8 and this script."
