#!/bin/bash
# Round-3 follow-up TPU queue (run AFTER tools/r3_queue.sh completes):
# measurements for the levers built while the tunnel was down.
#
# Stages:
#   1. two-bucket hybrid march bench (BENCH_HYBRID_SPLIT=0.75) vs the
#      single-bucket headline — the largest modeled lever (~0.55-0.8x
#      fine probes, benchmarks/MFU.md "two-bucket span-sorted hybrid")
#   2. k-margin price check (BENCH_K_MARGIN=1.0 vs default 1.15)
#   3. compaction variant micro-bench (bf16 / int16 compare keys)
#   4. quality gate for whichever of 1/2 wins: 20k-iter run with the
#      winning settings; held-out PSNR must match the QUALITY.md protocol
#
# Usage: nohup bash tools/r3_queue2.sh > /tmp/r3_queue2.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}

wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue2_status
    sleep 120
    waited=$((waited + 195))
    if [ "$waited" -gt 28800 ]; then
      echo "[$1] tunnel down >8h; giving up queue" | tee -a /tmp/r3_queue2_status
      exit 1
    fi
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue2_status
}

stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue2_status
  timeout "$tmo" "$@" > "/tmp/r3q2_${name}.log" 2>&1
  local rc=$?
  echo "=== STAGE $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue2_status
}

stage march_h2 1800 python tools/bench_march.py
stage hybrid2 900 env BENCH_HYBRID_SPLIT=0.75 python bench.py
stage kmargin 900 env BENCH_K_MARGIN=1.0 python bench.py
stage compaction 1200 python tools/bench_compaction.py
stage quality_h2 2400 python tools/quality_run.py --iters 20000 --seed 0 \
    --sampling overdraw --carve --engage_max 192 --hybrid_split 0.75
echo "QUEUE2 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue2_status
