#!/bin/bash
# Round-4 TPU queue 3: the REWRITTEN bf16 epilogue (f32 accumulate +
# bf16 bias/relu — Mosaic rejects bf16 matmul accumulators, see r4q2)
# and the forward fixed-cost decomposition.
#
# Stages:
#   mlp_fixed  4-point-count sweep + --raw kernel-only timing: fits the
#              ~0.76 ms/call fixed cost (r4q2: 1.21 ms @450k vs 1.65 ms
#              @900k) and attributes it to the layout wrapper vs the
#              kernel; measures the fixed bf16 epilogue on top.
#   epi_quality  20k shipped-defaults run with PALLAS_EPILOGUE=bf16
#              (rerun of the r4q2 stage that died on the Mosaic reject)
#              — only meaningful if mlp_fixed shows a fwd win.
# Usage: nohup bash tools/r4_queue3.sh > /tmp/r4_queue3.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

while ! grep -q "QUEUE r4q2 COMPLETE" /tmp/r4_queue2_status 2>/dev/null; do
  sleep 60
done

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r4_queue3_status
    sleep 120
    waited=$((waited + 210))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r4_queue3_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue3_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue3_status
  timeout "$tmo" "$@" > "/tmp/r4q3_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue3_status
}

stage mlp_fixed 2700 python tools/bench_mlp_tile.py \
    --tiles 6144,12288 --chains 2 --epilogues f32,bf16 \
    --points 225280,450560,901120,1802240 --raw
stage epi_quality 2700 env PALLAS_EPILOGUE=bf16 \
    python tools/quality_run.py --iters 20000 --seed 1 --tag r4-epilogue

echo "QUEUE r4q3 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue3_status
