#!/bin/bash
# Round-3 TPU queue (session 6b): disambiguate the hybrid2k quality
# regression. Queue8 gates: forced hybrid2k loses 2.4/5.7 dB held-out vs
# the window-choosing carve control at seeds 2/3 (seed1 -2.17, seed0
# +0.50). Arm A here forces SINGLE-BUCKET hybrid (no split, no k_lo) at
# the same seeds: if it also loses ~2 dB, the hybrid march itself (k
# truncation / stride-2 probing at carve-converged grids) is the cost
# and hybrid2k is exonerated relative to it; if it matches window
# (~46 dB), the two-bucket w_lo/k_lo truncation is the defect.
# Usage: nohup bash tools/r3_queue9.sh > /tmp/r3_queue9.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue9_status
    sleep 120
    waited=$((waited + 195))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue9_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue9_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue9_status
  timeout "$tmo" "$@" > "/tmp/r3q9_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue9_status
}

for s in 2 3; do
  stage hyb1_s$s 2400 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192 --march hybrid
done
echo "QUEUE9 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue9_status
