#!/bin/bash
# Round-3 TPU queue (session 5c): hybrid2k (per-bucket-k march) 20k-iter
# quality gate — benches at 1.465M rays/s (3.84 ms step) vs 1.286M
# baseline; flip the default only if held-out PSNR matches the 45.6 dB
# carve protocol. Plus a combined gate with the production carve config.
# Waits for queue5. Usage: nohup bash tools/r3_queue6.sh > /tmp/r3_queue6.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
if [ -f /tmp/r3q5.pid ]; then
  while kill -0 "$(cat /tmp/r3q5.pid)" 2>/dev/null; do sleep 60; done
fi
probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue6_status
    sleep 120
    waited=$((waited + 195))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue6_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue6_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue6_status
  timeout "$tmo" "$@" > "/tmp/r3q6_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue6_status
}

stage bucketk_q 3600 python tools/quality_run.py --iters 20000 --seed 0 \
    --sampling overdraw --carve --engage_max 192 --march hybrid --hybrid_split 0.75 \
    --hybrid_bucket_k --repeat 2
stage bucketk_q_s1 3600 python tools/quality_run.py --iters 20000 --seed 1 \
    --sampling overdraw --carve --engage_max 192 --march hybrid --hybrid_split 0.75 \
    --hybrid_bucket_k --repeat 2

stage carve_s1 3600 python tools/quality_run.py --iters 20000 --seed 1 \
    --sampling overdraw --carve --engage_max 192 --repeat 2
echo "QUEUE6 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue6_status
