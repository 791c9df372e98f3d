#!/bin/bash
# Round-3 TPU queue (session 5): the two failed deliverable stages from
# queue3 (lca/demo — fixed mkdir bug), the k-margin=1.0 quality gate
# (bench showed 1.405M rays/s at BENCH_K_MARGIN=1.0 — gate before
# flipping the default), and the per-bucket-k hybrid bench.
# ONE tunnel client at a time (CLAUDE.md); health-gate each stage.
#
# Usage: nohup bash tools/r3_queue4.sh > /tmp/r3_queue4.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}

wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue4_status
    sleep 120
    waited=$((waited + 195))
    if [ "$waited" -gt 28800 ]; then
      echo "[$1] tunnel down >8h; giving up queue" | tee -a /tmp/r3_queue4_status
      exit 1
    fi
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue4_status
}

stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue4_status
  timeout "$tmo" "$@" > "/tmp/r3q4_${name}.log" 2>&1
  local rc=$?
  echo "=== STAGE $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue4_status
}

stage lca 7200 bash tools/lca_anchor.sh /tmp/lca_anchor_r3 20000
stage demo 3600 bash tools/make_demo_eval.sh /tmp/demo_eval_r3 12000
stage kmargin_q 3600 python tools/quality_run.py --iters 20000 --seed 0 \
    --sampling overdraw --carve --engage_max 192 --k_margin 1.0 --repeat 2
stage bucketk 900 env BENCH_BUCKET_K=1 BENCH_HYBRID_SPLIT=0.75 python bench.py
echo "QUEUE4 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue4_status
