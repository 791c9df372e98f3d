#!/bin/bash
# Round-3 TPU work queue: runs every pending TPU-gated measurement in
# sequence (ONE tunnel client at a time — CLAUDE.md), health-gating each
# stage on a 60 s probe and waiting out tunnel outages (the axon tunnel
# can be down for hours with no client at fault).
#
# Stages:
#   1. bench.py sanity (headline + watchdog)
#   2. production-loop quality run with carve_init + interim-k engagement
#      (VERDICT r2 #2 — >=800k rays/s target, timing breakdown)
#   3. remaining seed-grid cells (VERDICT r2 #6; resumes from the jsonl)
#   4. LCA converged anchor (VERDICT r2 #4)
#   5. demo_eval regeneration on the round-3 surface (VERDICT r2 #5)
#   6. fwd-kernel tile/chain/head sweep (VERDICT r2 #1b follow-up)
#
# Usage: nohup bash tools/r3_queue.sh > /tmp/r3_queue.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}

wait_tunnel() {  # $1 = stage name
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue_status
    sleep 120
    waited=$((waited + 195))
    if [ "$waited" -gt 28800 ]; then
      echo "[$1] tunnel down >8h; giving up queue" | tee -a /tmp/r3_queue_status
      exit 1
    fi
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue_status
}

stage() {  # $1 = name, $2 = timeout seconds, rest = command
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue_status
  timeout "$tmo" "$@" > "/tmp/r3q_${name}.log" 2>&1
  local rc=$?
  echo "=== STAGE $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue_status
}

stage bench1 900 python bench.py
stage carve 2400 python tools/quality_run.py --iters 20000 --seed 0 \
    --sampling overdraw --carve --engage_max 192
stage seedgrid 14400 python tools/seed_grid.py --iters 20000 --max_tunnel_wait 14400
stage lca 5400 bash tools/lca_anchor.sh /tmp/lca_anchor_r3 20000
stage demo 3600 bash tools/make_demo_eval.sh /tmp/demo_eval_r3 12000
stage mlptile 2400 python tools/bench_mlp_tile.py \
    --points 495000 --tiles 6144,8192,12288,16384,24576 --chains 1,2 --heads reduce,dot
echo "QUEUE COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue_status
