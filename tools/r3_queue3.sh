#!/bin/bash
# Round-3 consolidated TPU queue (session 4, post-container-restart):
# every pending measurement in value order, ONE tunnel client at a time
# (CLAUDE.md), health-gating each stage on a 60 s probe.
#
# Stages:
#   1. bench1      — headline sanity + persistent-cache warm
#   2. march_h2    — hybrid2 micro-bench (two-bucket span-sorted march)
#   3. hybrid2     — BENCH_HYBRID_SPLIT=0.75 full bench (the 1.6M lever)
#   4. kmargin     — BENCH_K_MARGIN=1.0 price check
#   5. carve       — production quality run w/ carve_init + interim-k
#                    engagement (VERDICT r2 #2: >=800k rays/s target)
#   6. quality_h2  — 20k-iter quality gate for hybrid_split
#   7. seedgrid    — remaining seed-grid cells (seed 3 + jitter column)
#   8. lca         — LCA converged anchor, 20k iters (VERDICT r2 #4)
#   9. demo        — demo_eval regeneration (VERDICT r2 #5)
#  10. compaction  — compaction variant micro-bench
#
# Usage: nohup bash tools/r3_queue3.sh > /tmp/r3_queue3.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}

wait_tunnel() {  # $1 = stage name
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue3_status
    sleep 120
    waited=$((waited + 195))
    if [ "$waited" -gt 28800 ]; then
      echo "[$1] tunnel down >8h; giving up queue" | tee -a /tmp/r3_queue3_status
      exit 1
    fi
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue3_status
}

stage() {  # $1 = name, $2 = timeout seconds, rest = command
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue3_status
  timeout "$tmo" "$@" > "/tmp/r3q3_${name}.log" 2>&1
  local rc=$?
  echo "=== STAGE $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue3_status
}

stage bench1 900 python bench.py
stage march_h2 1800 python tools/bench_march.py
stage hybrid2 900 env BENCH_HYBRID_SPLIT=0.75 python bench.py
stage kmargin 900 env BENCH_K_MARGIN=1.0 python bench.py
stage carve 3600 python tools/quality_run.py --iters 20000 --seed 0 \
    --sampling overdraw --carve --engage_max 192 --repeat 2
stage quality_h2 3600 python tools/quality_run.py --iters 20000 --seed 0 \
    --sampling overdraw --carve --engage_max 192 --hybrid_split 0.75 --repeat 2
stage seedgrid 10800 python tools/seed_grid.py --iters 20000 --max_tunnel_wait 10800
stage lca 5400 bash tools/lca_anchor.sh /tmp/lca_anchor_r3 20000
stage demo 3600 bash tools/make_demo_eval.sh /tmp/demo_eval_r3 12000
stage compaction 1200 python tools/bench_compaction.py
echo "QUEUE3 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue3_status
