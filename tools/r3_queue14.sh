#!/bin/bash
# Round-3 TPU queue (session 9): full hybrid2k default-flip gate rerun +
# LCA floors anchor, all under the FIXED pressure tuner (commits 3424730
# split-collapse ban + 18dea41 settle-k-first).
#
# Why a full rerun: the container restarted between sessions 8 and 9 and
# /tmp was wiped — every queue11/12 RESULT_JSON row that had not been
# hand-copied into benchmarks/quality_runs_r3.jsonl is gone (only the
# QUALITY.md summary table survives), and of the queue12 stages only
# h2k_s2 even ran the fixed tuner. quality_run.py now self-persists its
# rows into the repo, so this cannot happen again.
#
# Stages (candidate = chooser PREFERENCE for hybrid2k, not forced march):
#   h2k_s{0..3}  --hybrid_split 0.75 --hybrid_bucket_k
#   cv_s{0,1,3}  same-seed controls (cv_s2 = queue11's 50.63 dB row,
#                controls don't touch the split/k_lo code paths so that
#                run is still valid under the fixed tuner)
#   bench_h2k    bench.py at the candidate defaults
#   lca          converged LCA anchor through the production CLIs,
#                inheriting the pressure floors
#
# DECISION RULE (restated from tools/r3_queue12.sh, before the data):
# flip hybrid_split=0.75 + hybrid_bucket_k=True defaults ONLY if
#   (a) per-seed (h2k - control) held-out deltas stay within the
#       control cross-seed spread, AND
#   (b) mean steady rays/s >= the controls'.
# Usage: nohup bash tools/r3_queue14.sh > /tmp/r3_queue14.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue14_status
    sleep 120
    waited=$((waited + 195))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue14_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue14_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue14_status
  timeout "$tmo" "$@" > "/tmp/r3q14_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue14_status
}

# interleave candidate/control per seed so a mid-queue outage still
# leaves same-seed pairs
for s in 0 1 3; do
  stage h2k_s$s 2700 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192 \
      --hybrid_split 0.75 --hybrid_bucket_k --tag queue14-gate
  stage cv_s$s 2700 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192 --tag queue14-gate
done
stage h2k_s2 2700 python tools/quality_run.py --iters 20000 --seed 2 \
    --sampling overdraw --carve --engage_max 192 \
    --hybrid_split 0.75 --hybrid_bucket_k --tag queue14-gate

stage bench_h2k 1200 env BENCH_HYBRID_SPLIT=0.75 BENCH_BUCKET_K=1 \
    python bench.py

stage lca 5400 bash tools/lca_anchor.sh /tmp/lca_anchor_floors 20000

echo "QUEUE14 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue14_status
