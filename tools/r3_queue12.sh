#!/bin/bash
# Round-3 TPU queue (session 8): the hybrid2k DEFAULT-FLIP gate.
# Queue11 (floors landed): forced hybrid2k reads 50.27 dB held-out at
# 1.10M rays/s steady vs the window control's 50.63 dB at 1.02M — the
# pre-floors 4-seed rejection was truncation drift, not the bucket
# split. This queue gates the actual candidate default: CHOOSER
# preference (march_mode stays 'window'; choose_compact_mode picks
# hybrid2k only when its k_eff undercuts window's k by > 32), with
# floors, at 4 seeds + same-seed window controls.
#
# DECISION RULE (stated before the data, per the r2 verdict's standard):
# flip hybrid_split=0.75 + hybrid_bucket_k=True defaults ONLY if
#   (a) per-seed (h2k − control) held-out deltas stay within the
#       control cross-seed spread, AND
#   (b) mean steady rays/s >= the controls'.
# Otherwise the preference stays opt-in and the floors alone are the
# round-3 quality story.
# Usage: nohup bash tools/r3_queue12.sh > /tmp/r3_queue12.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue12_status
    sleep 120
    waited=$((waited + 195))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue12_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue12_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue12_status
  timeout "$tmo" "$@" > "/tmp/r3q12_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue12_status
}

# interleave candidate/control per seed so a mid-queue outage still
# leaves same-seed pairs
for s in 0 1 3; do
  stage h2k_s$s 2400 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192 \
      --hybrid_split 0.75 --hybrid_bucket_k
  stage cv_s$s 2400 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192
done
# seed 2: control exists post-floors (queue11 cvp_s2, 50.63 dB) — only
# the candidate is missing
stage h2k_s2 2400 python tools/quality_run.py --iters 20000 --seed 2 \
    --sampling overdraw --carve --engage_max 192 \
    --hybrid_split 0.75 --hybrid_bucket_k

# bench at the candidate defaults (chooser runs at the bench's 3k-dense
# grid; the preference gate decides hybrid2k vs window there)
stage bench_h2k 900 env BENCH_HYBRID_SPLIT=0.75 BENCH_BUCKET_K=1 \
    python bench.py

echo "QUEUE12 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue12_status
