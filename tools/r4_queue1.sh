#!/bin/bash
# Round-4 TPU queue 1: validate the SHIPPED defaults after the round-4
# flips (carve_init=True, compact_engage_max=192, hybrid_split=0.75,
# hybrid_bucket_k=True — per the queue14 pre-registered gate) plus the
# new pressure decay-interval backoff (invariant 5).
#
# Stages:
#   smoke     bench.py at BENCH_ITERS=2000 — fast wiring check of the new
#             one-protocol bench (steady + held-out dB in one JSON)
#   bench     bench.py full 20k production protocol (the BENCH_r04 shape)
#   conf_s1   20k quality run at the SHIPPED defaults (no flags), seed 1
#   conf_s2   same, seed 2
# Success criteria (VERDICT r3 next-#2/#3/#4):
#   * bench value >= 1.0M rays/s steady AND heldout_psnr_db >= ~49 dB
#     (r3 gate candidates: 48.7-50.1 dB; controls 47.3-50.6)
#   * conf runs within the r3 gate envelope
#   * decay_bounces ~ 0 in all runs (tools/retune_stats.py on the logs)
# Usage: nohup bash tools/r4_queue1.sh > /tmp/r4_queue1.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r4_queue1_status
    sleep 120
    waited=$((waited + 210))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r4_queue1_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue1_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue1_status
  timeout "$tmo" "$@" > "/tmp/r4q1_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue1_status
}

stage smoke 1500 env BENCH_ITERS=2000 python bench.py
stage bench 2700 python bench.py
stage conf_s1 2700 python tools/quality_run.py --iters 20000 --seed 1 --tag r4-defaults
stage conf_s2 2700 python tools/quality_run.py --iters 20000 --seed 2 --tag r4-defaults

echo "QUEUE r4q1 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue1_status
python tools/retune_stats.py /tmp/r4q1_bench.log /tmp/r4q1_conf_s1.log /tmp/r4q1_conf_s2.log \
  | tee -a /tmp/r4_queue1_status
