#!/bin/bash
# Round-4 TPU queue 5: rerun of the r4q4 stages after the /tmp wipe and a
# tunnel outage (queue4's status gating file was lost with /tmp).
# Stages: per-pallas_call overhead isolation + shipped-default hybrid2k
# step decomposition + the feature-major A/B on the real step.
# Usage: nohup bash tools/r4_queue5.sh > /tmp/r4_queue5.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r4_queue5_status
    sleep 120
    waited=$((waited + 210))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r4_queue5_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue5_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue5_status
  timeout "$tmo" "$@" > "/tmp/r4q5_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue5_status
}

stage overhead 1800 python tools/bench_overhead.py
stage profile2k 2700 python tools/profile_step.py --mode hybrid2k
# feature-major A/B on the real step (same profile, fm positions path)
stage profile2k_fm 2700 python tools/profile_step.py --mode hybrid2k --feature_major

echo "QUEUE r4q5 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue5_status
