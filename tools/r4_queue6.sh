#!/bin/bash
# Round-4 TPU queue 6: whole-train-step fused kernel A/B.
# Stage 1: hybrid2k step decomposition with cfg.fused_train_step='auto'
#          (adds the fused_grads stage; full_step runs through the fused
#          kernel) — compare against the r4q5 split baseline
#          (full_step 6.03 ms / fm 5.86 ms, /tmp/r4q5_profile2k*.log).
# Stage 2: 20k production quality run with the fused step, seed 1 —
#          comparator is the r4q1 conf_s1 run (49.10 dB / 1.024M steady).
# Usage: nohup bash tools/r4_queue6.sh > /tmp/r4_queue6.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r4_queue6_status
    sleep 120
    waited=$((waited + 210))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r4_queue6_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue6_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue6_status
  timeout "$tmo" "$@" > "/tmp/r4q6_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue6_status
}

stage profile2k_fused 3600 python tools/profile_step.py --mode hybrid2k --fused_step
stage fused_quality 5400 python tools/quality_run.py --iters 20000 --seed 1 \
    --fused_step --tag r4-fused

echo "QUEUE r4q6 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue6_status
