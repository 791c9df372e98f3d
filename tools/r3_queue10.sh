#!/bin/bash
# Round-3 TPU queue (session 7): does truncation-pressure regrow fix the
# forced-hybrid quality regression?
# Queue9 pinned the cost to the hybrid MODE at carve-converged grids
# (−2.24/−5.90 dB held-out at seeds 2/3 vs window controls); the
# hypothesis is k/w_cap truncation drifting for a full re-check cadence.
# The loop now regrows within one chunk of measured pressure
# (training/loop.py pressure_* machinery). If the hypothesis holds,
# these reruns recover to ~46 dB; RESULT_JSON's timing.pressure_fired /
# pressure_muted counters say whether (and how often) pressure actually
# fired. Bench first: confirms the in-step pressure stats don't move the
# headline number.
# Usage: nohup bash tools/r3_queue10.sh > /tmp/r3_queue10.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue10_status
    sleep 120
    waited=$((waited + 195))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue10_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue10_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue10_status
  timeout "$tmo" "$@" > "/tmp/r3q10_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue10_status
}

stage bench 900 python bench.py

# the two failing seeds, forced single-k hybrid, pressure regrow armed
for s in 2 3; do
  stage hybp_s$s 2400 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192 --march hybrid
done

# worst hybrid2k seed, same question for the per-bucket-k march
stage h2kp_s3 2400 python tools/quality_run.py --iters 20000 --seed 3 \
    --sampling overdraw --carve --engage_max 192 --march hybrid \
    --hybrid_split 0.75 --hybrid_bucket_k

echo "QUEUE10 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue10_status
