#!/bin/bash
# Round-3 TPU queue (session 7b): persistent pressure floors.
# Queue10 confirmed the truncation-drift hypothesis directionally (seed 3
# forced-hybrid 40.97 -> 43.07 dB) but exposed k THRASH: the chooser's
# probe (the single held-out view) systematically under-measures the
# train batch (probe width 39-79 vs batch need ~160), so every cadence
# re-check shrank k back and the batch re-truncated (200 retunes / 144
# fires). The loop now keeps batch-measured FLOORS that decay only after
# a quiet display window. Expectations:
#   hybp_s2/s3  — forced single-k hybrid recovers to ~46 dB (k settles
#                 ~160; steady likely BELOW window's 1.22M — that would
#                 prove window is perf-correct at carve grids, not just
#                 quality-correct, once losslessness is enforced)
#   h2kp_s3     — per-bucket-k: k sized by the worst rays, k_lo by the
#                 narrow majority; k_eff could undercut window's 128 ->
#                 the quality-SAFE throughput winner, if ~46 dB holds
#   cvp_s2      — window control under the pressure machinery: guard
#                 against regression from false edge fires (backoff) and
#                 record pressure_fired/muted for the default config
# Usage: nohup bash tools/r3_queue11.sh > /tmp/r3_queue11.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue11_status
    sleep 120
    waited=$((waited + 195))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue11_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue11_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue11_status
  timeout "$tmo" "$@" > "/tmp/r3q11_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue11_status
}

stage cvp_s2 2400 python tools/quality_run.py --iters 20000 --seed 2 \
    --sampling overdraw --carve --engage_max 192

for s in 2 3; do
  stage hybp_s$s 2400 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192 --march hybrid
done

stage h2kp_s3 2400 python tools/quality_run.py --iters 20000 --seed 3 \
    --sampling overdraw --carve --engage_max 192 --march hybrid \
    --hybrid_split 0.75 --hybrid_bucket_k

echo "QUEUE11 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue11_status
