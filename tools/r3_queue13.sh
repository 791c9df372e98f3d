#!/bin/bash
# Round-3 TPU queue (session 8b): gate completion + LCA floors anchor.
#   h2k_s{0,1,3}b — reruns of the queue12 candidate stages: s0 ran the
#             pre-ban code (k_lo 40<->0 thrash every check, commit
#             3424730), s1/s3 the ban-without-ordering code (hysteresis
#             collapse vs the pre-floor k, commit 18dea41); only
#             queue12's h2k_s2 executed the fixed tuner. The gate's
#             4-seed table uses these reruns.
#   lca     — converged LCA/SDF anchor through the production CLIs, now
#             inheriting the pressure floors (the committed LCA.md anchor
#             predates them and its probe-sized k truncated the batch the
#             same way the CT runs did).
# Usage: nohup bash tools/r3_queue13.sh > /tmp/r3_queue13.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue13_status
    sleep 120
    waited=$((waited + 195))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue13_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue13_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue13_status
  timeout "$tmo" "$@" > "/tmp/r3q13_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue13_status
}

for s in 0 1 3; do
  stage h2k_s${s}b 2400 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192 \
      --hybrid_split 0.75 --hybrid_bucket_k
done

stage lca 3600 bash tools/lca_anchor.sh /tmp/lca_anchor_floors 20000

echo "QUEUE13 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue13_status
