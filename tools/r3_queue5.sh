#!/bin/bash
# Round-3 TPU queue (session 5b): reruns after the queue4 lca/demo
# failures (ls-glob pipefail bug; a stray kill) — LCA anchor now with
# interim-k engagement, fresh demo_eval workspace. Waits for queue4.
# Usage: nohup bash tools/r3_queue5.sh > /tmp/r3_queue5.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

# wait for queue4 (PID file) to exit before touching the tunnel
if [ -f /tmp/r3q4.pid ]; then
  while kill -0 "$(cat /tmp/r3q4.pid)" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue5_status
    sleep 120
    waited=$((waited + 195))
    if [ "$waited" -gt 28800 ]; then
      echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue5_status
      exit 1
    fi
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue5_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue5_status
  timeout "$tmo" "$@" > "/tmp/r3q5_${name}.log" 2>&1
  local rc=$?
  echo "=== STAGE $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue5_status
}

stage lca 7200 bash tools/lca_anchor.sh /tmp/lca_anchor_r3b 20000
stage demo 3600 bash tools/make_demo_eval.sh /tmp/demo_eval_r3b 12000
echo "QUEUE5 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue5_status
