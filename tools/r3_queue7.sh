#!/bin/bash
# Round-3 TPU queue (session 5b): reruns after the queue4 lca/demo
# failures (ls-glob pipefail bug; a stray kill) — LCA anchor now with
# interim-k engagement, fresh demo_eval workspace. Waits for queue4.
# Usage: nohup bash tools/r3_queue7.sh > /tmp/r3_queue7.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

# wait for queue4 (PID file) to exit before touching the tunnel
if [ -f /tmp/r3q6.pid ]; then
  while kill -0 "$(cat /tmp/r3q6.pid)" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue7_status
    sleep 120
    waited=$((waited + 195))
    if [ "$waited" -gt 28800 ]; then
      echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue7_status
      exit 1
    fi
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue7_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue7_status
  timeout "$tmo" "$@" > "/tmp/r3q7_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue7_status
}

# fwd-tile sweep at the hybrid2k point count (0.75*5625*48 + 0.25*5625*96)
stage mlp_tile 2400 python tools/bench_mlp_tile.py --points 337500 \
    --tiles 6144,8192,12288,16384,24576 --chains 1,2
stage mlp_tile450 2400 python tools/bench_mlp_tile.py --points 450000 \
    --tiles 6144,8192,12288,16384 --chains 2
echo "QUEUE7 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue7_status
