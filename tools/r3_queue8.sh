#!/bin/bash
# Round-3 TPU queue (session 6): decide the hybrid2k default.
# Evidence so far (benchmarks/quality_runs_r3.jsonl): seed0 +0.50 dB,
# seed1 -2.17 dB vs carve control -> need seeds 2,3 on both arms before
# flipping TrainConfig/bench defaults. Plus the never-measured 'dot'
# fwd-head kernel variant and a BENCH_HYBRID_SPLIT sweep.
# Usage: nohup bash tools/r3_queue8.sh > /tmp/r3_queue8.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

# wait for the orphaned queue7 mlp_tile450 stage (exact pid, no patterns)
if [ -f /tmp/r3q7_stage.pid ]; then
  while kill -0 "$(cat /tmp/r3q7_stage.pid)" 2>/dev/null; do sleep 30; done
fi

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r3_queue8_status
    sleep 120
    waited=$((waited + 195))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r3_queue8_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue8_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue8_status
  timeout "$tmo" "$@" > "/tmp/r3q8_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r3_queue8_status
}

# quality gates first: they decide the default flip
for s in 2 3; do
  stage bq_s$s 2400 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192 --march hybrid \
      --hybrid_split 0.75 --hybrid_bucket_k
  stage cv_s$s 2400 python tools/quality_run.py --iters 20000 --seed $s \
      --sampling overdraw --carve --engage_max 192
done

# fwd 'dot' head: replaces the sublane reduce with one (8,F) MXU matmul
stage dothead 2400 python tools/bench_mlp_tile.py --points 337500 \
    --tiles 6144,16384 --chains 1,2 --heads dot

# split-fraction sweep around the 0.75 winner
stage split60 1200 env BENCH_BUCKET_K=1 BENCH_HYBRID_SPLIT=0.6 python bench.py
stage split85 1200 env BENCH_BUCKET_K=1 BENCH_HYBRID_SPLIT=0.85 python bench.py
echo "QUEUE8 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r3_queue8_status
