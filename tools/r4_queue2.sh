#!/bin/bash
# Round-4 TPU queue 2 (runs after r4_queue1 completes): the forward-kernel
# epilogue measurement (VERDICT r3 next-#5), the LCA anchor at the new
# shipped defaults (next-#7's measured follow-up), and demo_eval
# regeneration (avg-pool DISTS + new defaults surface).
#
# Stages:
#   mlp_epi   tools/bench_mlp_tile.py --epilogues f32,bf16 at 450k and
#             900k points (the flagship compacted step feeds ~0.5-1.1M):
#             decides the EPILOGUE default. Flip needs BOTH a fwd TF/s win
#             and a 20k quality-parity run (epi_quality below).
#   epi_quality  20k shipped-defaults run with EPILOGUE=bf16 (env knob in
#             quality_run via PALLAS_EPILOGUE) — only meaningful if
#             mlp_epi shows a win; harmless otherwise.
#   lca       lca_anchor.sh at the r4 defaults (two-bucket per-k march
#             now on by default; the tree's skewed span distribution is
#             the split's favorable case) — expect steady > 763k rays/s
#             at the same 30.4 dB best anchor.
#   demo      demo_eval regeneration (r4 defaults + avg-pool DISTS).
# Usage: nohup bash tools/r4_queue2.sh > /tmp/r4_queue2.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

# wait for queue1 to finish (shared TPU: one client at a time)
while ! grep -q "QUEUE r4q1 COMPLETE" /tmp/r4_queue1_status 2>/dev/null; do
  sleep 60
done

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local waited=0
  while ! probe; do
    echo "[$1] tunnel unhealthy; retry in 120s (${waited}s waited)" | tee -a /tmp/r4_queue2_status
    sleep 120
    waited=$((waited + 210))
    [ "$waited" -gt 28800 ] && { echo "[$1] tunnel down >8h; giving up" | tee -a /tmp/r4_queue2_status; exit 1; }
  done
  echo "[$1] tunnel healthy @ $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue2_status
}
stage() {
  local name=$1 tmo=$2
  shift 2
  wait_tunnel "$name"
  echo "=== STAGE $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue2_status
  timeout "$tmo" "$@" > "/tmp/r4q2_${name}.log" 2>&1
  echo "=== STAGE $name done rc=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4_queue2_status
}

# queue1's full-bench stage aborted on a transient tunnel wedge (both the
# first try and the built-in fresh-process retry hit it); re-run it first
stage bench 2700 python bench.py

stage mlp_epi 1800 python tools/bench_mlp_tile.py \
    --tiles 6144,12288 --chains 1,2 --epilogues f32,bf16 --points 450000
stage mlp_epi9 1800 python tools/bench_mlp_tile.py \
    --tiles 6144,12288 --chains 2 --epilogues f32,bf16 --points 900096
stage epi_quality 2700 env PALLAS_EPILOGUE=bf16 \
    python tools/quality_run.py --iters 20000 --seed 1 --tag r4-epilogue
stage lca 5400 bash tools/lca_anchor.sh /tmp/lca_anchor_r4 20000
stage demo 3600 bash tools/make_demo_eval.sh /tmp/demo_eval_r4 12000

echo "QUEUE r4q2 COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/r4_queue2_status
