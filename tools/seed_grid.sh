#!/bin/bash
# 4-seed x 2-sampler held-out-PSNR grid (VERDICT r2 weak #5 / next #6).
# Decision metric: HELD-OUT PSNR (vessel PSNR swings +-3 dB between
# adjacent evals — never judge a default off it). Sequential: one TPU
# client at a time (CLAUDE.md tunnel discipline).
# Usage: bash tools/seed_grid.sh [iters] [outfile]
set -u
ITERS=${1:-20000}
OUT=${2:-/tmp/seed_grid.log}
: > "$OUT"
for seed in 0 1 2 3; do
  for impl in overdraw gumbel; do
    echo "=== seed=$seed impl=$impl ===" | tee -a "$OUT"
    timeout 2400 python /root/repo/tools/quality_run.py \
      --iters "$ITERS" --seed "$seed" --sampling "$impl" 2>&1 \
      | grep -E "RESULT|Iteration: $ITERS |switching|retuning" | tee -a "$OUT"
  done
done
echo "grid done -> $OUT"
