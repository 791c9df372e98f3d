#!/bin/bash
# Round-5 TPU queue 2 — LCA throughput parity sweep (VERDICT r4 #5).
# Stages health-gate themselves and retry once (tools/r5_lib.sh).
#
# The LCA/SDF family ran at 908.6k rays/s steady (0.89x CT) with the
# two-bucket split tuned on CT's span distribution. Sweep hybrid_split
# on the LCA span distribution (the tuner auto-sizes w_lo from the
# split's span quantile) and record steady + held-out for each:
#   lca75  — shipped default split 0.75 (r4 comparator: 908.6k steady,
#            30.12 dB best held-out)
#   lca60  — split 0.60 (narrower lo bucket, safer w_lo)
#   lca85  — split 0.85 (wider lo bucket, more probe savings)
#   lca0   — split 0 (single-bucket hybrid control)
# Target: >= 0.95x CT steady (>= ~975k) or a documented structural bound
# in benchmarks/LCA.md.
# Usage: bash tools/r5_queue2.sh [stage ...]  (default: all)
set -uo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
. tools/r5_lib.sh
STAGES=${@:-"lca75 lca60 lca85 lca0"}

lca_run() {
  local tag=$1 split=$2
  local ws
  ws=$(mktemp -d "/tmp/r5_lca_${tag}.XXXX")
  echo "workspace: $ws"
  (cd "$ws" \
    && timeout 900 python "$REPO/cli/datagen.py" --data_name LCA \
         --volume phantom:lca --out data \
    && timeout 3000 python "$REPO/cli/train.py" --data_name LCA \
         --n_iters 20000 --display_every 1000 --compact_engage_max 192 \
         --hybrid_split "$split")
}

for s in $STAGES; do
  case $s in
    lca75) run_stage lca75 /tmp/r5q2_lca75.log lca_run lca75 0.75 ;;
    lca60) run_stage lca60 /tmp/r5q2_lca60.log lca_run lca60 0.60 ;;
    lca85) run_stage lca85 /tmp/r5q2_lca85.log lca_run lca85 0.85 ;;
    lca0)  run_stage lca0  /tmp/r5q2_lca0.log  lca_run lca0  0.0  ;;
    *) echo "unknown stage $s"; exit 2 ;;
  esac
done
echo "queue 2 complete: $(date -u +%H:%M:%S)"
