#!/bin/bash
# Converged LCA/SDF-family quality anchor (VERDICT r2 #4): the full
# pipeline through the production CLIs at >=20k iterations (compaction
# engaged), then the evaluation sweep — the same rigor as the CT
# protocol in benchmarks/QUALITY.md. Reference protocol:
# visualization.py:86-98,356-397 (dense LCA render path).
#
# Usage: bash tools/lca_anchor.sh [workdir] [iters]
set -euo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
WS=${1:-$(mktemp -d /tmp/lca_anchor.XXXX)}
ITERS=${2:-20000}
mkdir -p "$WS"
cd "$WS"
echo "workspace: $WS"

python "$REPO/cli/datagen.py" --data_name LCA --volume phantom:lca --out data
# same engagement protocol as the CT quality runs (tools/quality_run.py):
# interim-k engagement up to 192 — the first 20k-iter LCA run showed the
# converged grid at 0.54% occupancy yet never compacted because the
# strict 0.9*k budget missed the tree's per-ray active counts
python "$REPO/cli/train.py" --data_name LCA --n_iters "$ITERS" \
    --display_every 1000 --compact_engage_max 192 | tee train_lca.log
# NB: under pipefail a non-matching glob makes ls exit 2 and kill the
# script even with stderr dropped — protect the pipeline
RUN=$(ls -dt cases/lca/runs/* cases/LCA/runs/* 2>/dev/null | head -1 || true)
[ -n "$RUN" ] || { echo "no trained run found"; exit 1; }
echo "trained run: $RUN"
python "$REPO/cli/evaluate.py" --data_name LCA --volume phantom:lca \
    --number_angles_vis 8 --field_resolution 51 --run_dir "$RUN" \
    | tee eval_lca.log
tail -30 "$RUN/metrics-summary.txt" || true
echo "logs: $WS/train_lca.log $WS/eval_lca.log"
