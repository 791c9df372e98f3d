#!/bin/bash
# Regenerate benchmarks/demo_eval on the round-3 export surface
# (VERDICT r2 #5): LPIPS/DISTS columns (uncalibrated-flagged), the full
# jsonData/ tree every web-app radio resolves against, rotation videos
# (MJPEG AVI + GIF fallback — no ffmpeg in this image), per-angle hover
# JSONs, heatmap PNGs, 3D field VTK.
#
# Runs the production CLIs end-to-end on the TPU. Sweep density for the
# COMMITTED artifact is 9x9 (--number_angles_vis 8): the default 37x37
# hover-JSON tree is ~300 MB of per-angle image JSONs — not committable;
# the full-density df-metrics.csv protocol lives in benchmarks/QUALITY.md.
#
# Usage: bash tools/make_demo_eval.sh [workdir] [train_iters]
set -euo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
WS=${1:-$(mktemp -d /tmp/demo_eval.XXXX)}
ITERS=${2:-12000}
mkdir -p "$WS"
cd "$WS"
echo "workspace: $WS"

python "$REPO/cli/datagen.py" --limited_size 180 --number_angles 4 \
    --volume phantom:vessel --out data
python "$REPO/cli/train.py" --n_iters "$ITERS" --display_every 500
RUN=$(ls -dt cases/ct/runs/* | head -1)
echo "trained run: $RUN"
python "$REPO/cli/evaluate.py" --data_name ct --volume phantom:vessel \
    --number_angles_vis 8 --run_dir "$RUN"

OUT="$REPO/benchmarks/demo_eval"
rm -rf "$OUT"
mkdir -p "$OUT"
cp "$RUN/df-metrics.csv" "$RUN"/metrics-summary.txt "$OUT/" 2>/dev/null || true
cp "$RUN"/heatmap-*.png "$OUT/" 2>/dev/null || true
cp -r "$RUN/jsonData" "$OUT/jsonData"
mkdir -p "$OUT/projections"
cp "$RUN"/projections/*-rotation-*.gif "$RUN"/projections/*-rotation-*.mp4 \
    "$OUT/projections/" 2>/dev/null || true
# a few example projection PNGs (not the whole sweep)
ls "$RUN"/projections/image-*.png 2>/dev/null | head -3 | xargs -r -I{} cp {} "$OUT/projections/"
du -sh "$OUT"
echo "demo_eval regenerated; verify with:"
echo "  python $REPO/cli/serve.py $OUT/jsonData --port 18556"
