#!/bin/bash
# Round-5 TPU queue 1 — stages health-gate themselves and retry once
# (tools/r5_lib.sh; the tunnel wedges intermittently).
#
#   loop    — drain-on-demand loop A/B at the shipped defaults, seed 1
#             (comparators: r4q8/r4q9 = 49.15 dB @ 1.049-1.053M steady;
#             VERDICT r4 #3 target: steady >= 1.15M at quality parity)
#   fka     — first-k Pallas backend promotion A/B, same seed
#             (VERDICT r4 #2: promote or written negative result).
#             NB the old "Pallas 0.63 ms ~ XLA parity" conclusion was
#             measured with the TIMING HARNESS later shown (r4q5) to
#             carry a ~0.8 ms/stage blocking bias; the XLA path's real
#             cost is plausibly its (R,w,k) 345 MB HBM intermediate
#             (~0.43 ms at BW) while the kernel's true time may be
#             ~0.1 ms — this A/B is a live candidate win, not a formality
#   bench   — full bench.py production protocol (BENCH_r05 rehearsal)
# Usage: bash tools/r5_queue1.sh [stage ...]  (default: all)
set -uo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
. tools/r5_lib.sh
STAGES=${@:-"loop fka bench"}

for s in $STAGES; do
  case $s in
    loop)
      run_stage loop /tmp/r5q1_loop.log timeout 2400 \
        python tools/quality_run.py --seed 1 --tag r5-loop || exit 1
      ;;
    fka)
      run_stage fka /tmp/r5q1_fka.log timeout 2400 \
        python tools/quality_run.py --seed 1 --fka pallas --tag r5-fka || exit 1
      ;;
    bench)
      run_stage bench /tmp/r5q1_bench.log timeout 3000 python bench.py || exit 1
      ;;
    *) echo "unknown stage $s"; exit 2 ;;
  esac
done
echo "queue 1 complete: $(date -u +%H:%M:%S)"
