"""Evaluate the hybrid2k default-flip gate (tools/r3_queue14.sh) from the
persisted quality rows.

Decision rule (stated in r3_queue12.sh/r3_queue14.sh BEFORE the data):
flip hybrid_split=0.75 + hybrid_bucket_k=True defaults ONLY if
  (a) per-seed (h2k - control) held-out deltas stay within the control
      cross-seed spread, AND
  (b) mean steady rays/s >= the controls'.

Steady rays/s = img_sample_size * iters / step_compact wall time (the
in-loop stepper rate, excluding compiles/eval/choose — the honest
config-to-config comparator; end-to-end includes one-time compile noise).

Usage: python tools/r3_gate_eval.py [--tag queue14-gate]
"""

import argparse
import json
import os

ROWS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks", "quality_runs_r3.jsonl")
RAYS_PER_ITER = 5625


def steady(row):
    if row.get("steady_rays_per_sec"):  # recovered-summary rows carry it raw
        return float(row["steady_rays_per_sec"])
    t = row.get("timing", {})
    if t.get("steady_rays_per_sec"):  # the loop's own in-loop steady metric
        return float(t["steady_rays_per_sec"])
    dt = (t.get("step_compact") or 0.0) + (t.get("step_dense") or 0.0)
    if not dt:
        return None
    return RAYS_PER_ITER * row["iters"] / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="queue14-gate")
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(ROWS)]
    gate = [r for r in rows if r.get("tag") == args.tag and not r.get("warm")]
    cand = {r["seed"]: r for r in gate if r.get("bucket_k")}
    ctrl = {r["seed"]: r for r in gate if not r.get("bucket_k")}

    seeds = sorted(set(cand) | set(ctrl))
    print(f"{'seed':>4} {'h2k dB':>8} {'ctrl dB':>8} {'delta':>7} "
          f"{'h2k M rays/s':>13} {'ctrl M rays/s':>14}")
    deltas, c_psnr, c_rate, h_rate = [], [], [], []
    for s in seeds:
        h, c = cand.get(s), ctrl.get(s)
        hp = h["heldout_psnr"] if h else float("nan")
        cp = c["heldout_psnr"] if c else float("nan")
        hr = steady(h) if h else None
        cr = steady(c) if c else None
        d = hp - cp if h and c else float("nan")
        if h and c:
            deltas.append(d)
        if c:
            c_psnr.append(cp)
            if cr:
                c_rate.append(cr)
        if h and hr:
            h_rate.append(hr)
        print(f"{s:>4} {hp:>8.2f} {cp:>8.2f} {d:>+7.2f} "
              f"{(hr or 0)/1e6:>13.3f} {(cr or 0)/1e6:>14.3f}")

    if not deltas or not c_psnr:
        print("\nincomplete gate data — need candidate+control pairs")
        return
    spread = max(c_psnr) - min(c_psnr)
    mean_h = sum(h_rate) / len(h_rate) if h_rate else 0.0
    mean_c = sum(c_rate) / len(c_rate) if c_rate else 0.0
    a = all(abs(d) <= spread for d in deltas)
    b = mean_h >= mean_c
    print(f"\ncontrol cross-seed spread: {spread:.2f} dB")
    print(f"per-seed deltas: {['%+.2f' % d for d in deltas]} "
          f"-> (a) within spread: {a}")
    print(f"mean steady: h2k {mean_h/1e6:.3f}M vs ctrl {mean_c/1e6:.3f}M "
          f"-> (b) h2k >= ctrl: {b}")
    print(f"\nDECISION: {'FLIP the defaults' if a and b else 'KEEP opt-in'}")


if __name__ == "__main__":
    main()
