"""Summarize compacted-stepper retune churn from a train-loop stdout log.

The production loop prints one line per retune:

    retuning compacted stepper at iter N (march_mode=M, width W -> k=K,
    w_cap=C[, w_lo=L][, k_lo=KL])

plus "switching to compacted stepper ..." on engagement and "reverting to
dense stepper ..." on a revert. This tool counts retunes, distinct
tunings (= compile-cache entries: training/loop.py keys its stepper cache
on the FULL Tuning incl. w_lo/k_lo), and DECAY-BOUNCE cycles: a shrink of
k (the pressure-floor decay at a quiet display window,
training/pressure.py::decay_if_quiet) that is undone by a regrow within
one display window. Each bounce costs ~1 re-check chunk of truncated
training. The tuner's exponential decay backoff (invariant 5) should keep
bounces near zero; this tool is the measurement.

Shrink/grow pairs are only compared within an unbroken same-mode run of
events — a mode switch or a revert-to-dense resets the sequence (a k
change across modes is a re-sizing, not a floor decay).

Usage: python tools/retune_stats.py [--display_every 500] /tmp/r3q14_*.log
"""

import argparse
import re

PAT = re.compile(
    r"(retuning|switching to) compacted stepper at iter (\d+) "
    r"\(march_mode=(\w+), (?:needed )?width(?:/ray)? (\d+) -> k=(\d+), w_cap=(\d+)"
    r"(?:, w_lo=(\d+))?(?:, k_lo=(\d+))?"
)
REVERT = re.compile(r"reverting to dense stepper at iter (\d+)")


def analyze(path: str, display_every: int = 500) -> None:
    # (iter, mode, k, w_cap, w_lo, k_lo); mode None = revert sequence break
    events = []
    for line in open(path, errors="replace"):
        m = PAT.search(line)
        if m:
            events.append((
                int(m.group(2)), m.group(3), int(m.group(5)),
                int(m.group(6)), int(m.group(7) or 0), int(m.group(8) or 0),
            ))
            continue
        r = REVERT.search(line)
        if r:
            events.append((int(r.group(1)), None, 0, 0, 0, 0))
    if not events:
        print(f"{path}: no retune lines")
        return
    shrinks = grows = bounces = reverts = 0
    last_shrink = None  # (iter, k_before)
    for (i0, m0, k0, *_), (i1, m1, k1, *_) in zip(events, events[1:]):
        if m1 is None:
            reverts += 1
        if m0 is None or m1 is None or m0 != m1:
            # mode switch / revert: k changes across modes are re-sizings,
            # not floor decays — break the shrink/grow sequence
            last_shrink = None
            continue
        if k1 < k0:
            shrinks += 1
            last_shrink = (i1, k0)
        elif k1 > k0:
            grows += 1
            if last_shrink and i1 - last_shrink[0] <= display_every and k1 >= last_shrink[1]:
                bounces += 1  # decay undone within a display window
                last_shrink = None
    tunings = sorted(
        {(m, k, w, lo, klo) for _, m, k, w, lo, klo in events if m is not None}
    )
    print(
        f"{path}: {len(events)} retunes, {len(tunings)} distinct tunings "
        f"(compile-cache entries), {grows} grows, {shrinks} shrinks, "
        f"{reverts} reverts, "
        f"{bounces} decay-bounce cycles (shrink undone <= {display_every} iters)"
    )
    for t in tunings:
        extra = (f" w_lo={t[3]}" if t[3] else "") + (f" k_lo={t[4]}" if t[4] else "")
        print(f"    mode={t[0]} k={t[1]} w_cap={t[2]}{extra}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument(
        "--display_every", type=int, default=500,
        help="decay/display window in iters (TrainConfig.display_every; "
        "the quality runs use the config default of 500)",
    )
    args = ap.parse_args()
    for p in args.logs:
        analyze(p, args.display_every)
