"""Summarize compacted-stepper retune churn from a train-loop stdout log.

The production loop prints one line per retune:

    retuning compacted stepper at iter N (march_mode=M, width W -> k=K, w_cap=C)

This tool counts retunes, distinct tunings (= compile-cache entries), and
DECAY-BOUNCE cycles: a shrink of k (the pressure-floor decay at a quiet
display window, training/pressure.py::decay_if_quiet) that is undone by a
regrow within one display window. Each bounce costs ~1 re-check chunk of
truncated training — if bounces recur every display window on a
non-pruning grid, the decay policy needs an exponential backoff
(symmetric with the tuner's mute/ban backoffs).

Usage: python tools/retune_stats.py /tmp/r3q14_*.log
"""

import re
import sys

PAT = re.compile(
    r"(retuning|switching to) compacted stepper at iter (\d+) "
    r"\(march_mode=(\w+), (?:needed )?width(?:/ray)? (\d+) -> k=(\d+), w_cap=(\d+)"
)


def analyze(path: str, display_every: int = 1000) -> None:
    events = []  # (iter, mode, k, w_cap)
    for line in open(path, errors="replace"):
        m = PAT.search(line)
        if m:
            events.append(
                (int(m.group(2)), m.group(3), int(m.group(5)), int(m.group(6)))
            )
    if not events:
        print(f"{path}: no retune lines")
        return
    shrinks = grows = bounces = 0
    last_shrink = None  # (iter, k_before)
    for (i0, _, k0, _), (i1, _, k1, _) in zip(events, events[1:]):
        if k1 < k0:
            shrinks += 1
            last_shrink = (i1, k0)
        elif k1 > k0:
            grows += 1
            if last_shrink and i1 - last_shrink[0] <= display_every and k1 >= last_shrink[1]:
                bounces += 1  # decay undone within a display window
                last_shrink = None
    tunings = sorted({(m, k, w) for _, m, k, w in events})
    print(
        f"{path}: {len(events)} retunes, {len(tunings)} distinct tunings "
        f"(compile-cache entries), {grows} grows, {shrinks} shrinks, "
        f"{bounces} decay-bounce cycles (shrink undone <= {display_every} iters)"
    )
    for t in tunings:
        print(f"    mode={t[0]} k={t[1]} w_cap={t[2]}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        analyze(p)
