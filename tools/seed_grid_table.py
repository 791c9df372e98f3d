"""Render benchmarks/seed_grid_r3.jsonl into the MFU.md seed-grid table.

Replaces the block between <!-- SEED_GRID_TABLE --> and
<!-- /SEED_GRID_TABLE --> (or the bare marker) with a markdown table of
held-out PSNR per (seed, sampler[, jitter]) plus the decision-rule
verdict: keep 'overdraw' as default only if the per-seed held-out deltas
(overdraw - gumbel) stay within the cross-seed spread of the gumbel
column. Vessel PSNR is shown for context but is NOT a decision metric
(±3 dB swing between adjacent evals — CLAUDE.md).

Usage: python tools/seed_grid_table.py [--jsonl ...] [--md benchmarks/MFU.md]
"""

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- SEED_GRID_TABLE -->"
END = "<!-- /SEED_GRID_TABLE -->"


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            key = (r["seed"], r["sampling"], bool(r.get("jitter")))
            rows[key] = r  # later rerun of a cell wins
    return rows


def render(rows) -> str:
    seeds = sorted({s for (s, _, j) in rows if not j})
    lines = [
        BEGIN,
        "",
        "| seed | gumbel held-out | overdraw held-out | Δ (od−gm) | gumbel vessel* | overdraw vessel* |",
        "|---|---|---|---|---|---|",
    ]
    deltas = []
    gm_vals = []
    for s in seeds:
        gm = rows.get((s, "gumbel", False))
        od = rows.get((s, "overdraw", False))
        if gm:
            gm_vals.append(gm["heldout_psnr"])
        d = (
            f"{od['heldout_psnr'] - gm['heldout_psnr']:+.2f}"
            if gm and od
            else "—"
        )
        if gm and od:
            deltas.append(od["heldout_psnr"] - gm["heldout_psnr"])
        fmt = lambda r, k: f"{r[k]:.2f}" if r else "—"
        lines.append(
            f"| {s} | {fmt(gm, 'heldout_psnr')} | {fmt(od, 'heldout_psnr')} "
            f"| {d} | {fmt(gm, 'vessel_psnr_best')} | {fmt(od, 'vessel_psnr_best')} |"
        )
    jit = {
        (s, j): r
        for (s, samp, j), r in rows.items()
        if j and samp == "overdraw"
    }
    if jit:
        lines.append("")
        lines.append("Grid-jitter column (overdraw sampler, jitter ON):")
        lines.append("")
        lines.append("| seed | held-out | Δ vs jitter-off |")
        lines.append("|---|---|---|")
        for (s, _), r in sorted(jit.items()):
            off = rows.get((s, "overdraw", False))
            d = f"{r['heldout_psnr'] - off['heldout_psnr']:+.2f}" if off else "—"
            lines.append(f"| {s} | {r['heldout_psnr']:.2f} | {d} |")

    spread = (max(gm_vals) - min(gm_vals)) if len(gm_vals) > 1 else float("nan")
    mean_d = sum(deltas) / len(deltas) if deltas else float("nan")
    max_abs_d = max(abs(d) for d in deltas) if deltas else float("nan")
    keep = deltas and max_abs_d <= spread
    lines += [
        "",
        f"Cross-seed gumbel spread: **{spread:.2f} dB**; per-seed deltas "
        f"(od−gm): mean {mean_d:+.2f} dB, max |Δ| {max_abs_d:.2f} dB over "
        f"{len(deltas)} seeds.",
        "",
        (
            "**Decision: keep `sampling_impl='overdraw'` as the default** — "
            "every per-seed held-out delta is inside the cross-seed spread "
            "(the sampler effect is indistinguishable from seed noise at "
            "+10-30% throughput)."
            if keep
            else "**Decision: revert the default to `sampling_impl='gumbel'`**"
            " — the per-seed held-out deltas exceed the cross-seed spread."
        ),
        "*vessel PSNR shown for context only (±3 dB eval-to-eval swing).",
        "",
        END,
    ]
    return "\n".join(lines), keep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--jsonl", default=os.path.join(REPO, "benchmarks", "seed_grid_r3.jsonl")
    )
    ap.add_argument("--md", default=os.path.join(REPO, "benchmarks", "MFU.md"))
    args = ap.parse_args()

    rows = load(args.jsonl)
    table, keep = render(rows)
    with open(args.md) as f:
        md = f.read()
    if BEGIN in md and END in md:
        pre = md[: md.index(BEGIN)]
        post = md[md.index(END) + len(END) :]
        md = pre + table + post
    elif BEGIN in md:
        md = md.replace(BEGIN, table)
    else:
        raise SystemExit(f"{args.md} has no {BEGIN} marker")
    with open(args.md, "w") as f:
        f.write(md)
    print(table)
    print(f"\ndecision: {'keep overdraw' if keep else 'revert to gumbel'}")


if __name__ == "__main__":
    main()
