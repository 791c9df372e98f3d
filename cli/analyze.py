#!/usr/bin/env python
"""Analysis CLI — the reference's ``analysis/analysis.py`` entry point, with
a working experiment loader (reads run dirs + df-metrics.csv instead of the
removed registry)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cases_root", default="cases")
    p.add_argument("--metric", default="PSNR")
    p.add_argument("--group_by", default="Sparse projections")
    p.add_argument("--agg", default="mean", choices=["mean", "min"])
    p.add_argument("--out", default="analysis-plot.png")
    a = p.parse_args(argv)

    from nerf_for_angiography_tpu.analysis import (
        load_experiments,
        plot_metric_vs_limited_angle,
    )

    df = load_experiments(a.cases_root)
    if len(df) == 0:
        raise SystemExit(f"no evaluated runs under {a.cases_root}")
    print(f"loaded {len(df)} experiments")
    plot_metric_vs_limited_angle(
        df, metric=a.metric, group_by=a.group_by, agg=a.agg, out_path=a.out
    )
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
