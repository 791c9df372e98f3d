"""Analysis plots: metric-vs-limited-angle line charts.

Re-implements ``analysis/analysis.py`` with a WORKING data loader (the
reference's was stripped — analysis.py:83-85 leaves ``df = None``,
SURVEY.md §2.9-bis): experiments are discovered from run directories'
``readme.txt`` metadata + ``df-metrics.csv`` tables written by the
evaluation layer. The Notion-style filter predicates (analysis.py:61-75)
are reproduced as plain dict filters, the truncated-colormap helper
(analysis.py:8-13) and per-metric axis cosmetics (analysis.py:162-199)
kept.
"""

from __future__ import annotations

import os

import matplotlib
import numpy as np
import pandas as pd

matplotlib.use("Agg")
import matplotlib.colors as mcolors  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402

# the reference's hard-coded experimental PSNR ceiling (analysis.py:57)
PSNR_MAX = 47.8239

# per-metric plot envelopes (analysis.py:182-199)
METRIC_LIMITS = {
    "PSNR": (5, 48),
    "SSIM": (0.1, 1.0),
    "DICE 2D": (0.0, 1.0),
    "LPIPS": (0.0, 1.0),
    "DISTS": (0.0, 1.0),
}


def get_cmap(base: str = "viridis", minval: float = 0.0, maxval: float = 1.0, n: int = 256):
    """Truncated colormap helper (analysis.py:8-13)."""
    cmap = plt.get_cmap(base)
    return mcolors.LinearSegmentedColormap.from_list(
        f"trunc({base},{minval:.2f},{maxval:.2f})",
        cmap(np.linspace(minval, maxval, n)),
    )


def load_experiments(cases_root: str = "cases") -> pd.DataFrame:
    """Working loader: one row per (run, sweep view-summary).

    Collects each run's readme.txt key=value metadata (written by
    training/loop.py in the reference's page_data shape) and the min/mean of
    every metric column in its df-metrics.csv.
    """
    rows = []
    for data_name in sorted(os.listdir(cases_root)) if os.path.isdir(cases_root) else []:
        runs = os.path.join(cases_root, data_name, "runs")
        if not os.path.isdir(runs):
            continue
        for run in sorted(os.listdir(runs)):
            rd = os.path.join(runs, run)
            meta_path = os.path.join(rd, "readme.txt")
            metrics_path = os.path.join(rd, "df-metrics.csv")
            if not os.path.exists(metrics_path):
                continue
            meta = {}
            if os.path.exists(meta_path):
                for line in open(meta_path):
                    if "=" in line:
                        k, v = line.strip().split("=", 1)
                        meta[k] = v
            md = pd.read_csv(metrics_path, sep=";", index_col=0)
            row = {
                "run": run,
                "data_name": data_name,
                "Limited projections": float(meta.get("Limited projections", np.nan)),
                "Sparse projections": float(meta.get("Sparse projections", np.nan)),
                "Model architecture": meta.get("Model architecture", "4x128"),
                "Sampling": meta.get("Sampling", ""),
                "Binary": meta.get("Binary", "False") == "True",
            }
            for m in METRIC_LIMITS:
                if m in md.columns:
                    row[f"{m} mean"] = float(md[m].mean())
                    row[f"{m} min"] = float(md[m].min())
            rows.append(row)
    return pd.DataFrame(rows)


def apply_filters(df: pd.DataFrame, filters: dict) -> pd.DataFrame:
    """Plain-dict reincarnation of the Notion-style filter predicates
    (analysis.py:61-75): {'column': value} equality / {'column': (lo, hi)}
    range / {'column': [v1, v2]} membership."""
    out = df
    for col, cond in filters.items():
        if isinstance(cond, tuple) and len(cond) == 2:
            out = out[(out[col] >= cond[0]) & (out[col] <= cond[1])]
        elif isinstance(cond, list):
            out = out[out[col].isin(cond)]
        else:
            out = out[out[col] == cond]
    return out


def plot_metric_vs_limited_angle(
    df: pd.DataFrame,
    metric: str = "PSNR",
    group_by: str = "Sparse projections",
    agg: str = "mean",
    out_path: str | None = None,
    filters: dict | None = None,
):
    """Line chart: metric vs limited-angle range, one line per group
    (sparse-projection count / architecture / sampling — analysis.py's
    chart families)."""
    if filters:
        df = apply_filters(df, filters)
    col = f"{metric} {agg}"
    if col not in df.columns or len(df) == 0:
        raise ValueError(f"no data for {col}")

    fig, ax = plt.subplots(figsize=(8, 5))
    cmap = get_cmap("viridis", 0.1, 0.9)
    groups = sorted(df[group_by].dropna().unique(), key=str)
    for i, g in enumerate(groups):
        sub = df[df[group_by] == g].sort_values("Limited projections")
        ax.plot(
            sub["Limited projections"], sub[col],
            marker="o", label=f"{group_by}={g}",
            color=cmap(i / max(len(groups) - 1, 1)),
        )
    lo, hi = METRIC_LIMITS.get(metric, (None, None))
    if lo is not None:
        ax.set_ylim(lo, hi)
    if metric == "PSNR":
        ax.axhline(PSNR_MAX, ls="--", c="gray", lw=0.8, label="max observed")
    ax.set_xlabel("Limited angle range (degrees)")
    ax.set_ylabel(f"{metric} ({agg})")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
        plt.close(fig)
    return fig
