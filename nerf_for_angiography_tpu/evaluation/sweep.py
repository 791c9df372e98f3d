"""Evaluation/export driver: the TPU-native redesign of
``visualization/visualization.py``.

Renders the trained field over a dense 360-degree angle sweep (37x37 views,
ref :63-65,188-191), computes per-view metrics, exports:
  * per-view pred / binary-pred PNGs (:399-400)
  * df-metrics.csv with the reference's schema + min/mean/std summary
    (:456-535)
  * a dense 3D field VTK (201^3 query grid through the model, :203-238)
  * theta/phi rotation videos (:537-546)
  * polar heatmap PNGs + cag-vis JSONs (:572-657 via heatmap.py)

TPU-first: views render in vmapped batches through the same fused
render path as training (one jit program per batch instead of the
reference's per-view chunked CPU loop); GT projections can be produced
on-device from the phantom volume instead of PNG reads.
"""

from __future__ import annotations

import dataclasses
import itertools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..geometry import get_ray_values, linspace_depths, query_points
from ..models import CPPN
from ..ops.interpolation import RegularGrid
from ..ops.occupancy import OccupancyGrid
from ..training.config import TrainConfig
from ..training.train import render_rays, render_rays_with_binary
from ..utils.vtk import write_structured_grid
from .heatmap import experiment_naming, get_2d_heatmap, normalize_cam_poses
from .metrics import binarize, dice_micro, dot_score, psnr, ssim
from .video import get_videos


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Mirrors visualization.py:33-98 constants per data_name."""

    data_name: str = "ct"
    binary: bool = False
    limited_size_vis: float = 360.0
    number_angles_vis: float = 36.0
    outside: float = 100.0
    focal_length: float = 1300.0
    src_z_offset: float = 200.0  # ct: src=[0,0,f+200]; LCA: [0,0,f]
    img_width: int = 100
    img_height: int = 100
    sample_outside: float = 75.0
    depth_samples_per_ray: int = 200
    chunk_views: int = 4
    # superset of the reference's default list ['DISTS','LPIPS','PSNR']
    # (visualization.py:38): LPIPS/DISTS are computed whenever a perceptual
    # backend is passed to run_sweep; DICE 3D/DOT 3D whenever a GT volume
    # sampler is passed (visualization.py:480-505).
    metrics: tuple = (
        "PSNR", "SSIM", "DICE 2D", "DOT 2D", "DICE 3D", "DOT 3D",
        "LPIPS", "DISTS",
    )
    binary_thresh: float = 0.05  # visualization.py:172
    field_resolution: int = 201  # visualization.py:102 (200+1)
    save_vtk: bool = True
    save_videos: bool = True
    save_heatmap: bool = True
    # None = export heatmap JSONs for EVERY computed per-view metric, so
    # every metric radio in cag-vis resolves (VERDICT r1 #4); a tuple
    # restricts the set.
    heatmap_metrics: tuple | None = None
    center_point: tuple = (90.0, 0.0)

    @property
    def src_pt(self):
        return np.array([0.0, 0.0, self.focal_length + self.src_z_offset], np.float32)

    @property
    def near_thresh(self) -> float:
        return float(self.src_pt[2] - self.sample_outside)

    @property
    def far_thresh(self) -> float:
        return float(self.src_pt[2] + self.sample_outside)


def lca_eval_config(**kw) -> EvalConfig:
    """LCA preset (visualization.py:86-98)."""
    base = dict(
        data_name="LCA", focal_length=4000.0, src_z_offset=0.0, img_width=150,
        img_height=162, sample_outside=80.0, outside=80.0,
        depth_samples_per_ray=200,
    )
    base.update(kw)
    return EvalConfig(**base)


def sweep_angles(cfg: EvalConfig) -> np.ndarray:
    """37x37 view grid (visualization.py:188-191)."""
    step = cfg.limited_size_vis / cfg.number_angles_vis
    th = np.arange(
        -cfg.limited_size_vis // 2, cfg.limited_size_vis // 2 + 1, step
    ).astype("float64")
    return np.array([list(v) for v in itertools.product(th, th)])


def gt_from_volume(volume: RegularGrid, cfg: EvalConfig) -> Callable:
    """On-device GT DRR provider (replaces the PNG reads at
    visualization.py:285-287): renders with the datagen pipeline and the
    sweep's camera intrinsics."""
    from ..data.drr import render_drr

    depths = linspace_depths(
        cfg.near_thresh, cfg.far_thresh, cfg.depth_samples_per_ray
    )

    def gt(theta_360: float, phi_360: float) -> np.ndarray:
        o, d, _ = get_ray_values(
            theta_360, phi_360, 0.0, cfg.src_pt, cfg.img_width, cfg.img_height,
            cfg.focal_length,
        )
        mode = "sdf" if cfg.data_name != "ct" else "ct"
        return np.asarray(render_drr(volume, o, d, depths, mode))

    return gt


def _view_render_fn(model: CPPN, grid_template, cfg: EvalConfig):
    """The raw (unjitted) per-view render closure shared by the scalar and
    batched renderers."""
    tc = TrainConfig(
        depth_samples_per_ray=cfg.depth_samples_per_ray,
        outside=cfg.outside,
        alpha_thre=1e-4,
        early_stop_eps=1e-2,
        # the safe_occ_stride guard needs the REAL loaded grid resolution,
        # not the training default
        grid_resolution=int(grid_template.resolution),
        # eval has no auto-switch guard against window truncation (training
        # gates the window march on span coverage, loop.py) — keep the
        # exact per-sample lattice masking here
        march_mode="lattice",
    )

    def render(params, grid, theta_360, phi_360):
        o, d, c2w = get_ray_values(
            theta_360, phi_360, 0.0, cfg.src_pt, cfg.img_width, cfg.img_height,
            cfg.focal_length,
        )
        of = o.reshape(-1, 3)
        df_ = d.reshape(-1, 3)
        if cfg.data_name == "ct":
            pixels, bpixels = render_rays_with_binary(
                model, params, grid, of, df_, tc, cfg.near_thresh,
                cfg.far_thresh, binary_thresh=cfg.binary_thresh,
            )
        else:
            depths = linspace_depths(
                cfg.near_thresh, cfg.far_thresh, cfg.depth_samples_per_ray
            )
            pts = query_points(of, df_, depths)
            raw = model.apply(params, pts.reshape(-1, 3))
            sigma = jax.nn.sigmoid(raw[..., -1]).reshape(of.shape[0], -1)
            dists = jnp.concatenate(
                [depths[1:] - depths[:-1], jnp.full((1,), 1e10)], 0
            )
            pixels = jnp.exp(-jnp.sum(sigma * dists, -1))
            bsigma = jnp.where(sigma < cfg.binary_thresh, 0.0, sigma)
            bpixels = jnp.exp(-jnp.sum(bsigma * dists, -1))
        return pixels, bpixels, c2w

    return render


def make_view_renderer(model: CPPN, grid_template, cfg: EvalConfig):
    """One jitted renderer reused for every sweep view (angles are traced
    scalars — 1369 views compile ONCE, unlike the reference's per-view
    chunked host loop, visualization.py:277-397)."""
    return jax.jit(_view_render_fn(model, grid_template, cfg))


def make_batch_view_renderer(
    model: CPPN, grid_template, cfg: EvalConfig, mesh=None
):
    """Batched sweep renderer: (thetas, phis) (B,) -> stacked images.

    Renders chunk_views*n_devices views per dispatch with the view axis
    sharded over the mesh (multi-chip eval — no reference counterpart,
    SURVEY.md §2 parallelism). Params/grid are replicated; each device
    renders its slice of views independently, so the only collective is the
    output gather XLA inserts. Single-device this is pure dispatch
    amortization over the 1369-view sweep."""
    render = _view_render_fn(model, grid_template, cfg)
    batched = jax.vmap(render, in_axes=(None, None, 0, 0))
    if mesh is None:
        return jax.jit(batched)
    from jax.sharding import NamedSharding, PartitionSpec as P

    views = NamedSharding(mesh, P(mesh.axis_names[0]))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        batched,
        in_shardings=(replicated, replicated, views, views),
        out_shardings=views,
    )


def render_view_pair(
    model: CPPN,
    params,
    grid: OccupancyGrid,
    cfg: EvalConfig,
    theta_360: float,
    phi_360: float,
    renderer=None,
):
    """Pred + binary-pred images for one view.

    ct: grid-pruned masked render, binary via zeroing densities below
    binary_thresh (the reference's zero_idx, visualization.py:329-355).
    LCA: dense un-pruned render over linspace depths (:356-397).
    """
    if renderer is None:
        renderer = make_view_renderer(model, grid, cfg)
    H, W = cfg.img_height, cfg.img_width
    pixels, bpixels, c2w = renderer(
        params, grid, jnp.float32(theta_360), jnp.float32(phi_360)
    )
    return (
        np.asarray(pixels).reshape(H, W),
        np.asarray(bpixels).reshape(H, W),
        np.asarray(c2w),
    )


def render_sweep_views(
    model: CPPN,
    params,
    grid: OccupancyGrid,
    cfg: EvalConfig,
    angles: np.ndarray,
    mesh=None,
) -> list:
    """Render every (theta, phi) in ``angles`` with the batched (optionally
    mesh-sharded) renderer; returns [(pred HxW, bpred HxW, c2w 4x4), ...]
    in input order. The view list is padded to a full final batch (the
    sharded axis needs equal per-device extents); padding views are
    rendered and dropped."""
    H, W = cfg.img_height, cfg.img_width
    n_dev = mesh.size if mesh is not None else 1
    batch = max(1, cfg.chunk_views) * n_dev
    t360 = np.where(angles[:, 0] >= 0, angles[:, 0], 360 + angles[:, 0])
    p360 = np.where(angles[:, 1] >= 0, angles[:, 1], 360 + angles[:, 1])
    n = len(angles)
    n_pad = (-n) % batch
    t360 = np.concatenate([t360, np.full(n_pad, t360[-1] if n else 0.0)])
    p360 = np.concatenate([p360, np.full(n_pad, p360[-1] if n else 0.0)])
    renderer = make_batch_view_renderer(model, grid, cfg, mesh=mesh)
    out = []
    for s in range(0, n + n_pad, batch):
        px, bpx, c2w = renderer(
            params, grid,
            jnp.asarray(t360[s:s + batch], jnp.float32),
            jnp.asarray(p360[s:s + batch], jnp.float32),
        )
        px = np.asarray(px)
        bpx = np.asarray(bpx)
        c2w = np.asarray(c2w)
        for k in range(min(batch, n - s)):
            out.append((px[k].reshape(H, W), bpx[k].reshape(H, W), c2w[k]))
    return out


def export_field_vtk(
    model: CPPN, params, cfg: EvalConfig, path: str, chunk: int = 262144
) -> np.ndarray:
    """Dense 3D field export: query a field_resolution^3 lattice through the
    model, write a StructuredGrid VTK (visualization.py:203-238)."""
    t = np.linspace(-cfg.outside, cfg.outside, cfg.field_resolution, dtype=np.float32)
    gx, gy, gz = np.meshgrid(t, t, t)  # reference uses default 'xy' indexing
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    sig = jax.jit(lambda p, x: jax.nn.sigmoid(model.apply(p, x)[..., -1]))
    out = np.empty(pts.shape[0], np.float32)
    for s in range(0, pts.shape[0], chunk):
        out[s : s + chunk] = np.asarray(sig(params, jnp.asarray(pts[s : s + chunk])))

    # VTK x-fastest ordering over the meshgrid layout
    vtk_pts = np.stack(
        [gx.transpose(2, 1, 0).ravel(), gy.transpose(2, 1, 0).ravel(),
         gz.transpose(2, 1, 0).ravel()], -1,
    )
    vtk_scalars = out.reshape(gx.shape).transpose(2, 1, 0).ravel()
    write_structured_grid(
        path, vtk_pts, (cfg.field_resolution,) * 3, {"scalars": vtk_scalars},
        binary=True,  # 201^3 points; ASCII is ~100x slower
    )
    return out.reshape(gx.shape)


def run_sweep(
    model: CPPN,
    params,
    grid: OccupancyGrid,
    cfg: EvalConfig,
    gt_fn: Callable,
    store_folder_name: str,
    page_data: dict | None = None,
    perceptual=None,
    gt_volume_sampler: Callable | None = None,
    verbose: bool = True,
    mesh=None,
) -> pd.DataFrame:
    """Full evaluation of one trained run. Returns the metric DataFrame
    (also written as df-metrics.csv). With ``mesh``, sweep views are
    sharded across its devices (cfg.chunk_views per device per dispatch)."""
    os.makedirs(store_folder_name, exist_ok=True)
    proj_dir = os.path.join(store_folder_name, "projections")
    os.makedirs(proj_dir, exist_ok=True)

    # grayscale PNG writer: PIL is ~10x faster than matplotlib imsave on the
    # single-core host; content-equivalent to imsave(cmap='gray',vmin=0,vmax=1)
    from PIL import Image

    def imsave_gray(path, img):
        arr = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        Image.fromarray(arr, mode="L").save(path)

    angles = sweep_angles(cfg)
    preds = render_sweep_views(model, params, grid, cfg, angles, mesh=mesh)
    rows = []
    for (theta, phi), (pred, bpred, c2w) in zip(angles, preds):
        theta_360 = theta if theta >= 0 else 360 + theta
        phi_360 = phi if phi >= 0 else 360 + phi
        image_id = f"{theta}-{phi}".replace(".", ",")

        target = np.asarray(gt_fn(theta_360, phi_360), np.float32)

        file_image_id = f"image-{theta}-{phi}-0"
        imsave_gray(f"{proj_dir}/{file_image_id}.png", pred)
        imsave_gray(f"{proj_dir}/{file_image_id}-binary.png", bpred)

        row = {
            "image_id": image_id,
            "theta": theta,
            "phi": phi,
            "larm": 0,
            "theta_360": theta_360,
            "phi_360": phi_360,
            "cam_pose_x": c2w[0, -1],
            "cam_pose_y": c2w[1, -1],
            "cam_pose_z": c2w[2, -1],
        }
        pj = jnp.asarray(pred)
        tj = jnp.asarray(target)
        if "PSNR" in cfg.metrics:
            row["PSNR"] = float(psnr(pj, tj))
        if "SSIM" in cfg.metrics:
            row["SSIM"] = float(ssim(pj, tj))
        if "DICE 2D" in cfg.metrics:
            row["DICE 2D"] = float(dice_micro(binarize(jnp.asarray(bpred)), binarize(tj)))
        if "DOT 2D" in cfg.metrics:
            row["DOT 2D"] = float(dot_score(pj, tj))
        if perceptual is not None and "LPIPS" in cfg.metrics:
            row["LPIPS"] = float(perceptual.lpips(pj, tj))
        if perceptual is not None and "DISTS" in cfg.metrics:
            row["DISTS"] = float(perceptual.dists(pj, tj))

        row["pred_img"] = np.round(pred.reshape(-1), 10).tolist()
        row["binary_pred_img"] = np.round(bpred.reshape(-1), 10).tolist()
        row["org_img"] = target.reshape(-1).tolist()
        rows.append(row)
        if verbose and len(rows) % 100 == 0:
            print(f"  sweep {len(rows)}/{len(angles)}")

    df = pd.DataFrame(rows)

    # 3D field export + DICE/DOT 3D (visualization.py:203-238,480-505)
    if cfg.save_vtk or "DICE 3D" in cfg.metrics or "DOT 3D" in cfg.metrics:
        field = export_field_vtk(
            model, params, cfg, os.path.join(store_folder_name, "coarse-field.vtk")
        )
        if gt_volume_sampler is not None:
            t = np.linspace(
                -cfg.outside, cfg.outside, cfg.field_resolution, dtype=np.float32
            )
            gx, gy, gz = np.meshgrid(t, t, t)
            pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))
            gt_field = np.asarray(gt_volume_sampler(pts)).reshape(gx.shape)
            if "DICE 3D" in cfg.metrics:
                thr = gt_field.mean()
                df["DICE 3D"] = float(
                    dice_micro(
                        jnp.asarray(field >= thr), jnp.asarray(gt_field >= thr)
                    )
                )
            if "DOT 3D" in cfg.metrics:
                df["DOT 3D"] = float(
                    dot_score(jnp.asarray(field), jnp.asarray(gt_field))
                )

    metric_cols = [c for c in df.columns if c in (
        "PSNR", "SSIM", "LPIPS", "DISTS", "DICE 2D", "DOT 2D", "DICE 3D", "DOT 3D",
    )]
    # calibration marker for the perceptual columns (uncalibrated = the
    # random-VGG backend; values are self-consistent but not piq-comparable)
    if perceptual is not None and ("LPIPS" in df.columns or "DISTS" in df.columns):
        df["perceptual_calibrated"] = bool(perceptual.calibrated)
    df[
        [c for c in df.columns if c not in ("pred_img", "binary_pred_img", "org_img")]
    ].to_csv(os.path.join(store_folder_name, "df-metrics.csv"), sep=";")

    # min/mean/std summary (visualization.py:519-535)
    summary = {}
    for m in metric_cols:
        summary[f"{m} min"] = round(float(df[m].min()), 6)
        summary[f"{m} mean"] = round(float(df[m].mean()), 6)
        summary[f"{m} std"] = round(float(df[m].std(ddof=0)), 6)
    with open(os.path.join(store_folder_name, "metrics-summary.txt"), "w") as f:
        for k, v in summary.items():
            f.write(f"{k}={v}\n")

    if cfg.save_videos:
        theta_rows = df[df["phi"] == 0.0].to_dict("records")
        get_videos(theta_rows, "theta-rotation", cfg.img_height, cfg.img_width, proj_dir)
        phi_rows = df[df["theta"] == 0.0].to_dict("records")
        get_videos(phi_rows, "phi-rotation", cfg.img_height, cfg.img_width, proj_dir)

    if cfg.save_heatmap:
        normalize_cam_poses(df)
        experiment, exp_name = experiment_naming(
            page_data or {}, cfg.center_point
        )
        exp_folder = os.path.join(store_folder_name, "jsonData", experiment, exp_name)
        # per-metric color ranges (visualization.py:643-649; everything else
        # defaults to [0,1] incl. LPIPS/DISTS)
        vmm = {"PSNR": (15, 50), "SSIM": (0.8, 1), "DICE 2D": (0.3, 1)}
        # 3D metrics are one scalar per run — a constant heatmap is
        # meaningless, so only per-view metrics export (as the reference
        # does, visualization.py:519,573)
        heat = cfg.heatmap_metrics
        if heat is None:
            heat = [m for m in metric_cols if m not in ("DICE 3D", "DOT 3D")]
        extra = None
        if perceptual is not None and not perceptual.calibrated:
            extra = {"calibrated": False}
        for metric in heat:
            if metric not in df.columns:
                continue
            for nm in ("top", "bottom"):
                get_2d_heatmap(
                    df, store_folder_name, exp_folder, name=nm, x_axis="X",
                    y_axis="Z", metric=metric,
                    vminmax=vmm.get(metric, (0.0, 1.0)),
                    center_point=cfg.center_point,
                    json_extra=extra if metric in ("LPIPS", "DISTS") else None,
                )

    return df
