#!/usr/bin/env python
"""Evaluation/export CLI — the reference's ``visualization/visualization.py``
entry point with its flag surface (visualization.py:47-57: --binary,
--data_name) plus explicit run/volume paths.

For each run under cases/<data_name>/runs/: restores the model bundle and
occupancy grid, renders the 37x37 sweep, computes metrics, writes
df-metrics.csv, PNGs, VTK field, videos, heatmap PNG + cag-vis JSONs.
"""

import argparse
import os
import sys

# persistent XLA executable cache: re-runs skip remote compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--binary", help="Whether images are binary or not")
    p.add_argument("--data_name", default="ct", help="Either CT data or LCA data")
    p.add_argument("--run_dir", default=None, help="specific run directory")
    p.add_argument(
        "--volume", default="phantom:vessel",
        help="GT volume: VTK path or phantom:vessel / phantom:sphere / phantom:lca",
    )
    p.add_argument("--perceptual_weights", default=None,
                   help=".npz from tools/convert_perceptual_weights.py")
    p.add_argument(
        "--uncalibrated_perceptual", action="store_true", default=True,
        help="compute LPIPS/DISTS with the fixed-random VGG backend when no "
             "pretrained weights are given (marked calibrated=false in "
             "df-metrics.csv and the heatmap JSONs); the default — disable "
             "with --no_perceptual",
    )
    p.add_argument("--no_perceptual", action="store_true",
                   help="skip LPIPS/DISTS entirely")
    p.add_argument("--number_angles_vis", default=None,
                   help="sweep density (default 36 -> 37x37 views)")
    p.add_argument("--img_size", default=None, help="override image size")
    p.add_argument("--depth_samples", default=None, help="samples per ray")
    p.add_argument("--field_resolution", default=None,
                   help="3D field export lattice (default 201)")
    p.add_argument("--no_videos", action="store_true")
    a = p.parse_args(argv)
    binary = a.binary == "True"

    import jax
    import numpy as np

    from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()  # axon platform is off JAX's cache allowlist

    from nerf_for_angiography_tpu.data import (
        make_lca_sdf_volume,
        make_sphere_volume,
        make_vessel_volume,
    )
    from nerf_for_angiography_tpu.data.volumes import load_ct_volume, load_sdf_volume
    from nerf_for_angiography_tpu.evaluation import (
        EvalConfig,
        PerceptualMetrics,
        gt_from_volume,
        lca_eval_config,
        run_sweep,
    )
    from nerf_for_angiography_tpu.models import CPPN, CPPNConfig
    from nerf_for_angiography_tpu.ops.interpolation import trilinear
    from nerf_for_angiography_tpu.training import load_grid_vtk, load_model

    is_lca = a.data_name.upper() == "LCA"
    kw = {"binary": binary}
    if a.number_angles_vis:
        kw["number_angles_vis"] = float(a.number_angles_vis)
    if a.img_size:
        kw["img_width"] = kw["img_height"] = int(a.img_size)
    if a.depth_samples:
        kw["depth_samples_per_ray"] = int(a.depth_samples)
    if a.field_resolution:
        kw["field_resolution"] = int(a.field_resolution)
    if a.no_videos:
        kw["save_videos"] = False
    cfg = lca_eval_config(**kw) if is_lca else EvalConfig(**kw)

    if a.volume == "phantom:vessel":
        volume = make_vessel_volume()
    elif a.volume == "phantom:sphere":
        volume = make_sphere_volume()
    elif a.volume == "phantom:lca":
        volume = make_lca_sdf_volume()
    elif is_lca:
        volume = load_sdf_volume(a.volume)
    else:
        volume = load_ct_volume(a.volume, binary=binary)

    # perceptual backend: pretrained weights if provided, else the
    # fixed-random uncalibrated VGG (reference defaults evaluate and heatmap
    # DISTS/LPIPS, visualization.py:38-39; without egress the calibrated
    # weights can't exist here, so uncalibrated values — flagged
    # calibrated=false — keep the metric/export surface intact)
    perceptual = None
    if a.perceptual_weights:
        perceptual = PerceptualMetrics.from_npz(a.perceptual_weights)
    elif a.uncalibrated_perceptual and not a.no_perceptual:
        perceptual = PerceptualMetrics.uncalibrated()
        print("LPIPS/DISTS: uncalibrated random-VGG backend "
              "(no --perceptual_weights); values flagged calibrated=false")

    if a.run_dir:
        run_dirs = [a.run_dir]
    else:
        root = os.path.join("cases", a.data_name, "runs")
        run_dirs = sorted(
            (os.path.join(root, d) for d in os.listdir(root)), reverse=True
        )

    for rd in run_dirs:
        model_path = os.path.join(rd, "highmodel.npz")
        grid_path = os.path.join(rd, "coarsegrid.vtk")
        if not os.path.exists(model_path):
            print(f"{rd}: no highmodel.npz, skipping")
            continue
        print(f"evaluating {rd}")
        meta, params = load_model(model_path)
        mdef = meta["parameters"]
        mcfg = CPPNConfig(
            num_early_layers=mdef["num_early_layers"],
            num_late_layers=mdef["num_late_layers"],
            num_filters=mdef["num_filters"],
            pos_enc=mdef["pos_enc"],
            pos_enc_basis=mdef["pos_enc_basis"],
            act_func="relu",  # visualization.py:180 forces relu
            input_scale=1.0 / cfg.outside,
        )
        model = CPPN(mcfg)
        aabb = np.array([-cfg.outside] * 3 + [cfg.outside] * 3, np.float32)
        grid = load_grid_vtk(grid_path, aabb)

        # rebuild the experiment metadata the trainer recorded (readme.txt,
        # the reference's page_data registry) so jsonData uses the same
        # experiment naming cag-vis expects
        page_data = None
        readme = os.path.join(rd, "readme.txt")
        if os.path.exists(readme):
            import ast as _ast

            page_data = {}
            for line in open(readme):
                if "=" not in line:
                    continue
                k, v = line.strip().split("=", 1)
                try:
                    page_data[k] = _ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    page_data[k] = v

        gt = gt_from_volume(volume, cfg)
        # multi-chip: shard sweep views across all local devices
        mesh = None
        if len(jax.devices()) > 1:
            from nerf_for_angiography_tpu.parallel import create_mesh

            mesh = create_mesh()
        run_sweep(
            model, params, grid, cfg, gt, rd,
            page_data=page_data,
            perceptual=perceptual,
            gt_volume_sampler=lambda pts: trilinear(volume, pts),
            mesh=mesh,
        )
        print(f"  wrote df-metrics.csv + exports under {rd}")


if __name__ == "__main__":
    main()
