#!/usr/bin/env python
"""Training CLI — the reference's ``nerf/run_nerf_acc.py`` entry point with
the exact same flag surface (run_nerf_acc.py:25-47).

Reads the two datagen CSVs, trains the CPPN with occupancy-accelerated
Beer-Lambert rendering, logs to TensorBoard under the reference's tag
names, exports highmodel/coarsemodel bundles + occupancy-grid VTKs.
"""

import glob
import os
import sys

# persistent XLA executable cache: re-runs skip remote compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()  # axon platform is off JAX's cache allowlist

    from nerf_for_angiography_tpu.data import load_data
    from nerf_for_angiography_tpu.parallel import create_mesh
    from nerf_for_angiography_tpu.training import parse_train_args, train

    cfg, data_dir = parse_train_args(argv)

    folder = os.path.join(
        data_dir, "stl/LCA" if cfg.data_name.upper() == "LCA" else "ct"
    )
    proj_csvs = sorted(glob.glob(os.path.join(folder, "df-*toproj.csv")))
    ray_csvs = sorted(glob.glob(os.path.join(folder, "df-rays-*.csv")))
    if not proj_csvs or not ray_csvs:
        raise SystemExit(
            f"no datagen CSVs under {folder}; run cli/datagen.py first"
        )
    print(f"loading {proj_csvs[-1]} + {ray_csvs[-1]}")
    data = load_data(proj_csvs[-1], ray_csvs[-1])

    from datetime import datetime

    exp_name = datetime.now().astimezone().strftime("%Y-%m-%d-%H%M")
    log_dir = os.path.join("cases", cfg.data_name, "runs", exp_name)
    os.makedirs(log_dir, exist_ok=True)

    import jax

    mesh = create_mesh() if len(jax.devices()) > 1 else None
    print(f"training on {len(jax.devices())} device(s), logs -> {log_dir}")
    result = train(
        cfg,
        data.rays,
        src_pt_z=data.src_pt_z,
        log_dir=log_dir,
        rays_per_view=data.rays_per_view,
        checkpoint_every=cfg.save_every,
        mesh=mesh,
    )
    print(
        f"done: best PSNR {result.best_psnr:.3f} at iter {result.best_iter}, "
        f"{result.rays_per_sec:.0f} rays/s"
    )


if __name__ == "__main__":
    main()
