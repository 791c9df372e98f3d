#!/usr/bin/env python
"""Phantom datagen CLI — the reference's ``phantomdata/cttoray.py`` /
``sdftoray.py`` entry point, with the same flags (cttoray.py:16-32) plus
``--data_name``/``--volume``/``--out``.

Renders the C-arm DRR sweep on device (sharded across chips when more than
one is attached), writes per-view PNGs, weight maps, ground-truth.vtk and
the two CSV artifacts with the reference schemas.

Without a volume asset, ``--volume phantom:vessel`` / ``phantom:sphere``
uses the built-in analytic phantoms (the reference's L0 assets are not
distributed, SURVEY.md L0).
"""

import argparse
import ast
import os
import sys

# persistent XLA executable cache: re-runs skip remote compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--limited_size", help="Angle range to sample the projections in")
    p.add_argument("--number_angles", help="Number of projections to sample per axis")
    p.add_argument("--center_point", help="Center point for the angle sampling")
    p.add_argument("--binary", help="Whether images are binary or not")
    p.add_argument(
        "--sampling_strategy",
        help="What sampling strategy to use, options: frangi, segmentation or random",
    )
    p.add_argument("--data_name", default="ct", help="ct or LCA")
    p.add_argument(
        "--volume",
        default="phantom:vessel",
        help="VTK volume path, or phantom:vessel / phantom:sphere / phantom:lca",
    )
    p.add_argument("--out", default="data", help="output root directory")
    p.add_argument("--img_size", default=None, help="override image size (pixels)")
    a = p.parse_args(argv)

    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()  # axon platform is off JAX's cache allowlist

    from nerf_for_angiography_tpu.data import (
        DatagenConfig,
        generate_dataset,
        make_lca_sdf_volume,
        make_sphere_volume,
        make_vessel_volume,
        write_proj_csv,
        write_rays_csv,
    )
    from nerf_for_angiography_tpu.data.datasets import sdf_datagen_config
    from nerf_for_angiography_tpu.data.volumes import (
        export_ground_truth_vtk,
        export_transferfunc_vtk,
        load_ct_volume,
        load_sdf_volume,
    )

    is_sdf = a.data_name.upper() == "LCA"
    kw = {}
    if a.limited_size is not None:
        kw["limited_size"] = float(a.limited_size)
    if a.number_angles is not None:
        kw["number_angles"] = float(a.number_angles)
    if a.center_point is not None:
        kw["center_point"] = tuple(ast.literal_eval(a.center_point))
    if a.binary is not None:
        kw["binary"] = a.binary == "True"
    if a.sampling_strategy is not None:
        kw["sampling_strategy"] = a.sampling_strategy
    if a.img_size is not None:
        kw["img_width"] = kw["img_height"] = int(a.img_size)

    cfg = sdf_datagen_config(**kw) if is_sdf else DatagenConfig(**kw)

    if a.volume == "phantom:vessel":
        volume = make_vessel_volume()
    elif a.volume == "phantom:sphere":
        volume = make_sphere_volume()
    elif a.volume == "phantom:lca":
        volume = make_lca_sdf_volume()
    elif is_sdf:
        volume = load_sdf_volume(a.volume)
    else:
        volume = load_ct_volume(a.volume, binary=cfg.binary)

    folder = os.path.join(a.out, "stl/LCA" if is_sdf else "ct")
    proj_folder = os.path.join(folder, "projections")
    os.makedirs(proj_folder, exist_ok=True)

    print(f"rendering {cfg.limited_size}/{cfg.number_angles} sweep on "
          f"{len(jax.devices())} device(s)...")
    ds = generate_dataset(volume, cfg)

    larm = cfg.larm
    for (theta, phi), img, wmap in zip(ds.angles, ds.images, ds.weight_maps):
        plt.imsave(
            f"{proj_folder}/image-{theta}-{phi}-{larm}.png",
            img, cmap="gray", vmin=0, vmax=1,
        )
        plt.imsave(f"{proj_folder}/image-transform-{theta}-{phi}-{larm}.png", wmap)

    export_ground_truth_vtk(volume, os.path.join(folder, "ground-truth.vtk"))

    binary_str = "binary" if cfg.binary else ""
    # transfer-function side artifact (helpers.py:122-126): the volume's
    # lattice with transfer-applied scalars; 'binary' suffix + VTK binary
    # mode when the binary transfer variant was used
    export_transferfunc_vtk(
        volume, os.path.join(folder, f"transferfunc{binary_str}.vtk"),
        binary=cfg.binary,
    )
    if cfg.number_angles > 0 and cfg.limited_size != 360:
        file_name = f"background-{cfg.limited_size}-{cfg.number_angles}-{list(cfg.center_point)}"
        if cfg.binary:
            file_name = f"limited-sparse-{cfg.limited_size}-{cfg.number_angles}-{list(cfg.center_point)}"
    else:
        file_name = "clinical-angles"
    tag = "sdftoproj" if is_sdf else "cttoproj"
    write_proj_csv(ds, os.path.join(folder, f"df-{file_name}-{binary_str}-{tag}.csv"))
    write_rays_csv(
        ds, os.path.join(folder, f"df-rays-{file_name}-{binary_str}-{cfg.img_height}.csv")
    )
    print(f"wrote {len(ds.angles)} views to {folder}")


if __name__ == "__main__":
    main()
