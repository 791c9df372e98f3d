"""Full-pipeline test through the CLI surfaces: datagen -> train ->
evaluate -> analyze, on a micro phantom in a temp workspace."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # the CLI must win over the axon sitecustomize platform pin
    env["JAX_PLATFORM_NAME"] = "cpu"
    path = os.path.join(REPO, "cli", script)
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         f"import sys; sys.argv = ['x'] + {args!r};"
         f"p = {path!r};"
         "exec(compile(open(p).read(), p, 'exec'),"
         " {'__file__': p, '__name__': '__main__'})"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.mark.slow
def test_full_cli_pipeline(tmp_path):
    ws = str(tmp_path)

    # 1. datagen on the analytic vessel phantom, tiny images
    out = run_cli(
        "datagen.py",
        ["--limited_size", "90", "--number_angles", "2", "--img_size", "16",
         "--volume", "phantom:sphere", "--out", "data"],
        ws,
    )
    folder = os.path.join(ws, "data", "ct")
    csvs = [f for f in os.listdir(folder) if f.endswith(".csv")]
    assert len(csvs) == 2, csvs
    pngs = os.listdir(os.path.join(folder, "projections"))
    assert any(p.startswith("image-") for p in pngs)
    assert os.path.exists(os.path.join(folder, "ground-truth.vtk"))
    assert os.path.exists(os.path.join(folder, "transferfunc.vtk"))

    # 2. train for a few iterations (small grid/depth for CPU CI)
    run_cli(
        "train.py",
        ["--n_iters", "30", "--grid_resolution", "8", "--depth_samples", "32",
         "--display_every", "15"],
        ws,
    )
    runs_root = os.path.join(ws, "cases", "ct", "runs")
    runs = os.listdir(runs_root)
    assert len(runs) == 1
    rd = os.path.join(runs_root, runs[0])
    assert os.path.exists(os.path.join(rd, "highmodel.npz"))
    assert os.path.exists(os.path.join(rd, "coarsegrid.vtk"))

    # 3. evaluate through the real CLI surface with the small-sweep knobs
    run_cli(
        "evaluate.py",
        ["--data_name", "ct", "--volume", "phantom:sphere",
         "--number_angles_vis", "2", "--img_size", "16",
         "--depth_samples", "32", "--field_resolution", "9", "--no_videos"],
        ws,
    )
    assert os.path.exists(os.path.join(rd, "df-metrics.csv"))
    md = pd.read_csv(os.path.join(rd, "df-metrics.csv"), sep=";", index_col=0)
    assert "PSNR" in md.columns
    # jsonData lands under the experiment naming the web app builds
    json_root = os.path.join(rd, "jsonData")
    assert os.path.isdir(json_root)
    exps = os.listdir(json_root)
    assert any(e.endswith("-ct") for e in exps), exps

    # 4. analyze
    run_cli("analyze.py", ["--cases_root", "cases", "--out", "plot.png"], ws)
    assert os.path.exists(os.path.join(ws, "plot.png"))


def test_volumes_roundtrip(tmp_path):
    """VTK volume -> load_ct_volume -> sampling matches the transfer of the
    raw values."""
    import jax.numpy as jnp

    from nerf_for_angiography_tpu.data.transfer import transfer_func_ct
    from nerf_for_angiography_tpu.data.volumes import load_ct_volume, load_sdf_volume
    from nerf_for_angiography_tpu.ops.interpolation import trilinear
    from nerf_for_angiography_tpu.utils.vtk import write_structured_points

    rs = np.random.RandomState(0)
    vals = (rs.rand(9, 9, 9) * 4000).astype(np.float32)
    p = str(tmp_path / "ct.vtk")
    write_structured_points(p, vals, origin=(0, 0, 0), spacing=(1, 1, 1), name="scalars")

    vol = load_ct_volume(p, extra_translation=(0, 0, 0))
    # grid is centered: origin should be -4 per axis
    np.testing.assert_allclose(np.asarray(vol.origin), [-4, -4, -4], atol=1e-5)
    # sampling at the (shifted) grid node returns transfer(raw)
    got = float(trilinear(vol, jnp.array([0.0, 0.0, 0.0])))
    want = float(transfer_func_ct(jnp.asarray(vals[4, 4, 4])))
    assert got == pytest.approx(want, abs=1e-5)

    sdfvals = (rs.rand(9, 9, 9) * 4 - 2).astype(np.float32)
    ps = str(tmp_path / "sdf.vtk")
    write_structured_points(ps, sdfvals, name="scalars")
    svol = load_sdf_volume(ps, scale=0.5)
    assert np.asarray(svol.values).min() >= 0.0
    assert np.asarray(svol.values).max() <= 1.0


def test_structured_grid_volume_regridding(tmp_path):
    """STRUCTURED_GRID volumes with shuffled point order re-grid correctly
    via the KDTree pass (helpers.py:143-148 parity)."""
    import jax.numpy as jnp

    from nerf_for_angiography_tpu.data.volumes import load_sdf_volume
    from nerf_for_angiography_tpu.ops.interpolation import trilinear
    from nerf_for_angiography_tpu.utils.vtk import write_structured_grid

    rs = np.random.RandomState(0)
    t = np.linspace(-2, 2, 5, dtype=np.float32)
    gx, gy, gz = np.meshgrid(t, t, t, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
    vals = rs.rand(125).astype(np.float32) * 4 - 2

    perm = rs.permutation(125)
    p = str(tmp_path / "shuffled.vtk")
    write_structured_grid(p, pts[perm], (5, 5, 5), {"scalars": vals[perm]})

    vol = load_sdf_volume(p, scale=1.0, c1=2.0)
    # sampling at a lattice point must return rev_sigmoid of its original value
    from nerf_for_angiography_tpu.data.transfer import rev_sigmoid

    i = 62  # center point (0,0,0) pre-shift
    # volume is shifted by center of mass; sample at shifted location
    com_shift = np.asarray(vol.origin) - np.array([-2.0, -2.0, -2.0])
    sample_at = pts[i] + com_shift
    got = float(trilinear(vol, jnp.asarray(sample_at)))
    want = float(rev_sigmoid(jnp.float32(vals[i]), c1=2.0))
    assert got == pytest.approx(want, abs=1e-4)
