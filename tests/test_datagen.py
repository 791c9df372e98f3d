"""Data layer tests: transfer funcs, trilinear interpolation, DRR vs
analytic sphere, frangi/EDT weights, dataset CSV round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from nerf_for_angiography_tpu.data import (
    DatagenConfig,
    angle_grid,
    frangi,
    generate_dataset,
    get_weighted_img,
    load_data,
    make_sphere_volume,
    make_vessel_volume,
    render_drr,
    rev_sigmoid,
    sphere_line_integral,
    transfer_func_ct,
    write_proj_csv,
    write_rays_csv,
)
from nerf_for_angiography_tpu.geometry import get_ray_values, linspace_depths
from nerf_for_angiography_tpu.ops.interpolation import RegularGrid, trilinear


# --- transfer functions ----------------------------------------------------


def np_transfer_ct(vals, binary=False):
    """Independent numpy re-derivation of helpers.py:33-70."""
    xs = [0, 753, 1585.85, 2332.9, 3306.18, 4000]
    ys = [0, 0, 0, 0, 0.2, 0.4] if binary else [0, 0, 0.05, 0, 0.2, 0.4]
    return np.interp(vals, xs, ys)


@pytest.mark.parametrize("binary", [False, True])
def test_transfer_func_ct(binary):
    vals = np.array([-100, 0, 400, 753, 1200, 1585.85, 2000, 2332.9, 2800, 3306.18, 3700, 4000, 5000])
    got = np.asarray(transfer_func_ct(jnp.asarray(vals), binary=binary))
    np.testing.assert_allclose(got, np_transfer_ct(vals, binary), atol=1e-5)


def test_rev_sigmoid():
    x = np.linspace(-5, 5, 11)
    got = np.asarray(rev_sigmoid(jnp.asarray(x), c1=2.0))
    np.testing.assert_allclose(got, 1 / (1 + np.exp(2 * x)), rtol=1e-5)


# --- trilinear interpolation ------------------------------------------------


def test_trilinear_matches_scipy():
    rs = np.random.RandomState(0)
    vals = rs.rand(9, 11, 13).astype(np.float32)
    origin = np.array([-1.0, 0.0, 2.0])
    spacing = np.array([0.25, 0.5, 0.125])
    grid = RegularGrid.create(vals, origin, spacing, fill_value=-7.0)

    axes = [origin[i] + spacing[i] * np.arange(vals.shape[i]) for i in range(3)]
    ref = RegularGridInterpolator(
        axes, vals, method="linear", bounds_error=False, fill_value=-7.0
    )

    pts = rs.rand(500, 3) * np.array([3.0, 6.0, 2.0]) + origin - 0.5
    got = np.asarray(trilinear(grid, jnp.asarray(pts, jnp.float32)))
    want = ref(pts).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_trilinear_exact_at_grid_points():
    vals = np.arange(27, dtype=np.float32).reshape(3, 3, 3)
    grid = RegularGrid.create(vals, (0, 0, 0), (1, 1, 1))
    pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 2.0, 1.0], [2.0, 2.0, 2.0]])
    got = np.asarray(trilinear(grid, pts))
    np.testing.assert_allclose(got, [vals[0, 0, 0], vals[1, 2, 1], vals[2, 2, 2]])


# --- DRR rendering -----------------------------------------------------------


def test_drr_matches_analytic_sphere():
    """Beer-Lambert DRR of the sphere phantom vs closed-form line integrals."""
    vol = make_sphere_volume(res=96, extent=75.0, radius=30.0, mu=0.02)
    f, W, H = 1300.0, 21, 21
    src = np.array([0.0, 0.0, 1500.0])
    origins, directions, _ = get_ray_values(0.0, 0.0, 0.0, src, W, H, f)
    depths = linspace_depths(1500.0 - 75.0, 1500.0 + 75.0, 300)
    img = np.asarray(render_drr(vol, origins, directions, depths, "ct"))

    for j, i in [(10, 10), (0, 0), (10, 0), (5, 8)]:
        o = np.asarray(origins)[j, i]
        d = np.asarray(directions)[j, i]
        want = sphere_line_integral(o, d, 30.0, 0.02)
        assert img[j, i] == pytest.approx(want, abs=0.02), (j, i)


def test_drr_rotated_view_symmetric_for_sphere():
    vol = make_sphere_volume(res=64)
    f, W, H = 1300.0, 11, 11
    src = np.array([0.0, 0.0, 1500.0])
    depths = linspace_depths(1400.0, 1600.0, 200)
    img0 = np.asarray(
        render_drr(vol, *get_ray_values(0.0, 0.0, 0.0, src, W, H, f)[:2], depths)
    )
    img90 = np.asarray(
        render_drr(vol, *get_ray_values(90.0, 0.0, 0.0, src, W, H, f)[:2], depths)
    )
    np.testing.assert_allclose(img0, img90, atol=5e-3)


def test_drr_sdf_mode_no_dist_scaling():
    vol = make_sphere_volume(res=32, mu=0.001)
    f, W, H = 1300.0, 5, 5
    src = np.array([0.0, 0.0, 1500.0])
    o, d, _ = get_ray_values(0.0, 0.0, 0.0, src, W, H, f)
    depths = linspace_depths(1400.0, 1600.0, 50)
    img = np.asarray(render_drr(vol, o, d, depths, "sdf"))
    # sdf mode: tau = sum(interp), center ray hits ~sphere-diameter of samples
    assert 0 < img[2, 2] < 1


# --- frangi / weights --------------------------------------------------------


def test_frangi_highlights_ridge():
    img = np.ones((64, 64))
    img[:, 30:34] = 0.2  # dark vertical vessel on bright background
    v = frangi(img, sigmas=(1, 3, 5), black_ridges=True)
    inside = v[20:44, 31:33].mean()
    outside = v[20:44, 5:20].mean()
    assert inside > 5 * outside


def test_get_weighted_img_positive_and_normalized():
    img = np.ones((48, 48))
    img[:, 20:24] = 0.1
    w = get_weighted_img(img, 0.5, 0.5, "frangi")
    assert w.min() >= 1e-10
    assert w.max() == pytest.approx(1.0, abs=1e-6)
    ws = get_weighted_img(img, None, None, "segmentation")
    assert ws.max() == pytest.approx(1.0, abs=1e-6)
    # vessel pixels outrank background
    assert ws[:, 21].mean() > ws[:, 40].mean()


# --- angle grid + dataset ----------------------------------------------------


def test_angle_grid_reference_quirks():
    a = angle_grid(180.0, 4.0, (90.0, 0.0))
    # 5x5 grid + custom angle
    assert a.shape == (26, 2)
    th = np.unique(a[:-1, 0])
    np.testing.assert_allclose(th, [0.0, 45.0, 90.0, 135.0, 180.0])
    np.testing.assert_array_equal(a[-1], [135.0, 135.0])
    # the >180 wrap subtracts 180 (reference quirk, cttoray.py:95-96)
    b = angle_grid(360.0, 4.0, (90.0, 0.0))
    assert b[:-1, 0].max() <= 180.0


def test_generate_dataset_and_csv_roundtrip(tmp_path):
    vol = make_vessel_volume(res=48)
    cfg = DatagenConfig(
        limited_size=90.0, number_angles=2.0, img_width=16, img_height=16,
        sample_outside=100.0, stratified_depths=False,
    )
    ds = generate_dataset(vol, cfg, jax.random.PRNGKey(0))
    V = 10  # 3x3 + custom
    assert ds.images.shape == (V, 16, 16)
    assert ds.images.min() == pytest.approx(0.0)
    assert ds.images.max() == pytest.approx(1.0)
    assert ds.rays.num_rays == V * 256
    assert float(ds.rays.weights.min()) > 0

    pcsv = str(tmp_path / "df-test-cttoproj.csv")
    rcsv = str(tmp_path / "df-rays-test-16.csv")
    write_proj_csv(ds, pcsv)
    write_rays_csv(ds, rcsv)

    loaded = load_data(pcsv, rcsv)
    assert loaded.num_views == V
    assert loaded.rays_per_view == 256
    assert loaded.focal_length == 1300.0
    assert loaded.depth_samples == 200
    np.testing.assert_allclose(
        np.asarray(loaded.rays.origins), np.asarray(ds.rays.origins), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(loaded.rays.pixel_values),
        np.asarray(ds.rays.pixel_values),
        atol=1e-6,
    )
    # schema: exact reference columns (cttoray.py:271-276, 303-306)
    import pandas as pd

    proj_cols = pd.read_csv(pcsv, sep=";", index_col=0).columns.tolist()
    for col in [
        "image_id", "theta", "phi", "larm", "tform_cam2world", "image_data",
        "image_distance_data", "focal_length", "near_thresh", "far_thresh",
        "depth_sample", "src_pt_z",
    ]:
        assert col in proj_cols
    ray_cols = pd.read_csv(rcsv, sep=";", index_col=0, nrows=1).columns.tolist()
    assert ray_cols == [
        "image_id", "pixel_value", "distance_pixel_value", "x_position",
        "y_position", "ray_origins_x", "ray_origins_y", "ray_origins_z",
        "ray_directions_x", "ray_directions_y", "ray_directions_z",
    ]


def test_dataset_rays_reconstruct_images():
    """Ray pixel_values laid out view-major must tile back into the images."""
    vol = make_sphere_volume(res=32)
    cfg = DatagenConfig(
        limited_size=90.0, number_angles=1.0, img_width=8, img_height=8,
        sample_outside=100.0, stratified_depths=False,
    )
    ds = generate_dataset(vol, cfg)
    V = ds.images.shape[0]
    recon = np.asarray(ds.rays.pixel_values).reshape(V, 8, 8)
    np.testing.assert_allclose(recon, ds.images, atol=1e-6)


def test_random_pose_shifts():
    """Camera-optimization augmentation (cttoray.py:194-206): shifted poses
    recorded; the custom test view stays unshifted."""
    vol = make_sphere_volume(res=24)
    cfg = DatagenConfig(
        limited_size=90.0, number_angles=1.0, img_width=8, img_height=8,
        sample_outside=100.0, stratified_depths=False,
        max_shift_rotation=3.0, max_shift_translation=0.05,
    )
    ds = generate_dataset(vol, cfg, jax.random.PRNGKey(0))
    shifts = ds.proj[["theta_shift", "phi_shift", "larm_shift"]].to_numpy()
    assert np.abs(shifts[:-1]).max() > 0
    assert np.abs(shifts[:-1]).max() <= 3.0
    np.testing.assert_array_equal(shifts[-1], 0.0)
    # shifted matrices differ from unshifted ones for train views
    m = np.array(ds.proj["tform_cam2world"].iloc[0])
    mu = np.array(ds.proj["unshifted_tform_cam2world"].iloc[0])
    assert not np.allclose(m, mu)


def test_sdf_dataset_pipeline():
    from nerf_for_angiography_tpu.data.datasets import sdf_datagen_config

    vol = make_sphere_volume(res=24, extent=75.0, radius=30.0, mu=0.02)
    cfg = sdf_datagen_config(
        limited_size=20.0, number_angles=2.0, img_width=10, img_height=12,
        sample_outside=100.0, stratified_depths=False,
    )
    ds = generate_dataset(vol, cfg, jax.random.PRNGKey(0))
    # 3x3 grid + custom angle, uncentered from 0
    assert ds.images.shape == (10, 12, 10)
    th = np.unique(ds.angles[:-1, 0])
    np.testing.assert_allclose(th, [0.0, 10.0, 20.0])
    np.testing.assert_array_equal(ds.angles[-1], [112.5, 112.5])


def test_proj_images_roundtrip_from_csv(tmp_path):
    from nerf_for_angiography_tpu.data.datasets import proj_images_from_csv

    vol = make_sphere_volume(res=24)
    cfg = DatagenConfig(
        limited_size=90.0, number_angles=1.0, img_width=8, img_height=8,
        sample_outside=100.0, stratified_depths=False,
    )
    ds = generate_dataset(vol, cfg)
    p = str(tmp_path / "proj.csv")
    write_proj_csv(ds, p)
    imgs, wmaps = proj_images_from_csv(p)
    np.testing.assert_allclose(imgs, ds.images, atol=1e-6)
    np.testing.assert_allclose(wmaps, ds.weight_maps, atol=1e-6)


def test_lca_phantom_pipeline():
    """The analytic LCA SDF phantom (phantom:lca) drives the full SDF
    pipeline without assets: rev_sigmoid-transferred capsule-tree volume ->
    mode='sdf' DRRs -> sweep GT via gt_from_volume(lca_eval_config) with
    the SDF render mode (no dist scaling, helpers.py:213)."""
    from nerf_for_angiography_tpu.data import make_lca_sdf_volume
    from nerf_for_angiography_tpu.data.datasets import sdf_datagen_config
    from nerf_for_angiography_tpu.evaluation import gt_from_volume, lca_eval_config

    vol = make_lca_sdf_volume(res=32)
    # vessel interior ~1, background ~0 after the transfer
    assert float(vol.values.max()) > 0.95
    assert float(vol.values.min()) < 1e-3

    cfg = sdf_datagen_config(
        limited_size=20.0, number_angles=2.0, img_width=12, img_height=12,
        stratified_depths=False,
    )
    ds = generate_dataset(vol, cfg, jax.random.PRNGKey(0))
    assert ds.images.shape == (10, 12, 12)
    # per-image normalization (sdftoray.py:125-127) -> every view peaks at 1
    np.testing.assert_allclose(ds.images.max(axis=(1, 2)), 1.0, atol=1e-5)
    # vessels must actually project (attenuation -> dark pixels somewhere)
    assert float(ds.images.min()) < 0.9

    ecfg = lca_eval_config(img_width=12, img_height=12,
                           depth_samples_per_ray=64)
    gt = gt_from_volume(vol, ecfg)
    img = gt(0.0, 0.0)
    assert img.shape == (12, 12)
    assert np.isfinite(img).all() and float(img.min()) < 1.0
