"""Native C++ CSV loader: build, parity vs pandas, and a speed sanity check."""

import os
import time

import numpy as np
import pytest

from nerf_for_angiography_tpu import native
from nerf_for_angiography_tpu.data import (
    DatagenConfig,
    generate_dataset,
    load_data,
    make_sphere_volume,
    write_proj_csv,
    write_rays_csv,
)


@pytest.fixture(scope="module")
def csvs(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    vol = make_sphere_volume(res=32)
    cfg = DatagenConfig(
        limited_size=90.0, number_angles=2.0, img_width=20, img_height=20,
        sample_outside=100.0, stratified_depths=False,
    )
    ds = generate_dataset(vol, cfg)
    p = str(d / "proj.csv")
    r = str(d / "rays.csv")
    write_proj_csv(ds, p)
    write_rays_csv(ds, r)
    return p, r


def test_native_builds():
    assert native.available(), "g++ build of the native CSV loader failed"


def test_native_matches_pandas(csvs):
    p, r = csvs
    a = load_data(p, r, use_native=True)
    b = load_data(p, r, use_native=False)
    assert a.ray_df is None  # native path used
    assert a.num_views == b.num_views
    assert a.rays_per_view == b.rays_per_view
    np.testing.assert_allclose(
        np.asarray(a.rays.origins), np.asarray(b.rays.origins), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.rays.directions), np.asarray(b.rays.directions), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.rays.pixel_values), np.asarray(b.rays.pixel_values), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.rays.weights), np.asarray(b.rays.weights), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(a.rays.image_ids), np.asarray(b.rays.image_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(a.rays.x_positions), np.asarray(b.rays.x_positions)
    )


def test_native_loader_speed(csvs, tmp_path):
    """Native parse must beat pandas on a (modestly) larger file."""
    import pandas as pd

    _, r = csvs
    df = pd.read_csv(r, sep=";", index_col=0)
    big = pd.concat([df] * 40, ignore_index=True)
    big_path = str(tmp_path / "big.csv")
    big.to_csv(big_path, sep=";")

    t0 = time.perf_counter()
    out = native.load_rays_csv(big_path)
    t_native = time.perf_counter() - t0
    assert out is not None and len(out["pixel_values"]) == len(big)

    t0 = time.perf_counter()
    pd.read_csv(big_path, sep=";", index_col=0)
    t_pandas = time.perf_counter() - t0
    # don't be flaky about the exact ratio; just require a real win
    assert t_native < t_pandas, (t_native, t_pandas)


def test_native_json_export_parity(tmp_path):
    """Native JSON writers produce value-identical files to json.dump
    (shortest-round-trip float formatting)."""
    import json

    from nerf_for_angiography_tpu.native import (
        get_json_lib,
        write_angle_json,
        write_heatmap_json,
    )

    if get_json_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(0)
    pred = np.round(rng.random(400), 10)
    org = np.round(rng.random(400), 10)
    diff = np.abs(pred - org)
    p = str(tmp_path / "a.json")
    assert write_angle_json(p, pred, org, diff)
    got = json.load(open(p))
    assert set(got) == {"pred", "org", "diff"}
    np.testing.assert_array_equal(np.asarray(got["pred"]), pred)
    np.testing.assert_array_equal(np.asarray(got["org"]), org)
    np.testing.assert_array_equal(np.asarray(got["diff"]), diff)

    rad = rng.random(37)
    theta = rng.standard_normal(37)
    angles = np.stack([rng.integers(-180, 180, 37).astype(float),
                       rng.integers(-180, 180, 37).astype(float)], -1)
    vals = rng.random(37) * 50
    hp = str(tmp_path / "h.json")
    assert write_heatmap_json(hp, rad, theta, angles, vals)
    got = json.load(open(hp))
    assert set(got) == {"rad", "theta", "angles", "vals"}
    np.testing.assert_array_equal(np.asarray(got["rad"]), rad)
    np.testing.assert_array_equal(np.asarray(got["angles"]), angles)
    np.testing.assert_array_equal(np.asarray(got["vals"]), vals)
    # integral values parse as ints — same VALUE, which is the contract
    assert got["angles"][0][0] == angles[0][0]


def test_native_json_export_speed(tmp_path):
    """The native writer must beat json.dump by a wide margin (it exists to
    absorb the 41M-float flagship sweep export)."""
    import json
    import time

    from nerf_for_angiography_tpu.native import get_json_lib, write_angle_json

    if get_json_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(1)
    pred = rng.random(30_000)
    org = rng.random(30_000)
    diff = np.abs(pred - org)

    t0 = time.perf_counter()
    for i in range(5):
        write_angle_json(str(tmp_path / f"n{i}.json"), pred, org, diff)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(5):
        with open(tmp_path / f"p{i}.json", "w") as f:
            json.dump({"pred": pred.tolist(), "org": org.tolist(),
                       "diff": diff.tolist()}, f)
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
