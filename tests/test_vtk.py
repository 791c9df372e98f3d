"""Legacy VTK IO round-trip tests."""

import numpy as np
import pytest

from nerf_for_angiography_tpu.utils import (
    read_vtk,
    write_structured_grid,
    write_structured_points,
)


@pytest.mark.parametrize("binary", [False, True])
def test_structured_points_roundtrip(tmp_path, binary):
    vals = np.random.RandomState(0).rand(5, 6, 7).astype(np.float32)
    p = str(tmp_path / "vol.vtk")
    write_structured_points(
        p, vals, origin=(-1, -2, -3), spacing=(0.5, 1.0, 2.0), name="scalars",
        binary=binary,
    )
    g = read_vtk(p)
    assert g.kind == "structured_points"
    assert g.dimensions == (5, 6, 7)
    assert g.origin == (-1.0, -2.0, -3.0)
    assert g.spacing == (0.5, 1.0, 2.0)
    np.testing.assert_allclose(g.scalars_3d("scalars"), vals, rtol=1e-5)


@pytest.mark.parametrize("binary", [False, True])
def test_cell_data_occupancy_grid_roundtrip(tmp_path, binary):
    """The occupancy-grid export convention: point dims = cells + 1
    (run_nerf_acc.py:200-204)."""
    occ = (np.random.RandomState(1).rand(8, 8, 8) > 0.5)
    p = str(tmp_path / "grid.vtk")
    write_structured_points(p, occ, name="values", cell=True, binary=binary)
    g = read_vtk(p)
    assert g.dimensions == (9, 9, 9)
    got = g.scalars_3d("values", cell=True)
    np.testing.assert_array_equal(got.astype(bool), occ)


@pytest.mark.parametrize("binary", [False, True])
def test_structured_grid_roundtrip(tmp_path, binary):
    t = np.linspace(-1, 1, 4, dtype=np.float32)
    gx, gy, gz = np.meshgrid(t, t, t, indexing="ij")
    # VTK order: x fastest
    pts = np.stack(
        [gx.transpose(2, 1, 0).ravel(), gy.transpose(2, 1, 0).ravel(),
         gz.transpose(2, 1, 0).ravel()], -1,
    )
    scalars = np.arange(64, dtype=np.float32)
    p = str(tmp_path / "cloud.vtk")
    write_structured_grid(p, pts, (4, 4, 4), {"scalars": scalars}, binary=binary)
    g = read_vtk(p)
    assert g.kind == "structured_grid"
    np.testing.assert_allclose(g.points, pts, rtol=1e-5)
    np.testing.assert_allclose(g.point_data["scalars"], scalars, rtol=1e-6)


def test_bounds():
    vals = np.zeros((3, 3, 3), np.float32)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "b.vtk")
        write_structured_points(p, vals, origin=(0, 0, 0), spacing=(1, 2, 3))
        g = read_vtk(p)
        assert g.bounds() == (0, 2, 0, 4, 0, 6)


@pytest.mark.parametrize("binary", [False, True])
def test_export_transferfunc_vtk(tmp_path, binary):
    """transferfunc.vtk side artifact (reference phantomdata/helpers.py:
    122-126): the volume lattice rotated -90 deg about x with the
    transfer-applied scalars, as a StructuredGrid."""
    import jax.numpy as jnp

    from nerf_for_angiography_tpu.data.volumes import export_transferfunc_vtk
    from nerf_for_angiography_tpu.ops.interpolation import RegularGrid

    vals = np.random.RandomState(3).rand(4, 5, 6).astype(np.float32)
    vol = RegularGrid(
        values=jnp.asarray(vals),
        origin=jnp.asarray([1.0, 2.0, 3.0]),
        spacing=jnp.asarray([0.5, 1.0, 2.0]),
        fill_value=jnp.asarray(0.0),
    )
    p = str(tmp_path / ("transferfunc" + ("binary" if binary else "") + ".vtk"))
    export_transferfunc_vtk(vol, p, binary=binary)
    g = read_vtk(p)
    assert g.kind == "structured_grid"
    assert tuple(g.dimensions) == (4, 5, 6)
    pts = g.points.reshape(6, 5, 4, 3)  # z-major (VTK x-fastest)
    # Rx(-90): (x, y, z) -> (x, z, -y); lattice point (i, j, k)
    i, j, k = 2, 3, 1
    x = 1.0 + 0.5 * i
    y = 2.0 + 1.0 * j
    z = 3.0 + 2.0 * k
    np.testing.assert_allclose(pts[k, j, i], [x, z, -y], rtol=1e-6)
    s = np.asarray(g.point_data["scalars"], np.float32).reshape(6, 5, 4)
    np.testing.assert_allclose(s[k, j, i], vals[i, j, k], rtol=1e-6)
