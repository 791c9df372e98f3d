"""Volume asset ingestion: VTK file -> device-resident attenuation grid.

Reproduces phantomdata/helpers.py:72-154 (get_interpolator_from_vol_sdf /
get_interpolator_from_vol_ct / get_interpolator_from_grid) without pyvista
or scipy interpolators: the volume is read with the native VTK reader,
passed through the transfer function, and uploaded once to HBM as a
``RegularGrid`` sampled by the vectorized trilinear gather
(ops/interpolation.py) — no per-tile CPU round trips.
"""

from __future__ import annotations

import numpy as np

from ..ops.interpolation import RegularGrid
from ..utils.vtk import VtkGrid, read_vtk
from .transfer import rev_sigmoid, transfer_func_ct


def _axes_from_grid(grid: VtkGrid) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-axis coordinates (assumes a rectilinear lattice, which both
    reference volumes are; the reference's KDTree re-gridding at
    helpers.py:143-148 exists only to reorder scattered point lists)."""
    if grid.kind == "structured_points":
        nx, ny, nz = grid.dimensions
        ox, oy, oz = grid.origin
        sx, sy, sz = grid.spacing
        return (
            ox + sx * np.arange(nx),
            oy + sy * np.arange(ny),
            oz + sz * np.arange(nz),
        )
    pts = np.round(grid.points, 3)  # helpers.py:137 rounding
    return (np.unique(pts[:, 0]), np.unique(pts[:, 1]), np.unique(pts[:, 2]))


def _scalars_3d(grid: VtkGrid, name: str = "scalars") -> np.ndarray:
    if name not in grid.point_data:
        name = next(iter(grid.point_data))
    if grid.kind == "structured_points":
        return grid.scalars_3d(name)
    # STRUCTURED_GRID: points may arrive in any order; re-grid scalars onto
    # the rectilinear lattice via nearest-neighbor lookup — the reference's
    # KDTree pass (helpers.py:143-148)
    from scipy.spatial import cKDTree

    pts = np.round(grid.points, 3)
    xs, ys, zs = (np.unique(pts[:, i]) for i in range(3))
    scalars = np.asarray(grid.point_data[name], np.float64)
    tree = cKDTree(pts)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    lattice = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    _, idx = tree.query(lattice)
    return scalars[idx].reshape(len(xs), len(ys), len(zs))


def load_ct_volume(
    path: str,
    translation=(0.0, 0.0, 0.0),
    binary: bool = False,
    extra_translation=(-30.0, 10.0, -30.0),
) -> RegularGrid:
    """CT volume -> attenuation grid.

    Semantics of get_interpolator_from_vol_ct (helpers.py:102-128): center
    the grid, apply the manual LCA-centering translation (cttoray.py:55),
    apply transfer_func_ct, fill value = min. Instead of shifting the point
    cloud we shift the grid origin (identical sampling results).
    """
    g = read_vtk(path)
    xs, ys, zs = _axes_from_grid(g)
    vals = transfer_func_ct(_scalars_3d(g), binary=binary)
    vals = np.asarray(vals, np.float32)

    center = np.array(
        [(xs[0] + xs[-1]) / 2, (ys[0] + ys[-1]) / 2, (zs[0] + zs[-1]) / 2]
    )
    shift = -center + np.asarray(extra_translation) + np.asarray(translation)
    origin = np.array([xs[0], ys[0], zs[0]]) + shift
    spacing = np.array(
        [
            (xs[-1] - xs[0]) / max(len(xs) - 1, 1),
            (ys[-1] - ys[0]) / max(len(ys) - 1, 1),
            (zs[-1] - zs[0]) / max(len(zs) - 1, 1),
        ]
    )
    return RegularGrid.create(vals, origin, spacing, fill_value=float(vals.min()))


def load_sdf_volume(path: str, scale: float = 1.0, c1: float = 2.0) -> RegularGrid:
    """SDF volume -> attenuation grid via rev_sigmoid (helpers.py:72-100):
    scale the lattice, center on the density-weighted center of mass, apply
    1/(1+exp(c1*sdf))."""
    g = read_vtk(path)
    xs, ys, zs = _axes_from_grid(g)
    xs, ys, zs = xs * scale, ys * scale, zs * scale
    raw = _scalars_3d(g).astype(np.float32)
    vals = np.asarray(rev_sigmoid(raw, c1=c1), np.float32)

    # density-weighted center of mass (pyvista center_of_mass equivalent)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    w = np.maximum(vals, 0)
    tot = w.sum()
    com = (
        np.array([(gx * w).sum(), (gy * w).sum(), (gz * w).sum()]) / tot
        if tot > 0
        else np.zeros(3)
    )
    origin = np.array([xs[0], ys[0], zs[0]]) - com
    spacing = np.array(
        [
            (xs[-1] - xs[0]) / max(len(xs) - 1, 1),
            (ys[-1] - ys[0]) / max(len(ys) - 1, 1),
            (zs[-1] - zs[0]) / max(len(zs) - 1, 1),
        ]
    )
    return RegularGrid.create(vals, origin, spacing, fill_value=float(vals.min()))


def export_transferfunc_vtk(
    volume: RegularGrid, path: str, binary: bool = False
) -> None:
    """transferfunc.vtk side artifact (helpers.py:122-126): the volume's own
    lattice with the transfer-function-applied scalars, rotated -90 deg
    about x ("so it matches prediction volume") and saved as a
    StructuredGrid. Our ``RegularGrid`` already holds the transfer-applied,
    translated values (load_ct_volume/load_sdf_volume), so the export is a
    lattice + rotation + write. The reference appends 'binary' to the file
    name when the binary transfer variant was used and writes that one in
    VTK binary mode (helpers.py:125-126)."""
    from ..utils.vtk import write_structured_grid

    vals = np.asarray(volume.values, np.float32)
    nx, ny, nz = vals.shape
    origin = np.asarray(volume.origin, np.float64)
    spacing = np.asarray(volume.spacing, np.float64)
    xs = origin[0] + spacing[0] * np.arange(nx)
    ys = origin[1] + spacing[1] * np.arange(ny)
    zs = origin[2] + spacing[2] * np.arange(nz)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    # Rx(-90): (x, y, z) -> (x, z, -y)  (pyvista rotate_x(-90))
    rx, ry, rz = gx, gz, -gy
    vtk_pts = np.stack(
        [rx.transpose(2, 1, 0).ravel(), ry.transpose(2, 1, 0).ravel(),
         rz.transpose(2, 1, 0).ravel()], -1,
    )
    write_structured_grid(
        path, vtk_pts, (nx, ny, nz),
        {"scalars": vals.transpose(2, 1, 0).ravel()},
        binary=binary,
    )


def export_ground_truth_vtk(
    volume: RegularGrid, path: str, extent: float = 75.0, res: int = 200
) -> None:
    """ground-truth.vtk export (cttoray.py:134-148): query the attenuation
    volume on a res^3 lattice over [-extent, extent]^3, save as a
    StructuredGrid point cloud."""
    import jax.numpy as jnp

    from ..ops.interpolation import trilinear
    from ..utils.vtk import write_structured_grid

    t = np.linspace(-extent, extent, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(t, t, t)  # reference meshgrid default ('xy')
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    vals = np.asarray(trilinear(volume, jnp.asarray(pts))).reshape(gx.shape)

    vtk_pts = np.stack(
        [gx.transpose(2, 1, 0).ravel(), gy.transpose(2, 1, 0).ravel(),
         gz.transpose(2, 1, 0).ravel()], -1,
    )
    write_structured_grid(
        path, vtk_pts, (res, res, res),
        {"scalars": vals.transpose(2, 1, 0).ravel()},
        binary=True,  # 8M points; ASCII savetxt is ~100x slower
    )
