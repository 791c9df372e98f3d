"""Trilinear interpolation on regular grids (the on-device replacement for
scipy.interpolate.RegularGridInterpolator in the reference's datagen hot
path, phantomdata/helpers.py:152 + ray_tracing:203-205).

The reference round-trips every 100x100-pixel tile through the CPU to call
scipy. Here the volume lives in HBM and sampling is a vectorized 8-corner
gather + lerp, fully inside jit — the entire DRR render for a view is one
fused XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RegularGrid(NamedTuple):
    """A regular (uniformly spaced per-axis) scalar grid in HBM.

    values: (nx, ny, nz) float32
    origin: (3,) coordinate of values[0,0,0]
    spacing: (3,) grid step per axis
    fill_value: scalar used outside the grid (scipy bounds_error=False
      semantics, helpers.py:152: fill = min(scalars))
    """

    values: jnp.ndarray
    origin: jnp.ndarray
    spacing: jnp.ndarray
    fill_value: jnp.ndarray

    @classmethod
    def create(cls, values, origin, spacing, fill_value=None) -> "RegularGrid":
        values = jnp.asarray(values, jnp.float32)
        if fill_value is None:
            fill_value = jnp.min(values)
        return cls(
            values=values,
            origin=jnp.asarray(origin, jnp.float32),
            spacing=jnp.asarray(spacing, jnp.float32),
            fill_value=jnp.asarray(fill_value, jnp.float32),
        )


def trilinear(grid: RegularGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of ``grid`` at world ``points`` (..., 3).

    Matches scipy RegularGridInterpolator(method='linear',
    bounds_error=False, fill_value=grid.fill_value).
    """
    shape = jnp.array(grid.values.shape, jnp.float32)
    # continuous index coordinates
    u = (points - grid.origin) / grid.spacing
    inside = jnp.all((u >= 0.0) & (u <= shape - 1.0), axis=-1)

    u = jnp.clip(u, 0.0, shape - 1.0)
    # per-axis clamp (grid may be anisotropic in size)
    maxi = jnp.array(
        [grid.values.shape[0] - 1, grid.values.shape[1] - 1, grid.values.shape[2] - 1],
        jnp.int32,
    )
    i0 = jnp.minimum(jnp.floor(u).astype(jnp.int32), maxi - jnp.where(maxi > 0, 1, 0))
    i0 = jnp.maximum(i0, 0)
    i1 = jnp.minimum(i0 + 1, maxi)
    f = u - i0.astype(jnp.float32)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    v = grid.values
    c000 = v[x0, y0, z0]
    c100 = v[x1, y0, z0]
    c010 = v[x0, y1, z0]
    c110 = v[x1, y1, z0]
    c001 = v[x0, y0, z1]
    c101 = v[x1, y0, z1]
    c011 = v[x0, y1, z1]
    c111 = v[x1, y1, z1]

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    out = c0 * (1 - fz) + c1 * fz

    return jnp.where(inside, out, grid.fill_value)
