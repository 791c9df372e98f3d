"""Pinhole ray generation and depth sampling (pure jnp, jit/vmap-safe).

Semantics match the reference's ``phantomdata/helpers.py:156-190``
(``get_ray_values`` / ``get_depth_values``) and
``phantomdata/proj_helpers.py:9-32`` (``get_query_points``), re-expressed as
batched, functional TPU code: no per-pixel Python loops, no host round trips,
PRNG is an explicit ``jax.random`` key.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pose import source_matrix


class RayBundle(NamedTuple):
    """A batch of rays. origins/directions have shape (..., 3)."""

    origins: jnp.ndarray
    directions: jnp.ndarray


def pixel_grid(img_width: int, img_height: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(ii, jj) pixel index grids of shape (H, W), 'xy' indexing.

    ii varies along axis 1 (x / width), jj along axis 0 (y / height),
    matching ``torch.meshgrid(arange(W), arange(H), indexing='xy')`` at
    helpers.py:162-166.
    """
    ii = jnp.broadcast_to(
        jnp.arange(img_width, dtype=jnp.float32)[None, :], (img_height, img_width)
    )
    jj = jnp.broadcast_to(
        jnp.arange(img_height, dtype=jnp.float32)[:, None], (img_height, img_width)
    )
    return ii, jj


def camera_directions(
    ii: jnp.ndarray, jj: jnp.ndarray, img_width: int, img_height: int, focal_length: float
) -> jnp.ndarray:
    """Per-pixel direction in camera space: ((i-W/2)/f, -(j-H/2)/f, -1).

    Ref: helpers.py:168-171. Non-normalized on purpose — the Beer-Lambert
    compositor multiplies segment lengths by |direction| downstream.
    """
    return jnp.stack(
        [
            (ii - img_width / 2.0) / focal_length,
            -(jj - img_height / 2.0) / focal_length,
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )


def get_ray_values(
    theta_deg,
    phi_deg,
    larm_deg,
    src_pt,
    img_width: int,
    img_height: int,
    focal_length: float,
    translation=(0.0, 0.0, 0.0),
):
    """Generate one view's rays from C-arm angles.

    Returns (origins (H,W,3), directions (H,W,3), cam2world (4,4)).
    Ref: helpers.py:156-175. ``directions = R[:3,:3] @ d_cam`` per pixel,
    origins are the camera position (last column of cam2world).
    """
    cam2world = source_matrix(src_pt, theta_deg, phi_deg, larm_deg, translation)
    ii, jj = pixel_grid(img_width, img_height)
    dirs_cam = camera_directions(ii, jj, img_width, img_height, focal_length)
    # sum over last axis of (H,W,1,3) * (3,3) -> rows of R dotted with d
    directions = jnp.einsum(
        "hwj,ij->hwi", dirs_cam, cam2world[:3, :3], precision=jax.lax.Precision.HIGHEST
    )
    origins = jnp.broadcast_to(cam2world[:3, -1], directions.shape)
    return origins, directions, cam2world


def linspace_depths(near: float, far: float, n: int) -> jnp.ndarray:
    """Uniform depth values in [near, far]. Ref: helpers.py:178-179."""
    t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    return near * (1.0 - t) + far * t


def stratify_depths(z_vals: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Jitter depths uniformly within their mid-point intervals.

    Ref: helpers.py:181-188 / nerf_helpers.py:13-22 (``randomize_depth``).
    Works on any (..., n) batch of sorted depth values.
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def get_depth_values(
    near: float,
    far: float,
    n: int,
    key: jax.Array | None = None,
    stratified: bool = True,
) -> jnp.ndarray:
    """Depth samples for one ray bundle; stratified if a key is given.

    Ref: helpers.py:177-190.
    """
    z = linspace_depths(near, far, n)
    if stratified:
        if key is None:
            raise ValueError("stratified depth sampling requires a PRNG key")
        z = stratify_depths(z, key)
    return z


def query_points(
    origins: jnp.ndarray, directions: jnp.ndarray, depth_values: jnp.ndarray
) -> jnp.ndarray:
    """Sample points along rays: o + d * z.

    origins/directions (..., 3), depth_values broadcastable to (..., n).
    Returns (..., n, 3). Ref: proj_helpers.py:30.
    """
    return origins[..., None, :] + directions[..., None, :] * depth_values[..., :, None]


def segment_lengths(depth_values: jnp.ndarray, infinite_last: bool = True) -> jnp.ndarray:
    """Per-sample segment lengths; last segment is 1e10 like the reference.

    Ref: helpers.py:200-201 / nerf_helpers.py:60-61.
    """
    d = depth_values[..., 1:] - depth_values[..., :-1]
    last = jnp.full_like(depth_values[..., :1], 1e10 if infinite_last else 0.0)
    if not infinite_last:
        last = d[..., -1:]
    return jnp.concatenate([d, last], axis=-1)
