"""On-device DRR (digitally reconstructed radiograph) rendering.

TPU-native replacement of the reference's ``ray_tracing``
(phantomdata/helpers.py:192-224): instead of a Python double loop over
100x100-pixel tiles with a scipy-interpolator CPU round trip per tile, the
whole view renders as one jitted XLA program — trilinear gather from an
HBM-resident volume, Beer-Lambert compositing in log space. Views are
embarrassingly parallel and can be sharded across chips
(``render_views_sharded``), SURVEY.md §2 'on-device datagen sharding'.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import get_ray_values, query_points
from ..ops.interpolation import RegularGrid, trilinear


@partial(jax.jit, static_argnames=("mode",))
def render_drr(
    volume: RegularGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    depth_values: jnp.ndarray,
    mode: str = "ct",
) -> jnp.ndarray:
    """Render one DRR.

    Args:
      volume: attenuation volume (already through the transfer function).
      origins/directions: (H, W, 3) rays (non-unit directions).
      depth_values: (n_samples,) sorted depths along each ray.
      mode: 'ct' -> weights = exp(-interp * dist * |dir|) (helpers.py:208-211);
            'sdf' -> weights = exp(-interp), no distance scaling
            (helpers.py:213, used by sdftoray.py:122).

    Returns (H, W) image = prod of weights along the ray (helpers.py:215).
    """
    pts = query_points(origins, directions, depth_values)  # (H, W, S, 3)
    interp = trilinear(volume, pts)  # (H, W, S)

    if mode == "ct":
        dists = jnp.concatenate(
            [
                depth_values[1:] - depth_values[:-1],
                jnp.full_like(depth_values[:1], 1e10),
            ]
        )
        norm = jnp.linalg.norm(directions, axis=-1)  # (H, W)
        tau = interp * dists * norm[..., None]
    else:
        tau = interp
    # prod(exp(-tau)) == exp(-sum(tau)); log-space is one transcendental/pixel
    return jnp.exp(-jnp.sum(tau, axis=-1))


def render_view(
    volume: RegularGrid,
    theta: float,
    phi: float,
    larm: float,
    src_pt,
    img_width: int,
    img_height: int,
    focal_length: float,
    depth_values: jnp.ndarray,
    translation=(0.0, 0.0, 0.0),
    mode: str = "ct",
):
    """Rays + DRR for one C-arm view. Returns (image, origins, directions,
    cam2world). Ref flow: cttoray.py:200-208."""
    origins, directions, c2w = get_ray_values(
        theta, phi, larm, src_pt, img_width, img_height, focal_length, translation
    )
    img = render_drr(volume, origins, directions, depth_values, mode)
    return img, origins, directions, c2w


def render_views_sharded(
    volume: RegularGrid,
    thetas: jnp.ndarray,
    phis: jnp.ndarray,
    src_pt,
    img_width: int,
    img_height: int,
    focal_length: float,
    depth_values: jnp.ndarray,
    mode: str = "ct",
    mesh: jax.sharding.Mesh | None = None,
) -> jnp.ndarray:
    """Render a batch of views, sharded over a 1-D device mesh.

    The DRR sweep is embarrassingly parallel over views (SURVEY.md §2,
    'on-device datagen sharding'): each chip renders its slice of the angle
    list; the volume is replicated.
    """
    src_pt = jnp.asarray(src_pt, jnp.float32)

    def one(theta, phi):
        o, d, _ = get_ray_values(
            theta, phi, 0.0, src_pt, img_width, img_height, focal_length
        )
        return render_drr(volume, o, d, depth_values, mode)

    batched = jax.vmap(one)
    if mesh is None:
        return batched(thetas, phis)

    from jax.sharding import NamedSharding, PartitionSpec as P

    n = thetas.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    thetas_p = jnp.pad(thetas, (0, pad))
    phis_p = jnp.pad(phis, (0, pad))
    sharding = NamedSharding(mesh, P("data"))
    thetas_p = jax.device_put(thetas_p, sharding)
    phis_p = jax.device_put(phis_p, sharding)
    out = jax.jit(batched, out_shardings=NamedSharding(mesh, P("data")))(
        thetas_p, phis_p
    )
    return out[:n]
