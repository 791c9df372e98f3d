"""On-device ray-batch sampling.

Replaces the reference's per-iteration host-side ``pandas.sample`` (the
dominant non-GPU cost in its hot loop, SURVEY.md §3.1:
``sample_pixel_rays`` at nerf_helpers.py:137-150 does a weighted
without-replacement draw on the CPU and copies to device every step).

TPU-native design: all rays live in HBM as dense arrays; weighted sampling
without replacement is the Gumbel top-k trick (keys = log w + Gumbel noise,
take top-n), which reproduces successive-draws-without-replacement
semantics exactly and runs fully inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RayDataset(NamedTuple):
    """Dense, device-resident ray store (one row per pixel across all views).

    Mirrors the per-ray CSV schema (cttoray.py:303-306): pixel_value,
    distance_pixel_value, x/y_position, ray origin/direction.
    """

    origins: jnp.ndarray  # (N, 3)
    directions: jnp.ndarray  # (N, 3)
    pixel_values: jnp.ndarray  # (N,)
    weights: jnp.ndarray  # (N,) distance_pixel_value sampling weights
    image_ids: jnp.ndarray  # (N,) int32 view index
    x_positions: jnp.ndarray  # (N,) int32
    y_positions: jnp.ndarray  # (N,) int32

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]


class RayBatch(NamedTuple):
    origins: jnp.ndarray
    directions: jnp.ndarray
    pixel_values: jnp.ndarray
    image_ids: jnp.ndarray  # (n,) int32 view index (pose refinement gathers per-view shifts)


def gumbel_topk_indices(
    key: jax.Array, weights: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Indices of a weighted sample WITHOUT replacement of size n.

    P(sequence) matches successive draws w_i / sum(remaining) — i.e. pandas
    ``.sample(n, weights)`` semantics (nerf_helpers.py:139) — via the
    Gumbel top-k equivalence.
    """
    g = jax.random.gumbel(key, weights.shape, dtype=jnp.float32)
    scores = jnp.log(jnp.maximum(weights, 1e-30)) + g
    _, idx = jax.lax.top_k(scores, n)
    return idx


def sample_pixel_rays(
    key: jax.Array, data: RayDataset, n: int, weighted: bool = True
) -> RayBatch:
    """Sample n rays from the pixels of ALL training views.

    Ref: nerf_helpers.py:137-150 (weights = 'distance_pixel_value').
    The top-k order is already a random permutation of the selected set,
    so the reference's extra ``.sample(frac=1)`` shuffle is subsumed.
    """
    w = data.weights if weighted else jnp.ones_like(data.weights)
    idx = gumbel_topk_indices(key, w, n)
    return RayBatch(
        origins=data.origins[idx],
        directions=data.directions[idx],
        pixel_values=data.pixel_values[idx],
        image_ids=data.image_ids[idx],
    )


def sample_image_rays(
    key: jax.Array,
    data: RayDataset,
    n: int,
    num_images: int,
    rays_per_image: int,
) -> RayBatch:
    """Sample n rays from ONE randomly chosen training view.

    Ref: nerf_helpers.py:152-176 (sample_image_rays, random=True branch).
    Assumes the dataset is stored view-major with a fixed ``rays_per_image``
    stride (true for the datagen CSV layout, cttoray.py:247-262).
    """
    k_img, k_pix = jax.random.split(key)
    img = jax.random.randint(k_img, (), 0, num_images)
    offs = jax.random.choice(k_pix, rays_per_image, (n,), replace=False)
    idx = img * rays_per_image + offs
    return RayBatch(
        origins=data.origins[idx],
        directions=data.directions[idx],
        pixel_values=data.pixel_values[idx],
        image_ids=data.image_ids[idx],
    )


def whole_image_rays(
    data: RayDataset,
    image_index: jnp.ndarray | int,
    rays_per_image: int,
) -> RayBatch:
    """All rays of one view, in stored (pixel) order.

    Ref: nerf_helpers.py:152-166, ``random=False`` branch — the ordered
    whole-image batch used for full-view rendering/eval. jit-safe for a
    traced ``image_index`` (dynamic_slice on the view-major layout).
    """
    start = jnp.asarray(image_index, jnp.int32) * rays_per_image

    def take(a):
        return jax.lax.dynamic_slice_in_dim(a, start, rays_per_image, axis=0)

    return RayBatch(
        origins=take(data.origins),
        directions=take(data.directions),
        pixel_values=take(data.pixel_values),
        image_ids=take(data.image_ids),
    )
