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
import numpy as np


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
    # optional precomputed inverse-CDF table (build_sampling_table) for the
    # fast 'overdraw' sampler; None -> samplers fall back to exact Gumbel
    sampling_table: jnp.ndarray | None = None

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


def build_sampling_table(
    weights: jnp.ndarray, table_size: int = 1 << 18
) -> jnp.ndarray:
    """Quantized inverse-CDF table for the fast 'overdraw' sampler.

    table[j] = smallest index i with cdf[i] >= (j + 0.5)/table_size. Built
    ONCE per dataset (the weight map is static); per-step sampling then
    costs one gather per draw instead of a cumsum + searchsorted over the
    whole ray store (a profiled 2.6 ms/step as naive XLA). At the default
    2^18 entries (1 MB) the quantization bucket is ~1/4 ray at the flagship
    254k-ray dataset — the per-ray inclusion-probability distortion is
    below 2/table_size relative.
    """
    cdf = jnp.cumsum(weights.astype(jnp.float32))
    cdf = cdf / cdf[-1]
    u = (jnp.arange(table_size, dtype=jnp.float32) + 0.5) / table_size
    return jnp.searchsorted(cdf, u).astype(jnp.int32)


def overdraw_sample_indices(
    key: jax.Array, table: jnp.ndarray, n: int, oversample: float = 1.125,
    n_values: int | None = None,
) -> jnp.ndarray:
    """Fast approximate weighted sample without replacement of size n.

    Draws ceil(n*oversample) indices WITH replacement through the
    precomputed inverse-CDF table (build_sampling_table), then drops
    duplicate indices and keeps the first n unique draws. At the flagship
    ratio (n=5,625 of 254k rays) the collision rate is ~2%, so dropping
    duplicates leaves marginal inclusion probabilities within ~1% of the
    exact successive-draw (Gumbel top-k) distribution while replacing the
    profiled 1.37 ms full-dataset top_k with ~6k table gathers. If fewer
    than n draws are unique (astronomically rare), the remainder are
    duplicates — harmless for SGD.

    Dedupe is by VALUE but ranked by DRAW ORDER ("first n unique draws"):
    ranking on the value-sorted array instead would make the selection "n
    smallest ray indices", systematically starving the last view. With
    ``n_values`` (the number of distinct ray indices the table maps into,
    i.e. the dataset size) the earliest draw of each value is found by one
    scatter-min over an (n_values,) buffer instead of the m-element stable
    sort + top_k it replaces. Measured on TPU v5e at the flagship shape
    (254k-ray table, n=5625): 0.274 vs 0.311 ms — a real but small
    ~0.04 ms/step win; the op is dispatch/latency-bound, not work-bound
    (benchmarks/MFU.md round-4 sampling note). Without ``n_values`` a
    stable-argsort fallback computes the identical selection (pinned
    bit-exact by tests/test_sampling.py).

    Exact pandas-semantics sampling remains available via
    ``gumbel_topk_indices`` (TrainConfig.sampling_impl='gumbel').
    """
    m = int(np.ceil(n * oversample))
    t = table.shape[0]
    u = jax.random.randint(key, (m,), 0, t)
    idx = table[u]
    pos = jnp.arange(m, dtype=jnp.int32)
    if n_values is not None:
        # earliest draw position per distinct value, one scatter-min
        first = jnp.full((n_values,), m, jnp.int32).at[idx].min(pos)
        uniq_draw = first[idx] == pos
    else:
        # fallback: stable argsort puts equal values in draw order; mark
        # the first of each run, scatter the flags back to draw positions
        perm = jnp.argsort(idx, stable=True)
        sidx = idx[perm]
        uniq_sorted = jnp.concatenate(
            [jnp.ones((1,), bool), sidx[1:] != sidx[:-1]]
        )
        uniq_draw = jnp.zeros((m,), bool).at[perm].set(uniq_sorted)
    # output layout = [unique draws in draw order, then (rare shortfall
    # only) earliest duplicate draws in draw order] — exactly the order the
    # previous top_k-over-scores formulation produced
    rank_u = jnp.cumsum(uniq_draw) - 1
    n_uniq = rank_u[-1] + 1
    rank_d = pos - rank_u - 1  # cumsum(~uniq) - 1
    slot = jnp.where(uniq_draw, rank_u, n_uniq + rank_d)
    slot = jnp.where(slot < n, slot, n)  # spill the surplus into slot n
    return jnp.zeros((n + 1,), idx.dtype).at[slot].set(
        idx, mode="drop", unique_indices=False
    )[:n]


def sample_pixel_rays(
    key: jax.Array, data: RayDataset, n: int, weighted: bool = True,
    impl: str = "gumbel",
) -> RayBatch:
    """Sample n rays from the pixels of ALL training views.

    Ref: nerf_helpers.py:137-150 (weights = 'distance_pixel_value').
    The top-k order is already a random permutation of the selected set,
    so the reference's extra ``.sample(frac=1)`` shuffle is subsumed.
    ``impl``: 'gumbel' = exact successive-draw semantics; 'overdraw' = the
    fast approximate sampler (overdraw_sample_indices) — requires
    ``data.sampling_table`` (build_sampling_table of the same weights;
    only valid for weighted sampling) and falls back to exact otherwise.
    """
    w = data.weights if weighted else jnp.ones_like(data.weights)
    if impl == "overdraw" and weighted and data.sampling_table is not None:
        idx = overdraw_sample_indices(
            key, data.sampling_table, n, n_values=int(data.origins.shape[0])
        )
    else:
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
