"""X-ray / NeRF volume rendering core (pure jnp, fixed shapes, differentiable).

Reproduces the semantics of the reference's ``nerf/nerf_helpers.py:47-135``
(``render_volume_density`` both branches, ``cumprod_exclusive``,
``get_ray_entropy``) and ``nerf/nerf_helpers_acc.py:45-63``
(``acc_render_volume_density``: sigmoid -> alpha=exp(-sigma*dist) ->
per-ray product), re-designed TPU-first:

  * nerfacc/torch_scatter's ragged ``(ray_indices, t_starts, t_ends)`` +
    ``scatter_mul`` segment product is replaced with **fixed-width masked
    sample tensors** of shape (n_rays, n_samples): per-ray transmittance
    becomes ``exp(-sum(sigma * mask * dt))`` — a masked reduction XLA fuses
    into the MLP epilogue, instead of an XLA-hostile dynamic scatter.
  * Beer-Lambert products are computed in log space (sum then one exp) —
    mathematically identical to prod(exp(-sigma*dt)) with better stability.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def cumprod_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along the last axis.
    Ref: nerf_helpers.py:47-57."""
    cp = jnp.cumprod(x, axis=-1)
    return jnp.concatenate([jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1)


def sigma_activation(radiance_field: jnp.ndarray) -> jnp.ndarray:
    """Density activation used by the reference's X-ray branch.

    1-channel output -> sigmoid (nerf_helpers.py:91,95 and
    nerf_helpers_acc.py:22,48); multi-channel "ensemble" -> relu(mean)
    (nerf_helpers.py:86-88).
    """
    if radiance_field.shape[-1] > 1:
        return jax.nn.relu(jnp.mean(radiance_field, axis=-1))
    return jax.nn.sigmoid(radiance_field[..., -1])


def segment_dists(depth_values: jnp.ndarray, directions: jnp.ndarray | None = None) -> jnp.ndarray:
    """dists with the reference's 1e10 last segment, optionally scaled by
    |direction| to real-world length. Ref: nerf_helpers.py:60-65."""
    d = jnp.concatenate(
        [
            depth_values[..., 1:] - depth_values[..., :-1],
            jnp.full_like(depth_values[..., :1], 1e10),
        ],
        axis=-1,
    )
    if directions is not None:
        d = d * jnp.linalg.norm(directions, axis=-1, keepdims=True)
    return d


class XRayRender(NamedTuple):
    pixels: jnp.ndarray  # (n_rays,) transmittance = prod(exp(-sigma*dt))
    depth: jnp.ndarray  # (n_rays,)
    weights: jnp.ndarray  # (n_rays, n_samples)
    entropy: jnp.ndarray  # (n_rays,) masked ray entropy


def render_xray(
    sigma: jnp.ndarray,
    depth_values: jnp.ndarray,
    directions: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    dists: jnp.ndarray | None = None,
) -> XRayRender:
    """Beer-Lambert line-integral rendering for X-ray attenuation fields.

    ``pixel = prod_i exp(-sigma_i * dt_i) = exp(-sum_i sigma_i * dt_i)``
    — the 1-channel branch of nerf_helpers.py:107-116 and the scatter_mul
    composite of nerf_helpers_acc.py:45-63, with an optional per-sample
    validity ``mask`` (occupancy / early-termination / alpha-threshold)
    standing in for nerfacc's ragged sample list.

    Args:
      sigma: (..., n_samples) post-activation densities.
      depth_values: (..., n_samples) or (n_samples,) sorted depths.
      directions: (..., 3) non-unit ray directions (scales dt to real length).
      mask: optional (..., n_samples) {0,1} validity; invalid samples are
        treated as empty space (alpha = 1), exactly like samples nerfacc
        never emitted.
      dists: optional precomputed segment lengths (overrides depth diff).
    """
    if dists is None:
        dists = segment_dists(depth_values, directions)
    dists = jnp.broadcast_to(dists, sigma.shape)
    tau = sigma * dists  # optical depth per segment
    if mask is not None:
        tau = tau * mask
    alpha = jnp.exp(-tau)
    pixels = jnp.exp(-jnp.sum(tau, axis=-1))
    # weights = (1 - alpha + 1e-10) * T_i, T_i = prod_{j<i} alpha_j.
    # Exclusive cumsum by shift (NOT cumsum - tau: the reference's 1e10 last
    # segment makes that catastrophically cancel in f32).
    tau_cum = jnp.cumsum(tau, axis=-1)
    tau_excl = jnp.concatenate(
        [jnp.zeros_like(tau_cum[..., :1]), tau_cum[..., :-1]], axis=-1
    )
    weights = (1.0 - alpha + 1e-10) * jnp.exp(-tau_excl)
    depth = jnp.sum(alpha * jnp.broadcast_to(depth_values, sigma.shape), axis=-1)
    entropy = ray_entropy(sigma if mask is None else sigma * mask, pixels)
    return XRayRender(pixels=pixels, depth=depth, weights=weights, entropy=entropy)


def ray_entropy(
    sigmas: jnp.ndarray, pixel_values: jnp.ndarray, threshold: float = 0.4
) -> jnp.ndarray:
    """Masked per-ray entropy regularizer. Ref: nerf_helpers.py:125-135.

    Entropy of the per-ray density distribution, gated to rays whose
    attenuation (1 - pixel) exceeds ``threshold``.
    """
    s = jnp.sum(sigmas, axis=-1, keepdims=True)
    density = sigmas / (s + 1e-10)
    ent = -jnp.sum(density * jnp.log(density + 1e-10), axis=-1)
    gate = jax.lax.stop_gradient((1.0 - pixel_values) > threshold)
    return ent * gate


class RGBSigmaRender(NamedTuple):
    rgb: jnp.ndarray
    depth: jnp.ndarray
    weights: jnp.ndarray
    entropy: jnp.ndarray


def render_rgb_sigma(
    radiance_field: jnp.ndarray,
    depth_values: jnp.ndarray,
    entropy_threshold: float = 0.7,
) -> RGBSigmaRender:
    """Classic NeRF rgb+sigma rendering (the 2-channel branch).
    Ref: nerf_helpers.py:67-83.

    Note the reference uses raw ``dists`` (not direction-normalized) in this
    branch; kept identical.
    """
    dists = segment_dists(depth_values)
    sigma = jax.nn.relu(radiance_field[..., -1])
    rgb = jax.nn.sigmoid(radiance_field[..., :-1])
    alpha = 1.0 - jnp.exp(-sigma * jnp.broadcast_to(dists, sigma.shape))
    weights = alpha * cumprod_exclusive(1.0 - alpha + 1e-10)
    rgb_map = jnp.squeeze(jnp.sum(weights[..., None] * rgb, axis=-2))
    depth_map = jnp.sum(weights * jnp.broadcast_to(depth_values, sigma.shape), axis=-1)

    alpha_sum = jnp.sum(alpha, axis=-1)
    density = alpha / (alpha_sum[..., None] + 1e-10)
    ent = -jnp.sum(density * jnp.log(density + 1e-10), axis=-1)
    gate = jax.lax.stop_gradient(alpha_sum > entropy_threshold)
    return RGBSigmaRender(rgb=rgb_map, depth=depth_map, weights=weights, entropy=ent * gate)


def sample_pdf(
    bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int, key: jax.Array
) -> jnp.ndarray:
    """Inverse-CDF (hierarchical) resampling. Ref: nerf_helpers.py:197-222.

    Args:
      bins: (..., n_bins) sorted bin midpoints.
      weights: (..., n_bins - 1) coarse weights over the bins.
    Returns (..., n_samples) fine depth samples.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    # batched searchsorted(side='right'): count of cdf entries <= u.
    # n_bins is small (<= a few hundred) so the (batch, S, B) broadcast is
    # cheaper on TPU than a vmapped binary search.
    inds = jnp.sum(
        (u[..., :, None] >= cdf[..., None, :]).astype(jnp.int32), axis=-1
    )
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def fine_sampling(
    depth_values: jnp.ndarray,
    weights_coarse: jnp.ndarray,
    n_fine: int,
    key: jax.Array,
) -> jnp.ndarray:
    """Hierarchical fine depth sampling: coarse depths + inverse-CDF samples,
    sorted. Semantics of nerf_helpers.py:178-195 with the reference's
    bit-rot fixed (its extra positional arg to get_predictions, SURVEY.md
    §2.9-bis) — here it only produces depths; evaluation is the caller's.
    """
    if depth_values.ndim == 1:
        depth_values = jnp.broadcast_to(
            depth_values, weights_coarse.shape[:-1] + depth_values.shape
        )
    mids = 0.5 * (depth_values[..., 1:] + depth_values[..., :-1])
    fine = sample_pdf(mids, weights_coarse[..., 1:-1], n_fine, key)
    fine = jax.lax.stop_gradient(fine)
    return jnp.sort(jnp.concatenate([depth_values, fine], axis=-1), axis=-1)


def ndc_rays(
    sample_size: float,
    focal_length: float,
    near_thresh: float,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized-device-coordinate ray warp. Ref: nerf_helpers.py:224-243."""
    t = -(near_thresh + origins[..., 2]) / directions[..., 2]
    origins = origins + t[..., None] * directions

    scale = -1.0 / (sample_size / (2.0 * focal_length))
    o0 = scale * origins[..., 0] / origins[..., 2]
    o1 = scale * origins[..., 1] / origins[..., 2]
    o2 = 1.0 + 2.0 * near_thresh / origins[..., 2]

    d0 = scale * (directions[..., 0] / directions[..., 2] - origins[..., 0] / origins[..., 2])
    d1 = scale * (directions[..., 1] / directions[..., 2] - origins[..., 1] / origins[..., 2])
    d2 = -2.0 * near_thresh / origins[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def psnr_from_mse(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR = -10 log10(mse) — the form used throughout the reference
    (run_nerf_acc.py:303, visualization.py:408)."""
    return -10.0 * jnp.log10(mse)
