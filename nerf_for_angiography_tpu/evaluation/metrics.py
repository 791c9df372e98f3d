"""Image/volume quality metrics (pure jnp).

Replaces the reference's metric stack (visualization/visualization.py:406-505):
PSNR (:406-409), SSIM via torchmetrics (:411-417), DICE 2D/3D via
torchmetrics Dice(average='micro') (:435-440,480-490), DOT 2D/3D with
min-max normalization (:442-454,493-505). LPIPS/DISTS live in
``perceptual.py`` (pretrained-weight gated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """PSNR = -10 log10(mse), the reference's form (visualization.py:406-409)."""
    return -10.0 * jnp.log10(mse(pred, target))


def _gaussian_kernel1d(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity of two 2D images.

    Matches torchmetrics StructuralSimilarityIndexMeasure defaults
    (gaussian 11x11, sigma 1.5, data_range=1.0) as used at
    visualization.py:266-267,411-417: separable gaussian windows, standard
    Wang et al. formula, mean over valid (same-padded) positions.
    """
    pred = pred.astype(jnp.float32)[None, None]  # (1,1,H,W)
    target = target.astype(jnp.float32)[None, None]
    g = _gaussian_kernel1d(kernel_size, sigma)
    kern = jnp.outer(g, g)[None, None]  # (1,1,k,k)

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred)
    mu_tt = filt(target * target)
    mu_pt = filt(pred * target)

    # f32 cancellation on near-constant windows (large white background in
    # DRRs) can make E[x^2]-E[x]^2 slightly negative and push SSIM above 1;
    # clamp to the feasible region (var >= 0, |cov| <= sqrt(var_p*var_t))
    var_p = jnp.maximum(mu_pp - mu_p**2, 0.0)
    var_t = jnp.maximum(mu_tt - mu_t**2, 0.0)
    cov_bound = jnp.sqrt(var_p * var_t)
    cov = jnp.clip(mu_pt - mu_p * mu_t, -cov_bound, cov_bound)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)


def dice_micro(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int = 2) -> jnp.ndarray:
    """Micro-averaged Dice over integer class maps.

    torchmetrics Dice(average='micro') semantics (visualization.py:241,439):
    TP/FP/FN are summed over ALL classes, so for dense label maps micro-dice
    reduces to 2*matches / (2*matches + mismatches + mismatches) =
    accuracy. Kept verbatim for df-metrics.csv parity.
    """
    pred = pred.astype(jnp.int32).reshape(-1)
    target = target.astype(jnp.int32).reshape(-1)
    tp = jnp.sum(pred == target).astype(jnp.float32)
    errs = jnp.sum(pred != target).astype(jnp.float32)
    return 2.0 * tp / (2.0 * tp + errs + errs)


def dice_binary(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Classic foreground Dice 2|A∩B|/(|A|+|B|) — provided alongside the
    micro variant for actual overlap analysis."""
    p = pred.astype(bool).reshape(-1)
    t = target.astype(bool).reshape(-1)
    inter = jnp.sum(p & t).astype(jnp.float32)
    total = jnp.sum(p) + jnp.sum(t)
    return jnp.where(total > 0, 2.0 * inter / total, 1.0)


def _minmax(x: jnp.ndarray) -> jnp.ndarray:
    x = x - jnp.min(x)
    mx = jnp.max(x)
    return jnp.where(mx > 0, x / mx, x)


def dot_score(pred: jnp.ndarray, target: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Mean elementwise product, optionally after min-max normalization —
    the reference's 'DOT 2D/3D' (visualization.py:442-454,493-495).

    Documented deviation (SURVEY §2.9-bis convention): the reference's DOT
    3D is a RAW mean product without normalization (visualization.py:493-495
    — itself flagged "TODO: check whether this makes sense!" there), which
    makes the score scale-dependent on the field's units. We normalize in
    3D too (our sweep calls this with the default ``normalize=True``) so
    DOT 3D is comparable across transfer functions; pass
    ``normalize=False`` to reproduce the reference's raw value."""
    if normalize:
        pred, target = _minmax(pred), _minmax(target)
    return jnp.mean(pred * target)


def binarize(img: jnp.ndarray, threshold: float = 1.0) -> jnp.ndarray:
    """The reference's DICE pre-binarization: values < threshold -> 0
    (visualization.py:436-437)."""
    return (img >= threshold).astype(jnp.int32)
