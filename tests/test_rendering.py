"""Rendering core tests: Beer-Lambert vs closed form, cumprod, PDF sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_for_angiography_tpu.ops import (
    cumprod_exclusive,
    fine_sampling,
    ndc_rays,
    psnr_from_mse,
    render_rgb_sigma,
    render_xray,
    sample_pdf,
    segment_dists,
    sigma_activation,
)


def test_cumprod_exclusive():
    x = jnp.array([[2.0, 3.0, 4.0]])
    got = np.asarray(cumprod_exclusive(x))
    np.testing.assert_allclose(got, [[1.0, 2.0, 6.0]])


def test_sigma_activation_single_channel_is_sigmoid():
    rf = jnp.array([[0.0], [2.0]])
    got = np.asarray(sigma_activation(rf))
    np.testing.assert_allclose(got, [0.5, 1 / (1 + np.exp(-2.0))], atol=1e-6)


def test_sigma_activation_multi_channel_is_relu_mean():
    rf = jnp.array([[1.0, -3.0]])
    got = np.asarray(sigma_activation(rf))
    np.testing.assert_allclose(got, [0.0], atol=1e-6)  # relu(mean([1,-3])) = relu(-1)


def test_xray_render_matches_analytic_slab():
    """Constant density mu in a slab of thickness L => pixel = exp(-mu*L)."""
    n = 100
    z = jnp.linspace(0.0, 10.0, n)
    mu = 0.3
    # density non-zero only within depth [2, 5] (thickness 3)
    sigma = jnp.where((z >= 2.0) & (z < 5.0), mu, 0.0)[None, :]
    dirs = jnp.array([[0.0, 0.0, -1.0]])  # unit norm
    out = render_xray(sigma, z, dirs)
    # discretization: each occupied sample contributes mu * dz
    dz = 10.0 / (n - 1)
    n_occ = int(np.sum((np.asarray(z) >= 2.0) & (np.asarray(z) < 5.0)))
    want = np.exp(-mu * dz * n_occ)
    assert float(out.pixels[0]) == pytest.approx(want, rel=1e-4)
    assert want == pytest.approx(np.exp(-mu * 3.0), rel=0.05)


def test_xray_render_direction_norm_scales_distances():
    z = jnp.linspace(0.0, 1.0, 11)
    sigma = jnp.full((1, 11), 0.5)
    unit = render_xray(sigma, z, jnp.array([[0.0, 0.0, 1.0]]))
    double = render_xray(sigma, z, jnp.array([[0.0, 0.0, 2.0]]))
    # dists scale by |d| => optical depth doubles => pixel squares
    assert float(double.pixels[0]) == pytest.approx(float(unit.pixels[0]) ** 2, rel=1e-3)


def test_xray_render_mask_excludes_samples():
    z = jnp.linspace(0.0, 1.0, 5)
    sigma = jnp.full((1, 5), 1.0)
    mask = jnp.array([[1.0, 1.0, 0.0, 0.0, 0.0]])
    full = render_xray(sigma, z, None, mask=jnp.ones((1, 5)))
    part = render_xray(sigma, z, None, mask=mask)
    assert float(part.pixels[0]) > float(full.pixels[0])
    # masked == rendering with sigma zeroed at masked samples
    zeroed = render_xray(sigma * mask, z, None)
    assert float(part.pixels[0]) == pytest.approx(float(zeroed.pixels[0]), rel=1e-6)


def test_xray_weights_match_reference_formula():
    """weights = (1 - alpha + 1e-10) * cumprod_exclusive(alpha),
    ref nerf_helpers.py:107-108."""
    key = jax.random.PRNGKey(3)
    z = jnp.linspace(0.0, 2.0, 8)
    sigma = jax.nn.sigmoid(jax.random.normal(key, (2, 8)))
    out = render_xray(sigma, z, None)
    dists = np.asarray(segment_dists(z))
    alpha = np.exp(-np.asarray(sigma) * dists)
    want = (1 - alpha + 1e-10) * np.concatenate(
        [np.ones((2, 1)), np.cumprod(alpha, -1)[:, :-1]], -1
    )
    np.testing.assert_allclose(np.asarray(out.weights), want, rtol=1e-4)


def test_xray_pixel_gradient_flows():
    z = jnp.linspace(0.0, 1.0, 16)
    dists = jnp.full((1, 16), 1.0 / 16)  # uniform training-style segments

    def loss(mu):
        sigma = jnp.full((1, 16), mu)
        return render_xray(sigma, z, None, dists=dists).pixels[0]

    g = jax.grad(loss)(0.5)
    assert np.isfinite(float(g)) and float(g) < 0  # more density -> darker


def test_entropy_gate():
    z = jnp.linspace(0.0, 1.0, 8)
    dists = jnp.full((1, 8), 1.0 / 8)
    # transparent ray: pixel ~ 1, gate (1-pixel > 0.4) closed -> entropy 0
    sigma_t = jnp.full((1, 8), 1e-4)
    out_t = render_xray(sigma_t, z, None, dists=dists)
    assert float(out_t.entropy[0]) == 0.0
    # opaque ray: gate open -> entropy > 0
    sigma_o = jnp.full((1, 8), 10.0)
    out_o = render_xray(sigma_o, z, None, dists=dists)
    assert float(out_o.entropy[0]) > 0.0


def test_rgb_sigma_render_opaque_surface():
    """A very dense sample should dominate the rgb output (classic NeRF)."""
    n = 16
    z = jnp.linspace(0.0, 1.0, n)
    rf = jnp.zeros((1, n, 2))
    rf = rf.at[0, 5, 1].set(1000.0)  # huge sigma at sample 5
    rf = rf.at[:, :, 0].set(3.0)  # rgb logit
    out = render_rgb_sigma(rf, z)
    want_rgb = 1 / (1 + np.exp(-3.0))
    assert float(out.rgb) == pytest.approx(want_rgb, rel=1e-3)
    assert float(out.depth[0]) == pytest.approx(float(z[5]), abs=0.05)


def test_sample_pdf_concentrates_on_heavy_bins(rng):
    bins = jnp.linspace(0.0, 1.0, 11)[None, :]  # 11 bin edges
    w = jnp.zeros((1, 10)).at[0, 7].set(1.0)  # all mass in bin 7 [0.7, 0.8]
    samples = np.asarray(sample_pdf(bins, w, 100, rng))
    assert samples.shape == (1, 100)
    assert np.all(samples >= 0.69) and np.all(samples <= 0.81)


def test_sample_pdf_uniform_weights_cover_range(rng):
    bins = jnp.linspace(0.0, 1.0, 33)[None, :]
    w = jnp.ones((1, 32))
    s = np.asarray(sample_pdf(bins, w, 1000, rng))
    assert s.min() < 0.1 and s.max() > 0.9
    assert abs(s.mean() - 0.5) < 0.05


def test_fine_sampling_sorted_and_augmented(rng):
    z = jnp.linspace(0.0, 1.0, 16)
    w = jnp.ones((4, 16))
    fine = np.asarray(fine_sampling(z, w, 8, rng))
    assert fine.shape == (4, 24)
    assert np.all(np.diff(fine, axis=-1) >= 0)


def test_ndc_rays_shapes():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.1, 0.2, -1.0]])
    no, nd = ndc_rays(100.0, 50.0, 1.0, o, d)
    assert no.shape == (1, 3) and nd.shape == (1, 3)
    assert np.all(np.isfinite(np.asarray(no)))


def test_psnr():
    assert float(psnr_from_mse(jnp.float32(0.01))) == pytest.approx(20.0, abs=1e-4)
