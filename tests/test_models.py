"""CPPN model tests: shapes, encodings, BARF schedule, activations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_for_angiography_tpu.models import (
    CPPN,
    CPPNConfig,
    barf_alpha_schedule,
    barf_k_values,
    barf_weights,
    init_cppn,
)


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_default_config_is_reference_flagship():
    """4x128, 3->1, relu, no pos enc — run_nerf_acc.py:168-183."""
    cfg = CPPNConfig()
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    out = model.apply(params, jnp.zeros((7, 3)))
    assert out.shape == (7, 1)
    # input(3->128) + 4 hidden(128->128) + out(128->1) + img1/img2
    want = (3 * 128 + 128) + 4 * (128 * 128 + 128) + (128 * 1 + 1) + 4
    assert n_params(params) == want


@pytest.mark.parametrize("variant", [(2, 128), (4, 64)])
def test_architecture_variants(variant):
    layers, filters = variant
    cfg = CPPNConfig(num_early_layers=layers, num_filters=filters)
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    assert model.apply(params, jnp.ones((5, 3))).shape == (5, 1)


def test_fourier_encoding_features_and_params():
    cfg = CPPNConfig(pos_enc="fourier", pos_enc_basis=5, fourier_sigma=5.0)
    assert cfg.encoded_pts_features == 3 + 3 * 2 * 5
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    coeff = params["params"]["fourier_coefficients_pts"]
    assert coeff.shape == (15,)
    # Gaussian with std=sigma (loose sanity bound)
    assert 1.0 < float(jnp.std(coeff)) < 15.0
    out = model.apply(params, jnp.ones((4, 3)))
    assert out.shape == (4, 1)


def test_barf_weights_schedule():
    k = barf_k_values(5, 3)
    assert k.shape == (15,)
    np.testing.assert_array_equal(np.asarray(k[:6]), [0, 0, 0, 1, 1, 1])
    # alpha=0: all closed
    np.testing.assert_allclose(np.asarray(barf_weights(0.0, k)), 0.0)
    # alpha >= L+1: all open
    np.testing.assert_allclose(np.asarray(barf_weights(6.0, k)), 1.0)
    # monotone in alpha for each k
    w1 = np.asarray(barf_weights(1.2, k))
    w2 = np.asarray(barf_weights(2.2, k))
    assert np.all(w2 >= w1 - 1e-6)
    # mid-window value matches the reference formula incl. its 3.1415 constant
    alpha, kk = 1.5, 0.0
    want = (1 - np.cos((alpha - kk + 1) * 3.1415)) / 2
    got = float(barf_weights(alpha, jnp.array([kk]))[0])
    assert got == pytest.approx(want, abs=1e-6)


def test_barf_alpha_annealing():
    # ref: run_nerf_acc.py:165-167 — ramp from barf_start to barf_stop
    assert float(barf_alpha_schedule(0, 5)) == 0.0
    assert float(barf_alpha_schedule(8000, 5)) == 0.0
    mid = float(barf_alpha_schedule((8000 + 250000) // 2, 5))
    assert mid == pytest.approx(2.5, rel=1e-3)
    assert float(barf_alpha_schedule(250000, 5)) == pytest.approx(5.0, rel=1e-5)
    assert float(barf_alpha_schedule(400000, 5)) == 5.0


def test_barf_encoding_alpha_zero_kills_frequencies():
    cfg = CPPNConfig(pos_enc="barf", pos_enc_basis=5)
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 3))
    out0 = model.apply(params, x, barf_alpha=0.0)
    # with alpha=0 all sin/cos features are zeroed -> output depends only on
    # raw coords; perturbing alpha changes the output
    out5 = model.apply(params, x, barf_alpha=5.0)
    assert out0.shape == (6, 1)
    assert not np.allclose(np.asarray(out0), np.asarray(out5))


def test_skip_connection_and_late_layers():
    cfg = CPPNConfig(num_early_layers=2, num_late_layers=2, pos_enc="fourier")
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    assert "skip_connection" in params["params"]
    assert "late_0" in params["params"]
    assert model.apply(params, jnp.ones((3, 3))).shape == (3, 1)


def test_view_branch_rgb_sigma():
    cfg = CPPNConfig(
        num_input_channels_views=3, num_output_channels=2, pos_enc="fourier"
    )
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    x = jnp.ones((5, 6))  # 3 pts + 3 views
    out = model.apply(params, x)
    assert out.shape == (5, 2)
    for name in ("alpha_linear", "feature_linear", "views_layer", "rgb_linear"):
        assert name in params["params"]


@pytest.mark.parametrize("act", ["relu", "sine", "tanh"])
def test_activations(act):
    cfg = CPPNConfig(act_func=act, sine_w0=15.0)
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    out = model.apply(params, jnp.ones((3, 3)))
    assert np.all(np.isfinite(np.asarray(out)))


def test_activation_capture():
    cfg = CPPNConfig()
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    out, inter = model.apply(
        params, jnp.ones((3, 3)), capture=True, mutable=["intermediates"]
    )
    names = set(inter["intermediates"].keys())
    assert {"act_input_layer", "act_early_0", "act_early_3"} <= names


def test_model_jits_and_differentiates():
    cfg = CPPNConfig(pos_enc="fourier")
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))

    @jax.jit
    def loss_fn(p, x):
        return jnp.mean(model.apply(p, x) ** 2)

    g = jax.grad(loss_fn)(params, jnp.ones((8, 3)))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # fourier coefficients are learnable -> nonzero grads
    gc = np.asarray(g["params"]["fourier_coefficients_pts"])
    assert np.any(gc != 0)
