"""Fused MLP Pallas kernel: forward/backward parity vs the flax CPPN
(interpret mode on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_for_angiography_tpu.models import CPPNConfig, init_cppn
from nerf_for_angiography_tpu.ops.pallas.fused_mlp import (
    cppn_params_to_list,
    fused_mlp_raw,
    list_grads_to_cppn,
)

N_HIDDEN = 4


@pytest.fixture(scope="module")
def setup():
    cfg = CPPNConfig(num_early_layers=N_HIDDEN, num_filters=128)
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3000, 3))
    plist = cppn_params_to_list(params, N_HIDDEN)
    return model, params, plist, x


def test_forward_matches_flax(setup):
    model, params, plist, x = setup
    want = np.asarray(model.apply(params, x))[:, 0]
    got = np.asarray(fused_mlp_raw(plist, x, True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)  # bf16 matmuls


def test_forward_f32_reference_close(setup):
    """Against a pure-f32 numpy forward, bf16 error stays small."""
    _, _, plist, x = setup
    h = np.asarray(x)
    (w_in, b_in), *hidden, (w_out, b_out) = [
        (np.asarray(w), np.asarray(b)) for w, b in plist
    ]
    h = np.maximum(h @ w_in + b_in, 0)
    for w, b in hidden:
        h = np.maximum(h @ w + b, 0)
    want = (h @ w_out + b_out)[:, 0]
    got = np.asarray(fused_mlp_raw(plist, x, True))
    err = np.abs(got - want)
    assert np.median(err) < 1e-2
    np.testing.assert_allclose(got, want, atol=0.05)


def test_backward_matches_flax(setup):
    model, params, plist, x = setup

    def loss_pallas(pl_):
        raw = fused_mlp_raw(pl_, x, True)
        return jnp.mean(jax.nn.sigmoid(raw) ** 2)

    def loss_flax(p):
        raw = model.apply(p, x)[:, 0]
        return jnp.mean(jax.nn.sigmoid(raw) ** 2)

    g_pallas = jax.grad(loss_pallas)(plist)
    g_flax = jax.grad(loss_flax)(params)
    gf = cppn_params_to_list(g_flax, N_HIDDEN)

    for (dw_p, db_p), (dw_f, db_f) in zip(g_pallas, gf):
        dw_p, dw_f = np.asarray(dw_p), np.asarray(dw_f).reshape(np.asarray(dw_p).shape)
        scale = max(np.abs(dw_f).max(), 1e-8)
        np.testing.assert_allclose(dw_p / scale, dw_f / scale, atol=0.03)
        db_p, db_f = np.asarray(db_p), np.asarray(db_f).reshape(np.asarray(db_p).shape)
        bscale = max(np.abs(db_f).max(), 1e-8)
        np.testing.assert_allclose(db_p / bscale, db_f / bscale, atol=0.03)


def test_input_gradient_matches_flax(setup):
    """dL/dx parity — pose refinement differentiates positions (origins
    carry learnable shifts), so the kernel's dx must be real, not zeros."""
    model, params, plist, x = setup
    # compare against a bf16-compute flax model (the production setting,
    # TrainConfig.compute_dtype): per-point input grads are sensitive to
    # relu-mask flips at bf16 vs f32 activations, which is inherent to the
    # precision, not the kernel (measured identical for flax-bf16 vs f32)
    m16 = type(model)(
        CPPNConfig(num_early_layers=N_HIDDEN, num_filters=128, dtype=jnp.bfloat16)
    )

    def loss_pallas(xx):
        return jnp.mean(jax.nn.sigmoid(fused_mlp_raw(plist, xx, True)) ** 2)

    def loss_flax(xx):
        return jnp.mean(jax.nn.sigmoid(m16.apply(params, xx)[:, 0]) ** 2)

    dx_p = np.asarray(jax.grad(loss_pallas)(x))
    dx_f = np.asarray(jax.grad(loss_flax)(x))
    scale = max(np.abs(dx_f).max(), 1e-8)
    assert np.abs(dx_p).max() > 0.0
    np.testing.assert_allclose(dx_p / scale, dx_f / scale, atol=0.02)


def test_grads_roundtrip_structure(setup):
    model, params, plist, x = setup
    g = jax.grad(lambda p: jnp.sum(fused_mlp_raw(p, x, True)))(plist)
    tree = list_grads_to_cppn(g, params, N_HIDDEN)
    assert tree["params"]["early_2"]["kernel"].shape == (128, 128)
    # untouched leaves (img1/img2) are zero
    np.testing.assert_array_equal(np.asarray(tree["params"]["img1"]), 0.0)


def test_dot_head_matches_reduce(setup, monkeypatch):
    """HEAD='dot' (w_out as an (8,F) bf16 MXU matmul, row 0 live) must
    match the default sublane-reduce head; only the forward changes, so
    grads stay identical up to the bf16-quantized w_out."""
    model, params, plist, x = setup
    from nerf_for_angiography_tpu.ops.pallas import fused_mlp as fm

    want = np.asarray(fused_mlp_raw(plist, x, True))
    g_want = jax.grad(lambda p: jnp.sum(fused_mlp_raw(p, x, True)))(plist)
    monkeypatch.setattr(fm, "HEAD", "dot")
    got = np.asarray(fused_mlp_raw(plist, x, True))
    g_got = jax.grad(lambda p: jnp.sum(fused_mlp_raw(p, x, True)))(plist)
    # w_out is bf16 in dot mode: tolerance is the bf16 ulp on the head
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
    for (gw, gb), (ww, wb) in zip(g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(ww), atol=3e-2, rtol=3e-2
        )


def test_bf16_epilogue_matches_f32(setup, monkeypatch):
    """EPILOGUE='bf16' (MXU emits bf16 directly; bias+relu in bf16 — no
    f32 elementwise traffic between layers) must track the default f32
    epilogue within bf16 rounding: activations were rounded to bf16 right
    after the f32 epilogue anyway, so the only delta is one bias-add
    rounding per layer. Backward recompute shares _layer, so relu masks
    stay self-consistent."""
    model, params, plist, x = setup
    from nerf_for_angiography_tpu.ops.pallas import fused_mlp as fm

    want = np.asarray(fused_mlp_raw(plist, x, True))
    g_want = jax.grad(lambda p: jnp.sum(fused_mlp_raw(p, x, True)))(plist)
    monkeypatch.setattr(fm, "EPILOGUE", "bf16")
    got = np.asarray(fused_mlp_raw(plist, x, True))
    g_got = jax.grad(lambda p: jnp.sum(fused_mlp_raw(p, x, True)))(plist)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
    for (gw, gb), (ww, wb) in zip(g_got, g_want):
        gw, ww = np.asarray(gw), np.asarray(ww)
        # weight grads accumulate over 3000 points: compare in scale
        np.testing.assert_allclose(
            gw, ww, atol=5e-2 * max(1.0, np.abs(ww).max()), rtol=5e-2
        )


def test_nonmultiple_tile_sizes(setup):
    """P not a multiple of TILE must pad correctly."""
    model, params, plist, _ = setup
    for p in (1, 100, 2047, 2049):
        x = jax.random.normal(jax.random.PRNGKey(p), (p, 3))
        got = np.asarray(fused_mlp_raw(plist, x, True))
        want = np.asarray(model.apply(params, x))[:, 0]
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_feature_major_entry_matches_pointmajor(setup):
    """fused_mlp_raw_fm on an (8, P) block == fused_mlp_raw on (P, 3),
    forward AND gradients (params + input, with dx back in (8, P)
    orientation and rows 3-7 zero)."""
    from nerf_for_angiography_tpu.ops.pallas.fused_mlp import fused_mlp_raw_fm

    model, params, plist, x = setup
    x_fm = jnp.zeros((8, x.shape[0]), jnp.float32).at[:3].set(x.T)
    # rows 3-7 are don't-care: poison them to prove it
    x_fm = x_fm.at[3:].set(7.25)

    want = np.asarray(fused_mlp_raw(plist, x, True))
    got = np.asarray(fused_mlp_raw_fm(plist, x_fm, True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def loss_pm(pl_, xx):
        return jnp.mean(jax.nn.sigmoid(fused_mlp_raw(pl_, xx, True)) ** 2)

    def loss_fm(pl_, xf):
        return jnp.mean(jax.nn.sigmoid(fused_mlp_raw_fm(pl_, xf, True)) ** 2)

    gp_pm, gx_pm = jax.grad(loss_pm, argnums=(0, 1))(plist, x)
    gp_fm, gx_fm = jax.grad(loss_fm, argnums=(0, 1))(plist, x_fm)
    for (dw_a, db_a), (dw_b, db_b) in zip(gp_pm, gp_fm):
        np.testing.assert_allclose(
            np.asarray(dw_a), np.asarray(dw_b), atol=1e-6, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(db_a), np.asarray(db_b), atol=1e-6, rtol=1e-5
        )
    gx_fm = np.asarray(gx_fm)
    np.testing.assert_allclose(
        gx_fm[:3].T, np.asarray(gx_pm), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(gx_fm[3:], 0.0, atol=0.0)


def test_feature_major_nonmultiple_tile(setup):
    from nerf_for_angiography_tpu.ops.pallas.fused_mlp import fused_mlp_raw_fm

    model, params, plist, _ = setup
    for p in (1, 100, 2049):
        x = jax.random.normal(jax.random.PRNGKey(p), (p, 3))
        x_fm = jnp.zeros((8, p), jnp.float32).at[:3].set(x.T)
        got = np.asarray(fused_mlp_raw_fm(plist, x_fm, True))
        want = np.asarray(model.apply(params, x))[:, 0]
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


# --- encoded variants: fourier / BARF fused in-kernel ----------------------

import dataclasses

from nerf_for_angiography_tpu.models import barf_k_values, barf_weights
from nerf_for_angiography_tpu.ops.pallas.fused_mlp import fused_mlp_enc_raw

L = 5


@pytest.fixture(scope="module")
def setup_enc():
    out = {}
    for kind in ("fourier", "barf"):
        cfg = CPPNConfig(
            num_early_layers=2, num_filters=64, pos_enc=kind, pos_enc_basis=L
        )
        model, params = init_cppn(cfg, jax.random.PRNGKey(2))
        out[kind] = (cfg, model, params)
    x = jax.random.normal(jax.random.PRNGKey(3), (2500, 3)) * 0.3
    return out, x


def _enc_args(kind, params, alpha):
    if kind == "fourier":
        return {"coeff": params["params"]["fourier_coefficients_pts"]}
    return {"w": barf_weights(alpha, barf_k_values(L, 3))}


@pytest.mark.parametrize("kind", ["fourier", "barf"])
@pytest.mark.parametrize("alpha", [0.0, 2.7, float(L)])
def test_enc_forward_matches_flax(setup_enc, kind, alpha):
    models, x = setup_enc
    cfg, model, params = models[kind]
    if kind == "fourier" and alpha != 0.0:
        pytest.skip("alpha only affects barf")
    want = np.asarray(model.apply(params, x, barf_alpha=alpha))[:, 0]
    plist = cppn_params_to_list(params, cfg.num_early_layers)
    got = np.asarray(
        fused_mlp_enc_raw(
            (kind, L), plist, _enc_args(kind, params, alpha), x, True
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)  # bf16 matmuls


@pytest.mark.parametrize("kind", ["fourier", "barf"])
def test_enc_backward_matches_flax(setup_enc, kind):
    """Param grads (incl. the learnable fourier coefficients) and dx parity
    vs the flax path at a mid-anneal alpha."""
    models, x = setup_enc
    cfg, model, params = models[kind]
    alpha = 2.7
    plist = cppn_params_to_list(params, cfg.num_early_layers)
    enc = _enc_args(kind, params, alpha)

    def loss_pallas(pl_, enc_, xx):
        raw = fused_mlp_enc_raw((kind, L), pl_, enc_, xx, True)
        return jnp.mean(jax.nn.sigmoid(raw) ** 2)

    def loss_flax(p, xx):
        raw = model.apply(p, xx, barf_alpha=alpha)[:, 0]
        return jnp.mean(jax.nn.sigmoid(raw) ** 2)

    gp, genc, gx = jax.grad(loss_pallas, argnums=(0, 1, 2))(plist, enc, x)
    gf_tree, gx_f = jax.grad(loss_flax, argnums=(0, 1))(params, x)
    gf = cppn_params_to_list(gf_tree, cfg.num_early_layers)

    for (dw_p, db_p), (dw_f, db_f) in zip(gp, gf):
        dw_p, dw_f = np.asarray(dw_p), np.asarray(dw_f).reshape(np.asarray(dw_p).shape)
        scale = max(np.abs(dw_f).max(), 1e-8)
        np.testing.assert_allclose(dw_p / scale, dw_f / scale, atol=0.04)
        db_p, db_f = np.asarray(db_p), np.asarray(db_f).reshape(np.asarray(db_p).shape)
        bscale = max(np.abs(db_f).max(), 1e-8)
        np.testing.assert_allclose(db_p / bscale, db_f / bscale, atol=0.04)

    if kind == "fourier":
        dc_f = np.asarray(gf_tree["params"]["fourier_coefficients_pts"])
        dc_p = np.asarray(genc["coeff"])
        scale = max(np.abs(dc_f).max(), 1e-8)
        np.testing.assert_allclose(dc_p / scale, dc_f / scale, atol=0.04)
    else:
        np.testing.assert_array_equal(np.asarray(genc["w"]), 0.0)

    # dx: compare against a bf16-compute flax model (per-point input grads
    # flip with relu masks at bf16 activations — inherent to the precision,
    # see test_input_gradient_matches_flax); the large fourier sin/cos
    # arguments amplify single-point flips, so allow a <=1% outlier tail.
    m16 = type(model)(dataclasses.replace(cfg, dtype=jnp.bfloat16))

    def loss_flax16(xx):
        raw = m16.apply(params, xx, barf_alpha=alpha)[:, 0]
        return jnp.mean(jax.nn.sigmoid(raw) ** 2)

    dx_p = np.asarray(gx)
    dx_f = np.asarray(jax.grad(loss_flax16)(x))
    scale = max(np.abs(dx_f).max(), 1e-8)
    assert np.abs(dx_p).max() > 0.0
    rel = np.abs(dx_p - dx_f) / scale
    assert np.quantile(rel, 0.99) < 0.05, np.quantile(rel, 0.99)
    assert rel.mean() < 0.01, rel.mean()


def test_enc_eligibility_extended():
    """density_raw's eligibility gate now admits fourier/barf relu configs
    (they previously silently fell back to the slow path, VERDICT r2 #7)."""
    from nerf_for_angiography_tpu.training.train import _pallas_eligible
    from nerf_for_angiography_tpu.models import CPPN

    for kind in ("none", "fourier", "barf"):
        cfg = CPPNConfig(pos_enc=kind, pos_enc_basis=5)
        assert _pallas_eligible(CPPN(cfg))
    assert not _pallas_eligible(CPPN(CPPNConfig(pos_enc="fourier", act_func="sine")))
    assert not _pallas_eligible(CPPN(CPPNConfig(pos_enc="fourier", pos_enc_basis=0)))
