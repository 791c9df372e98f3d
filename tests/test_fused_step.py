"""Whole-train-step fused Pallas kernel: gradient/pixel parity vs the
split path (fused_mlp custom-VJP + XLA composite/loss), interpret mode on
CPU. The two paths share ``_layer``, so forward activation bits are
identical by construction and the comparison isolates the composite/
backward math (reference semantics: nerf_helpers_acc.py:22-63 +
run_nerf_acc.py:287-307)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_for_angiography_tpu.models import CPPNConfig, init_cppn
from nerf_for_angiography_tpu.ops.occupancy import prune_mask
from nerf_for_angiography_tpu.ops.pallas.fused_mlp import (
    cppn_params_to_list,
    fused_mlp_raw,
)
from nerf_for_angiography_tpu.ops.pallas.fused_step import fused_step_grads

N_HIDDEN = 2
R = 700  # pads to 2 x FS_TILE=512 tiles: exercises padding + accumulation
K = 7


@pytest.fixture(scope="module")
def setup():
    cfg = CPPNConfig(num_early_layers=N_HIDDEN, num_filters=32)
    _, params = init_cppn(cfg, jax.random.PRNGKey(0))
    plist = cppn_params_to_list(params, N_HIDDEN)
    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    origins = jax.random.normal(keys[0], (R, 3)) * 0.3
    directions = jax.random.normal(keys[1], (R, 3))
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    # contiguous lattice window per ray: t = near + (start + i) * step —
    # every active dist is exactly `step`, like the real marches
    step = 1.5  # large enough that early_stop_eps actually fires
    near = 2.0
    start = jax.random.randint(keys[2], (R, 1), 0, 5).astype(jnp.float32)
    idx = start + jnp.arange(K, dtype=jnp.float32)[None, :]
    t_starts = near + idx * step
    t_mid = t_starts + 0.5 * step
    mask = (jax.random.uniform(keys[3], (R, K)) < 0.7).astype(jnp.float32)
    # a few fully-masked rays (miss rays render pixel=1)
    mask = mask.at[:5].set(0.0)
    targets = jax.random.uniform(keys[4], (R,))
    return plist, origins, directions, t_mid, mask, targets, step


def _split_loss_fn(o, d, t_mid, mask, targets, step, eps, n_loss, scale):
    """The production split path: fused_mlp forward/backward (interpret)
    + prune_mask + Beer-Lambert composite + MSE, as training/train.py
    render_rays + loss_fn compose them for a rectangular march."""
    dists = jnp.full_like(t_mid, step)

    def loss(plist):
        pts = (o[:, None, :] + d[:, None, :] * t_mid[..., None]).reshape(-1, 3)
        raw = fused_mlp_raw(plist, pts * scale, True)
        sigma = jax.nn.sigmoid(raw).reshape(t_mid.shape)
        keep = jax.lax.stop_gradient(prune_mask(sigma, dists, mask, 0.0, eps))
        pixels = jnp.exp(-jnp.sum(sigma * keep * dists, axis=-1))
        return jnp.sum((pixels - targets) ** 2) / n_loss, pixels

    return loss


def _assert_grads_close(got, want, atol=2e-4):
    for (dw_g, db_g), (dw_w, db_w) in zip(got, want):
        for g, w in ((dw_g, dw_w), (db_g, db_w)):
            g, w = np.asarray(g), np.asarray(w).reshape(np.asarray(g).shape)
            s = max(np.abs(w).max(), 1e-8)
            np.testing.assert_allclose(g / s, w / s, atol=atol)


@pytest.mark.parametrize("eps", [0.0, 0.05])
def test_grads_match_split_path(setup, eps):
    plist, o, d, t_mid, mask, targets, step = setup
    loss = _split_loss_fn(o, d, t_mid, mask, targets, step, eps, R, 1.0)
    (_, want_pixels), want_grads = jax.value_and_grad(loss, has_aux=True)(plist)

    got_pixels, got_grads = fused_step_grads(
        plist, o, d, t_mid, mask, targets,
        step=step, early_stop_eps=eps, n_rays_loss=R, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_pixels), np.asarray(want_pixels), atol=1e-5
    )
    _assert_grads_close(got_grads, want_grads)


def test_input_scale(setup):
    plist, o, d, t_mid, mask, targets, step = setup
    scale = 0.37
    loss = _split_loss_fn(o, d, t_mid, mask, targets, step, 0.01, R, scale)
    _, want_grads = jax.value_and_grad(loss, has_aux=True)(plist)
    _, got_grads = fused_step_grads(
        plist, o, d, t_mid, mask, targets,
        step=step, early_stop_eps=0.01, n_rays_loss=R,
        input_scale=scale, interpret=True,
    )
    _assert_grads_close(got_grads, want_grads)


def test_sharded_loss_divisor(setup):
    """n_rays_loss decouples the mean's divisor from the local batch: a
    global batch of 2R split in half must reproduce the full-batch grads
    when the halves' grads (each with n_rays_loss=2R... here: the full
    batch with divisor 3R) scale as expected."""
    plist, o, d, t_mid, mask, targets, step = setup
    _, g1 = fused_step_grads(
        plist, o, d, t_mid, mask, targets,
        step=step, early_stop_eps=0.0, n_rays_loss=R, interpret=True,
    )
    _, g3 = fused_step_grads(
        plist, o, d, t_mid, mask, targets,
        step=step, early_stop_eps=0.0, n_rays_loss=3 * R, interpret=True,
    )
    scaled = [(dw / 3.0, db / 3.0) for dw, db in g1]
    _assert_grads_close(g3, scaled, atol=1e-3)  # f32 rounding of coef/3


def test_miss_rays_zero_grad(setup):
    """Rays whose mask is all-zero render pixel=1; with target=1 they must
    contribute NOTHING (the kernel relies on this for its ray padding)."""
    plist, o, d, t_mid, _, _, step = setup
    mask = jnp.zeros((R, K), jnp.float32)
    targets = jnp.ones((R,))
    pixels, grads = fused_step_grads(
        plist, o, d, t_mid, mask, targets,
        step=step, early_stop_eps=0.05, n_rays_loss=R, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pixels), 1.0)
    for dw, db in grads:
        assert float(jnp.abs(dw).max()) == 0.0
        assert float(jnp.abs(db).max()) == 0.0


# ---------------------------------------------------------------------------
# Integration: the train-step wiring (training/train.py::_fused_loss_and_grads
# + fused_train_step='on'), against the split render_rays/value_and_grad path.
# Split runs the flax bf16 MLP on CPU, fused the interpret-mode kernel, so
# tolerances are the bf16 cross-implementation ones of test_pallas.py.
# ---------------------------------------------------------------------------


def _sphere_setup(**cfg_kw):
    from nerf_for_angiography_tpu.data import DatagenConfig, generate_dataset, make_sphere_volume
    from nerf_for_angiography_tpu.training import TrainConfig, create_train_state

    vol = make_sphere_volume(res=48, extent=75.0, radius=30.0, mu=0.02)
    dcfg = DatagenConfig(
        limited_size=90.0, number_angles=2.0, img_width=24, img_height=24,
        sample_outside=100.0, stratified_depths=False,
    )
    data = generate_dataset(vol, dcfg)
    cfg = TrainConfig(
        depth_samples_per_ray=32, sample_size=12, grid_resolution=8,
        outside=100.0, display_every=50, n_iters=150,
        early_stop_iters=10_000, coarse_lr=5e-3, **cfg_kw,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    return data, cfg, model, state


def _compare_paths(data, cfg, model, state, n_rays=64):
    from nerf_for_angiography_tpu.training.train import (
        _fused_loss_and_grads,
        render_rays,
    )

    o = data.rays.origins[:n_rays]
    d = data.rays.directions[:n_rays]
    tgt = data.rays.pixel_values[:n_rays]
    near, far = 1400.0, 1600.0

    def split(params):
        out = render_rays(model, params, state.grid, o, d, cfg, near, far)
        return jnp.mean((out[0] - tgt) ** 2), out[0]

    (want_loss, want_px), want = jax.value_and_grad(split, has_aux=True)(
        state.params
    )
    got_loss, got_px, _, got = _fused_loss_and_grads(
        model, state.params, state.grid, o, d, tgt, cfg, near, far
    )
    np.testing.assert_allclose(
        np.asarray(got_px), np.asarray(want_px), atol=2e-2
    )
    np.testing.assert_allclose(float(got_loss), float(want_loss), atol=2e-3)
    for lg, lw in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        lw = np.asarray(lw)
        s = max(np.abs(lw).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(lg) / s, lw / s, atol=0.06
        )


def test_train_wiring_dense_march():
    data, cfg, model, state = _sphere_setup()
    _compare_paths(data, cfg, model, state)


def test_train_wiring_two_bucket_march():
    data, cfg, model, state = _sphere_setup(
        compact_samples=16, march_mode="hybrid", hybrid_split=0.75,
        hybrid_bucket_k=True, hybrid_k_lo=8, hybrid_w_lo=16, hybrid_w_cap=24,
    )
    _compare_paths(data, cfg, model, state)


def test_fused_train_step_runs():
    """fused_train_step='on' through make_train_step: one step runs,
    metrics finite, params move."""
    from nerf_for_angiography_tpu.training import make_train_step

    data, cfg, model, state = _sphere_setup(fused_train_step="on")
    step = make_train_step(model, cfg, near=1400.0, far=1600.0)
    p0 = jax.tree.map(np.array, state.params)
    state, metrics, _, _ = step(state, data.rays)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss/train-pixel-coarse"]))
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p0, jax.tree.map(np.array, state.params),
    )
    assert max(jax.tree.leaves(diffs)) > 0
