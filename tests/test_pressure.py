"""Truncation-pressure stats of the compacted marches and their flow
through the train step.

The compacted marches (ops/occupancy.py) attach per-ray pre-compaction
active counts and window-edge flags; training/train.py::march_pressure
reduces them to batch scalars the production loop uses to regrow k/w_cap
within one chunk of grid drift (the 4-seed forced-hybrid 20k gates in
benchmarks/quality_runs_r3.jsonl measured −2.2…−5.9 dB held-out from
letting that drift run a full re-check cadence)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_for_angiography_tpu.data import DatagenConfig, generate_dataset
from nerf_for_angiography_tpu.data.phantoms import make_sphere_volume
from nerf_for_angiography_tpu.ops.occupancy import (
    BucketedRays,
    create_grid,
    march_rays,
    march_rays_hybrid,
    march_rays_hybrid2,
    march_rays_hybrid2k,
    march_rays_window,
    update_grid,
    with_packed,
)
from nerf_for_angiography_tpu.training import TrainConfig, create_train_state
from nerf_for_angiography_tpu.training.train import (
    make_train_chunk,
    make_train_step,
    march_pressure,
)

AABB = jnp.asarray([-75.0, -75.0, -75.0, 75.0, 75.0, 75.0])


def sphere_sigma(pts):
    return 0.5 * (jnp.linalg.norm(pts, axis=-1) < 30.0).astype(jnp.float32)


def _rays():
    o = jnp.array([[0.0, 0.0, 1500.0], [30.0, 10.0, 1500.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [-0.02, 0.0, -1.0]])
    return o, d


def test_march_rays_active_count_is_dense_mask_sum():
    g = update_grid(create_grid(AABB, 32), sphere_sigma, occ_thre=1e-4)
    o, d = _rays()
    dense = march_rays(g, o, d, 128, 1400.0, 1600.0)
    k = 16  # deliberately below the active count -> real truncation
    m = march_rays(g, o, d, 128, 1400.0, 1600.0, compact_k=k)
    counts = np.asarray(dense.mask).sum(-1).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(m.active_count), counts)
    assert not np.asarray(m.edge_active).any()  # full-lattice candidate set
    p = march_pressure(m)
    assert int(p["march/over_k"]) == int(counts.max()) - k
    assert int(p["march/edge_rays"]) == 0
    assert int(p["march/ac"]) == int(counts.max())


def test_march_rays_no_truncation_zero_pressure():
    g = update_grid(create_grid(AABB, 32), sphere_sigma, occ_thre=1e-4)
    o, d = _rays()
    dense = march_rays(g, o, d, 128, 1400.0, 1600.0)
    k = int(np.asarray(dense.mask).sum(-1).max()) + 8
    m = march_rays(g, o, d, 128, 1400.0, 1600.0, compact_k=k)
    p = march_pressure(m)
    assert int(p["march/over_k"]) == 0
    assert int(p["march/over_k_lo"]) == 0
    # ac reports the batch's max active count even with zero overflow —
    # the decay's evidence (pressure.py invariant 5b)
    assert int(p["march/ac"]) == int(np.asarray(dense.mask).sum(-1).max())
    assert int(p["march/ac_lo"]) == 0


def test_hybrid_edge_fires_when_active_region_outruns_w_cap():
    # fully occupied grid: every in-box sample is active, so a w_cap
    # window far from the lattice end must flag its edge
    g = with_packed(create_grid(AABB, 16))
    o, d = _rays()
    m = march_rays_hybrid(
        g, o, d, 128, 1400.0, 1600.0, k=16, w_cap=32, aabb_extent=150.0
    )
    assert np.asarray(m.edge_active).all()
    p = march_pressure(m)
    assert int(p["march/edge_rays"]) == 2
    # actives fill the window -> over_k = w_cap - k
    assert int(p["march/over_k"]) == 32 - 16


def test_hybrid_edge_quiet_on_contained_region():
    g = with_packed(update_grid(create_grid(AABB, 32), sphere_sigma, occ_thre=1e-4))
    o, d = _rays()
    dense = march_rays(g, o, d, 128, 1400.0, 1600.0)
    k = int(np.asarray(dense.mask).sum(-1).max()) + 8
    m = march_rays_hybrid(
        g, o, d, 128, 1400.0, 1600.0, k=k, w_cap=128, aabb_extent=150.0
    )
    p = march_pressure(m)
    assert int(p["march/over_k"]) == 0
    assert int(p["march/edge_rays"]) == 0


def test_window_edge_flags_span_truncation():
    g = with_packed(create_grid(AABB, 16))  # fully occupied
    o, d = _rays()
    m = march_rays_window(
        g, o, d, 128, 1400.0, 1600.0, k=24, aabb_extent=150.0
    )
    # the conservative coarse window spans the whole in-box region, far
    # wider than k=24 -> span truncation pressure on every hit ray
    assert np.asarray(m.edge_active).all()
    # window mode never count-truncates: active_count <= k by construction
    assert int(np.asarray(m.active_count).max()) <= 24
    assert int(march_pressure(m)["march/over_k"]) == 0


def test_hybrid2_pressure_in_input_ray_order():
    g = with_packed(update_grid(create_grid(AABB, 32), sphere_sigma, occ_thre=1e-4))
    key = jax.random.PRNGKey(0)
    n = 16
    o = jnp.stack(
        [
            jax.random.uniform(key, (n,), minval=-30, maxval=30),
            jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=-30, maxval=30),
            jnp.full((n,), 1500.0),
        ],
        axis=-1,
    )
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    m1 = march_rays_hybrid(
        g, o, d, 128, 1400.0, 1600.0, k=16, w_cap=64, aabb_extent=150.0
    )
    m2 = march_rays_hybrid2(
        g, o, d, 128, 1400.0, 1600.0, k=16, w_lo=48, w_cap=64,
        split=0.5, aabb_extent=150.0,
    )
    assert m2.active_count.shape == (n,)
    # rays marched at the same w_cap report identical counts; the lo
    # bucket's w_lo can only LOWER a count (narrower candidate window)
    assert (
        np.asarray(m2.active_count) <= np.asarray(m1.active_count)
    ).all()


def test_hybrid2k_buckets_carry_pressure():
    g = with_packed(create_grid(AABB, 16))
    key = jax.random.PRNGKey(2)
    n = 16
    o = jnp.stack(
        [
            jax.random.uniform(key, (n,), minval=-30, maxval=30),
            jnp.zeros((n,)),
            jnp.full((n,), 1500.0),
        ],
        axis=-1,
    )
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    m = march_rays_hybrid2k(
        g, o, d, 128, 1400.0, 1600.0, k=24, k_lo=8, w_lo=32, w_cap=64,
        split=0.5, aabb_extent=150.0,
    )
    assert isinstance(m, BucketedRays)
    p = march_pressure(m)
    # fully occupied: lo bucket actives fill w_lo=32 >> k_lo=8
    assert int(p["march/over_k_lo"]) > 0
    assert int(p["march/over_k"]) > 0
    assert int(p["march/edge_rays"]) > 0


@pytest.fixture(scope="module")
def sphere_data():
    vol = make_sphere_volume(res=48, extent=75.0, radius=30.0, mu=0.02)
    cfg = DatagenConfig(
        limited_size=90.0, number_angles=2.0, img_width=24, img_height=24,
        sample_outside=100.0, stratified_depths=False,
    )
    return generate_dataset(vol, cfg)


def _cfg(**kw):
    defaults = dict(
        sample_size=8,
        depth_samples_per_ray=64,
        grid_resolution=16,
        n_iters=4,
        display_every=2,
        num_layers=2,
        num_hidden_units=16,
        coarse_lr=5e-3,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_compacted_step_reports_pressure_metrics(sphere_data):
    cfg = _cfg(compact_samples=16, march_mode="lattice")
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, near=1400.0, far=1600.0)
    state, metrics, _, _ = step(state, sphere_data.rays)
    for key in ("march/over_k", "march/over_k_lo", "march/edge_rays"):
        assert key in metrics
        assert np.isfinite(float(metrics[key]))
    # the fresh grid is fully occupied: 64 in-box actives >> k=16
    assert int(metrics["march/over_k"]) > 0


def test_dense_step_has_no_pressure_metrics(sphere_data):
    cfg = _cfg()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, near=1400.0, far=1600.0)
    state, metrics, _, _ = step(state, sphere_data.rays)
    assert "march/over_k" not in metrics


def test_chunked_pressure_stacks(sphere_data):
    cfg = _cfg(compact_samples=16, march_mode="hybrid", hybrid_w_cap=32)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    chunk = make_train_chunk(model, cfg, 1400.0, 1600.0, 3)
    state, mstack, _, _ = chunk(state, sphere_data.rays)
    assert mstack["march/over_k"].shape == (3,)
    assert int(jnp.max(mstack["march/over_k"])) >= 0
