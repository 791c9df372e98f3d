"""First-k-active Pallas kernel: exact parity vs the XLA compare+count
(interpret mode on CPU; the same kernel compiles natively on TPU) and
through the hybrid march family via the ``fka`` backend toggle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_for_angiography_tpu.ops.occupancy import (
    OccupancyGrid,
    _first_k_active,
    march_rays,
    march_rays_hybrid,
    with_packed,
)
from nerf_for_angiography_tpu.ops.pallas.first_k import first_k_active_pallas


@pytest.mark.parametrize(
    "shape,k",
    [((37, 160), 88), ((5, 7, 96), 48), ((300, 33), 16), ((600, 160), 88)],
)
def test_parity_random(shape, k):
    mask = (
        jax.random.uniform(jax.random.PRNGKey(hash(shape) % 2**31), shape)
        < 0.4
    ).astype(jnp.float32)
    s0, m0 = _first_k_active(mask, k)
    s1, m1 = first_k_active_pallas(mask, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


@pytest.mark.parametrize("fill", [0.0, 1.0])
def test_parity_degenerate(fill):
    mask = jnp.full((11, 64), fill)
    s0, m0 = _first_k_active(mask, 32)
    s1, m1 = first_k_active_pallas(mask, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


def test_parity_k_exceeds_actives_and_dense_rows():
    """Rows denser than k truncate; rows sparser than k pad at w-1."""
    w, k = 96, 24
    rows = [
        np.zeros(w),
        np.ones(w),
        np.r_[np.zeros(40), np.ones(50), np.zeros(6)],
        np.r_[np.ones(10), np.zeros(86)],
    ]
    mask = jnp.asarray(np.stack(rows), dtype=jnp.float32)
    s0, m0 = _first_k_active(mask, k)
    s1, m1 = first_k_active_pallas(mask, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


def _tiny_scene():
    res = 16
    binary = np.zeros((res, res, res), bool)
    binary[6:10, 6:10, 6:10] = True
    grid = with_packed(
        OccupancyGrid(
            occs=jnp.zeros((res, res, res), jnp.float32),
            binary=jnp.asarray(binary),
            aabb=jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0], jnp.float32),
        )
    )
    n_rays = 70
    key = jax.random.PRNGKey(3)
    origins = jnp.stack(
        [
            jax.random.uniform(key, (n_rays,), minval=-0.5, maxval=0.5),
            jax.random.uniform(
                jax.random.PRNGKey(4), (n_rays,), minval=-0.5, maxval=0.5
            ),
            jnp.full((n_rays,), -2.0),
        ],
        axis=-1,
    )
    directions = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_rays, 1))
    return grid, origins, directions


def test_march_rays_pallas_backend_equal():
    grid, origins, directions = _tiny_scene()
    m0 = march_rays(grid, origins, directions, 64, 0.5, 3.5, compact_k=24)
    m1 = march_rays(
        grid, origins, directions, 64, 0.5, 3.5, compact_k=24,
        fka="pallas_interpret",
    )
    for a, b in zip(m0, m1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_march_hybrid_pallas_backend_equal():
    grid, origins, directions = _tiny_scene()
    m0 = march_rays_hybrid(
        grid, origins, directions, 64, 0.5, 3.5, k=24, w_cap=48,
        aabb_extent=2.0,
    )
    m1 = march_rays_hybrid(
        grid, origins, directions, 64, 0.5, 3.5, k=24, w_cap=48,
        aabb_extent=2.0, fka="pallas_interpret",
    )
    for a, b in zip(m0, m1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_march_fka_config_plumbs_to_train_step():
    """TrainConfig.march_fka reaches every march the train step builds
    (VERDICT r4 #2 promotion knob): the hybrid2k two-bucket step at
    fka='pallas_interpret' must produce the identical loss to 'xla'."""
    import dataclasses

    from nerf_for_angiography_tpu.training import (
        TrainConfig, create_train_state, make_train_step,
    )
    from nerf_for_angiography_tpu.ops.sampling import RayDataset

    cfg = TrainConfig(
        depth_samples_per_ray=64, sample_size=8, grid_resolution=16,
        outside=100.0, march_mode="hybrid", compact_samples=16,
        hybrid_split=0.75, hybrid_w_lo=32, hybrid_w_cap=48,
        hybrid_bucket_k=True, hybrid_k_lo=8,
    )
    n_rays = 256
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    lat = jax.random.uniform(k1, (n_rays, 2), minval=-0.05, maxval=0.05)
    dirs = jnp.concatenate([lat, jnp.ones((n_rays, 1))], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.concatenate(
        [jnp.zeros((n_rays, 2)), jnp.full((n_rays, 1), -1500.0)], axis=-1
    )
    rays = RayDataset(
        origins=origins, directions=dirs,
        pixel_values=jax.random.uniform(k2, (n_rays,)),
        weights=jnp.ones((n_rays,)),
        image_ids=jnp.zeros((n_rays,), jnp.int32),
        x_positions=jnp.zeros((n_rays,), jnp.int32),
        y_positions=jnp.zeros((n_rays,), jnp.int32),
        sampling_table=None,
    )
    losses = {}
    for fka in ("xla", "pallas_interpret"):
        c = dataclasses.replace(cfg, march_fka=fka)
        model, state = create_train_state(c, jax.random.PRNGKey(3))
        state = state._replace(step=jnp.ones((), jnp.int32))
        step = make_train_step(model, c, 1400.0, 1600.0)
        _, metrics, *_ = step(state, rays)
        losses[fka] = float(metrics["loss/train-pixel-coarse"])
    assert losses["xla"] == losses["pallas_interpret"], losses


def test_no_gradient_path_through_kernel():
    """The march is off the AD path; grads through a loss that consumes
    the pallas-compacted mask must not error and must match XLA."""
    mask_logits = jnp.linspace(-1.0, 1.0, 64).reshape(1, 64)

    def loss(x, fka):
        mask = (jax.nn.sigmoid(x) > 0.5).astype(jnp.float32)
        sel, mk = _first_k_active(mask, 16, fka)
        # downstream differentiable consumer mixes mask_k with x-derived
        # values, the shape of the real render step
        vals = jnp.take_along_axis(x, sel, axis=-1)
        return jnp.sum(vals * mk)

    g0 = jax.grad(lambda x: loss(x, "xla"))(mask_logits)
    g1 = jax.grad(lambda x: loss(x, "pallas_interpret"))(mask_logits)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1))
