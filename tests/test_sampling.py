"""Weighted ray sampling (Gumbel top-k) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_for_angiography_tpu.ops import (
    RayDataset,
    gumbel_topk_indices,
    sample_image_rays,
    sample_pixel_rays,
)


def make_dataset(n=1000, views=4):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    per = n // views
    return RayDataset(
        origins=jax.random.normal(ks[0], (n, 3)),
        directions=jax.random.normal(ks[1], (n, 3)),
        pixel_values=jax.random.uniform(ks[2], (n,)),
        weights=jax.random.uniform(ks[3], (n,)) + 1e-10,
        image_ids=jnp.repeat(jnp.arange(views), per),
        x_positions=jnp.zeros(n, jnp.int32),
        y_positions=jnp.zeros(n, jnp.int32),
    )


def test_gumbel_topk_no_replacement(rng):
    w = jnp.ones(100)
    idx = np.asarray(gumbel_topk_indices(rng, w, 50))
    assert len(np.unique(idx)) == 50


def test_gumbel_topk_respects_weights():
    """Elements with 10x weight should be sampled ~10x as often."""
    w = jnp.concatenate([jnp.full(500, 10.0), jnp.full(500, 1.0)])
    counts = np.zeros(1000)
    for i in range(200):
        idx = np.asarray(gumbel_topk_indices(jax.random.PRNGKey(i), w, 100))
        counts[idx] += 1
    heavy = counts[:500].mean()
    light = counts[500:].mean()
    assert 6.0 < heavy / light < 14.0


def test_gumbel_topk_zero_weight_never_sampled(rng):
    w = jnp.concatenate([jnp.zeros(50), jnp.ones(50)])
    idx = np.asarray(gumbel_topk_indices(rng, w, 50))
    assert np.all(idx >= 50)


def test_sample_pixel_rays_shapes(rng):
    data = make_dataset()
    batch = sample_pixel_rays(rng, data, 64)
    assert batch.origins.shape == (64, 3)
    assert batch.directions.shape == (64, 3)
    assert batch.pixel_values.shape == (64,)


def test_sample_pixel_rays_jits(rng):
    data = make_dataset()
    f = jax.jit(lambda k: sample_pixel_rays(k, data, 32).pixel_values.sum())
    assert np.isfinite(float(f(rng)))


def test_sample_image_rays_single_view(rng):
    data = make_dataset(n=1000, views=4)
    batch = sample_image_rays(rng, data, 16, num_images=4, rays_per_image=250)
    # all sampled rays come from one view: origins of a view are distinct rows
    # check indices stay within one 250-stride block via pixel identity
    idx_all = []
    for i in range(16):
        row = np.asarray(batch.origins[i])
        matches = np.where((np.asarray(data.origins) == row).all(-1))[0]
        idx_all.append(matches[0])
    blocks = np.unique(np.array(idx_all) // 250)
    assert len(blocks) == 1


def test_whole_image_rays_ordered():
    """Ordered whole-view batch (nerf_helpers.py:152-166 non-random branch):
    returns every ray of the view in stored pixel order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_for_angiography_tpu.ops import RayDataset, whole_image_rays

    n_img, per = 3, 16
    n = n_img * per
    key = jax.random.PRNGKey(0)
    ds = RayDataset(
        origins=jax.random.normal(key, (n, 3)),
        directions=jax.random.normal(key, (n, 3)),
        pixel_values=jnp.arange(n, dtype=jnp.float32),
        weights=jnp.ones((n,)),
        image_ids=jnp.repeat(jnp.arange(n_img), per),
        x_positions=jnp.tile(jnp.arange(per), n_img),
        y_positions=jnp.zeros((n,), jnp.int32),
    )
    batch = whole_image_rays(ds, 1, per)
    np.testing.assert_array_equal(
        np.asarray(batch.pixel_values), np.arange(per, 2 * per, dtype=np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(batch.origins), np.asarray(ds.origins[per : 2 * per])
    )
    # jit-safe with traced index
    jitted = jax.jit(lambda i: whole_image_rays(ds, i, per))
    np.testing.assert_array_equal(
        np.asarray(jitted(2).pixel_values), np.arange(2 * per, 3 * per, dtype=np.float32)
    )


def test_overdraw_sampler_unique_and_in_range():
    from nerf_for_angiography_tpu.ops import (
        build_sampling_table,
        overdraw_sample_indices,
    )

    table = build_sampling_table(jnp.ones(10_000))
    idx = np.asarray(overdraw_sample_indices(jax.random.PRNGKey(0), table, 500))
    assert idx.shape == (500,)
    assert (idx >= 0).all() and (idx < 10_000).all()
    assert len(np.unique(idx)) == 500  # dedupe held at this ratio


def test_overdraw_matches_gumbel_inclusion_probabilities():
    """The fast sampler's marginal inclusion frequencies track the exact
    Gumbel top-k sampler's within a few percent (the documented ~1%-bias
    claim, with Monte-Carlo slack)."""
    from nerf_for_angiography_tpu.ops import (
        build_sampling_table,
        gumbel_topk_indices,
        overdraw_sample_indices,
    )

    n_pop, n_draw, trials = 2_000, 200, 300
    w = jnp.concatenate([jnp.ones(n_pop // 2), jnp.full(n_pop // 2, 4.0)])
    table = build_sampling_table(w)

    def freq(sampler):
        counts = np.zeros(n_pop)
        for t in range(trials):
            idx = np.asarray(sampler(jax.random.PRNGKey(t), n_draw))
            counts[idx] += 1
        return counts / trials

    gumbel_topk = lambda k, n: gumbel_topk_indices(k, w, n)  # noqa: E731
    overdraw = lambda k, n: overdraw_sample_indices(k, table, n)  # noqa: E731

    f_ex = freq(gumbel_topk)
    f_ov = freq(overdraw)
    # compare inclusion probability per weight class
    for cls in (slice(0, n_pop // 2), slice(n_pop // 2, n_pop)):
        p_ex, p_ov = f_ex[cls].mean(), f_ov[cls].mean()
        assert abs(p_ov - p_ex) < 0.15 * p_ex + 0.005, (p_ex, p_ov)
    # the heavy class must be sampled ~4x more in both
    assert f_ov[n_pop // 2:].mean() > 2.5 * f_ov[: n_pop // 2].mean()
    # No POSITIONAL bias within a weight class: the surplus drop must not
    # correlate with ray index (a sorted-order dedupe starves the top of
    # the index range — i.e. the last training view). Compare the top-5%
    # -by-index bucket against the bottom-5% bucket inside each class.
    for lo, hi in ((0, n_pop // 2), (n_pop // 2, n_pop)):
        width = (hi - lo) // 20  # 5% of the class
        bottom = f_ov[lo : lo + width].mean()
        top = f_ov[hi - width : hi].mean()
        assert abs(top - bottom) < 0.25 * bottom + 0.005, (lo, bottom, top)
        assert top > 0.0, "top-of-index rays must not be starved"


def test_sample_pixel_rays_overdraw_impl():
    views, per = 3, 64
    data = RayDataset(
        origins=jnp.arange(views * per * 3, dtype=jnp.float32).reshape(-1, 3),
        directions=jnp.ones((views * per, 3)),
        pixel_values=jnp.arange(views * per, dtype=jnp.float32),
        weights=jnp.ones(views * per),
        image_ids=jnp.repeat(jnp.arange(views), per),
        x_positions=jnp.zeros(views * per, jnp.int32),
        y_positions=jnp.zeros(views * per, jnp.int32),
    )
    batch = sample_pixel_rays(jax.random.PRNGKey(0), data, 32, impl="overdraw")
    assert batch.origins.shape == (32, 3)
    # consistency: picked pixel_values correspond to picked origins rows
    rows = np.asarray(batch.origins[:, 0]) / 3.0
    np.testing.assert_allclose(rows, np.asarray(batch.pixel_values), atol=1e-5)


def test_overdraw_scatter_min_path_bit_exact():
    """The scatter-min dedupe (n_values set — the path sample_pixel_rays
    uses) selects EXACTLY the same indices in the same order as the
    argsort fallback, including the duplicate-spill shortfall regime."""
    from nerf_for_angiography_tpu.ops import (
        build_sampling_table,
        overdraw_sample_indices,
    )

    # normal regime: plenty of unique draws
    n_pop = 10_000
    table = build_sampling_table(jnp.ones(n_pop))
    for seed in range(5):
        k = jax.random.PRNGKey(seed)
        ref = np.asarray(overdraw_sample_indices(k, table, 500))
        fast = np.asarray(
            overdraw_sample_indices(k, table, 500, n_values=n_pop)
        )
        np.testing.assert_array_equal(fast, ref)

    # forced shortfall: population smaller than the draw, so the output
    # must be [all uniques in draw order, earliest duplicates in order]
    n_pop = 64
    table = build_sampling_table(jnp.ones(n_pop))
    for seed in range(5):
        k = jax.random.PRNGKey(seed)
        ref = np.asarray(overdraw_sample_indices(k, table, 60, oversample=1.2))
        fast = np.asarray(
            overdraw_sample_indices(k, table, 60, oversample=1.2, n_values=n_pop)
        )
        np.testing.assert_array_equal(fast, ref)
