"""Occupancy grid + fixed-width marching tests (the nerfacc replacement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_for_angiography_tpu.ops import (
    cell_centers,
    create_grid,
    every_n_step,
    march_rays,
    prune_mask,
    query_occ,
    ray_aabb_intersect,
    render_xray,
    update_grid,
)

AABB = jnp.array([-100.0, -100.0, -100.0, 100.0, 100.0, 100.0])


def sphere_sigma(points, radius=30.0, value=0.9):
    r = jnp.linalg.norm(points, axis=-1)
    return jnp.where(r < radius, value, 0.0)


def test_create_grid_starts_fully_occupied():
    g = create_grid(AABB, 16)
    assert bool(jnp.all(g.binary))
    assert g.resolution == 16


def test_cell_centers_cover_aabb():
    g = create_grid(AABB, 8)
    c = np.asarray(cell_centers(g))
    assert c.shape == (512, 3)
    assert c.min() == pytest.approx(-100 + 200 / 16, abs=1e-4)
    assert c.max() == pytest.approx(100 - 200 / 16, abs=1e-4)


def test_update_grid_learns_sphere():
    g = create_grid(AABB, 32)
    g = update_grid(g, sphere_sigma, occ_thre=1e-4)
    # center occupied, far corner not
    assert bool(query_occ(g, jnp.array([0.0, 0.0, 0.0])))
    assert not bool(query_occ(g, jnp.array([90.0, 90.0, 90.0])))
    # occupied fraction ~ sphere volume / box volume
    frac = float(jnp.mean(g.binary))
    want = (4 / 3 * np.pi * 30**3) / 200**3
    assert frac == pytest.approx(want, rel=0.3)


def test_update_grid_ema_decay():
    g = create_grid(AABB, 8)
    g1 = update_grid(g, lambda p: jnp.full(p.shape[:-1], 0.8), occ_thre=1e-2)
    np.testing.assert_allclose(np.asarray(g1.occs), 0.8, atol=1e-6)
    # now the field goes dark; occs decays by 0.95 per update
    g2 = update_grid(g1, lambda p: jnp.zeros(p.shape[:-1]), occ_thre=1e-2)
    np.testing.assert_allclose(np.asarray(g2.occs), 0.8 * 0.95, atol=1e-6)


def test_every_n_step_gates_updates():
    g = create_grid(AABB, 8)
    fn = lambda p: jnp.full(p.shape[:-1], 0.5)  # noqa: E731
    g_updated = every_n_step(g, jnp.int32(0), fn, occ_thre=1e-2)
    g_skipped = every_n_step(g, jnp.int32(7), fn, occ_thre=1e-2)
    assert float(jnp.max(g_updated.occs)) == pytest.approx(0.5)
    assert float(jnp.max(g_skipped.occs)) == 0.0


def test_query_occ_outside_aabb_false():
    g = create_grid(AABB, 8)
    assert not bool(query_occ(g, jnp.array([500.0, 0.0, 0.0])))


def test_ray_aabb_intersect():
    o = jnp.array([[0.0, 0.0, 1500.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t0, t1 = ray_aabb_intersect(AABB, o, d)
    assert float(t0[0]) == pytest.approx(1400.0)
    assert float(t1[0]) == pytest.approx(1600.0)
    # miss
    o2 = jnp.array([[0.0, 500.0, 1500.0]])
    t0m, t1m = ray_aabb_intersect(AABB, o2, d)
    assert float(t0m[0]) > float(t1m[0])


def test_march_rays_masks_empty_space():
    g = create_grid(AABB, 32)
    g = update_grid(g, sphere_sigma, occ_thre=1e-4)
    o = jnp.array([[0.0, 0.0, 1500.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    m = march_rays(g, o, d, 300, 1400.0, 1600.0)
    assert m.mask.shape == (1, 300)
    # only samples within |z| < ~30 are active
    z = np.asarray(m.positions[0, :, 2])
    active = np.asarray(m.mask[0]) > 0
    assert np.all(np.abs(z[active]) <= 32.0)
    assert 0 < active.sum() < 120


def test_march_plus_render_matches_dense_render():
    """Grid-pruned masked render == dense render for a sphere phantom."""
    g = create_grid(AABB, 64)
    g = update_grid(g, sphere_sigma, occ_thre=1e-4)
    o = jnp.array([[0.0, 0.0, 1500.0], [50.0, 0.0, 1500.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    n = 400
    m = march_rays(g, o, d, n, 1400.0, 1600.0)
    sigma = sphere_sigma(m.positions)
    dists = np.asarray(m.t_ends - m.t_starts)
    pruned = render_xray(sigma, (m.t_starts + m.t_ends) / 2, None, mask=m.mask, dists=m.t_ends - m.t_starts)
    dense = render_xray(sigma, (m.t_starts + m.t_ends) / 2, None, dists=m.t_ends - m.t_starts)
    # the sphere sigma is zero outside the grid-active region anyway
    np.testing.assert_allclose(
        np.asarray(pruned.pixels), np.asarray(dense.pixels), rtol=1e-5
    )
    # analytic: chord through center = 2*30 => exp(-0.9*60)
    assert float(pruned.pixels[0]) == pytest.approx(np.exp(-0.9 * 60.0), rel=0.05)


def test_prune_mask_alpha_threshold():
    sigma = jnp.array([[1e-6, 0.5, 1e-6, 0.5]])
    dists = jnp.ones((1, 4))
    mask = jnp.ones((1, 4))
    kept = np.asarray(prune_mask(sigma, dists, mask, alpha_thre=1e-3))
    np.testing.assert_array_equal(kept, [[0.0, 1.0, 0.0, 1.0]])


def test_prune_mask_early_stop():
    # huge optical depth at sample 1 -> transmittance collapses after it
    sigma = jnp.array([[0.1, 50.0, 0.1, 0.1]])
    dists = jnp.ones((1, 4))
    mask = jnp.ones((1, 4))
    kept = np.asarray(prune_mask(sigma, dists, mask, early_stop_eps=1e-2))
    np.testing.assert_array_equal(kept, [[1.0, 1.0, 0.0, 0.0]])


def test_march_is_jittable():
    g = create_grid(AABB, 16)

    @jax.jit
    def run(grid, o, d):
        m = march_rays(grid, o, d, 64, 1400.0, 1600.0)
        return m.mask.sum()

    out = run(g, jnp.zeros((4, 3)).at[:, 2].set(1500.0), jnp.zeros((4, 3)).at[:, 2].set(-1.0))
    assert np.isfinite(float(out))


def test_compact_rays_equals_dense_render():
    """Compacted (first-k-active) render == dense render when k covers all
    active samples."""
    from nerf_for_angiography_tpu.ops import compact_rays

    g = create_grid(AABB, 32)
    g = update_grid(g, sphere_sigma, occ_thre=1e-4)
    o = jnp.array([[0.0, 0.0, 1500.0], [30.0, 10.0, 1500.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [-0.02, 0.0, -1.0]])
    m = march_rays(g, o, d, 300, 1400.0, 1600.0)
    active = int(np.asarray(m.mask).sum(-1).max())
    k = active + 8
    mc = compact_rays(m, k)
    assert mc.positions.shape == (2, k, 3)
    # all active samples survived
    assert float(mc.mask.sum()) == float(m.mask.sum())

    dense = render_xray(
        sphere_sigma(m.positions), (m.t_starts + m.t_ends) / 2, None,
        mask=m.mask, dists=m.t_ends - m.t_starts,
    )
    comp = render_xray(
        sphere_sigma(mc.positions), (mc.t_starts + mc.t_ends) / 2, None,
        mask=mc.mask, dists=mc.t_ends - mc.t_starts,
    )
    np.testing.assert_allclose(
        np.asarray(comp.pixels), np.asarray(dense.pixels), rtol=1e-5
    )


def test_compact_rays_truncation_is_early_stop_like():
    from nerf_for_angiography_tpu.ops import compact_rays

    g = create_grid(AABB, 16)  # fully occupied
    o = jnp.array([[0.0, 0.0, 1500.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    m = march_rays(g, o, d, 64, 1400.0, 1600.0)
    mc = compact_rays(m, 16)
    # keeps the EARLIEST active samples
    np.testing.assert_allclose(
        np.asarray(mc.t_starts[0]), np.asarray(m.t_starts[0, :16]), rtol=1e-6
    )


def test_march_compact_k_matches_standalone_compaction():
    """march_rays(compact_k) (zero-gather recompute) == compact_rays on the
    dense lattice, on the ACTIVE samples. Padding placement differs by
    design: the sort-free compaction (_first_k_active) emits actives
    first then clipped-index padding, while compact_rays interleaves by
    index — padding is mask=0 and every sample carries its own
    [t, t+step) interval, so renders are identical either way (the
    render-equality tests pin that)."""
    from nerf_for_angiography_tpu.ops import compact_rays

    g = create_grid(AABB, 32)
    g = update_grid(g, sphere_sigma, occ_thre=1e-4)
    o = jnp.array([[0.0, 0.0, 1500.0], [30.0, 10.0, 1500.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [-0.02, 0.0, -1.0]])
    dense = march_rays(g, o, d, 128, 1400.0, 1600.0)
    k = 48
    a = compact_rays(dense, k)
    b = march_rays(g, o, d, 128, 1400.0, 1600.0, compact_k=k)
    a_mask = np.asarray(a.mask)
    b_mask = np.asarray(b.mask)
    np.testing.assert_allclose(a_mask.sum(axis=-1), b_mask.sum(axis=-1))
    for r in range(a_mask.shape[0]):
        ai = a_mask[r] > 0.5
        bi = b_mask[r] > 0.5
        # actives agree in value AND along-ray order
        np.testing.assert_allclose(
            np.asarray(a.t_starts)[r, ai], np.asarray(b.t_starts)[r, bi],
            atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(a.positions)[r, ai], np.asarray(b.positions)[r, bi],
            atol=1e-2,
        )


def test_first_k_active_matches_sort_reference():
    """The sort-free cumsum compaction (ops/occupancy.py::_first_k_active)
    selects exactly the first k actives, in order, across random masks —
    checked against the straightforward sorted-keys reference. Padding
    slots (j >= #actives) may differ in index (clipped vs index-ordered)
    but must agree on mask_k = 0."""
    from nerf_for_angiography_tpu.ops.occupancy import _first_k_active

    def sort_ref(mask, k):
        w = mask.shape[-1]
        order = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
        keys = jnp.where(mask > 0.5, order, order + w)
        skeys = jax.lax.sort(keys, dimension=-1)[..., :k]
        return skeys % w, (skeys < w).astype(jnp.float32)

    rng = np.random.default_rng(0)
    # a few distinct SHAPES (each a fresh trace/compile on the 1-core
    # host — 20 random shapes cost 69 s in the round-5 suite baseline),
    # many random FILLS per shape (content variation reuses the compile)
    for r, w, k in ((1, 2, 1), (7, 33, 12), (24, 70, 70), (40, 64, 17)):
        for _ in range(5):
            mask = (rng.random((r, w)) < rng.random()).astype(np.float32)
            s_sel, s_mk = sort_ref(jnp.array(mask), k)
            c_sel, c_mk = _first_k_active(jnp.array(mask), k)
            np.testing.assert_array_equal(np.asarray(s_mk), np.asarray(c_mk))
            active = np.asarray(s_mk) > 0.5
            np.testing.assert_array_equal(
                np.asarray(s_sel)[active], np.asarray(c_sel)[active]
            )
            # padding stays in range
            assert int(np.asarray(c_sel).max()) <= w - 1


def test_occ_stride_mask_is_superset():
    """Stride-2 probing must never drop a sample the exact mask keeps
    (union of bracketing probes) on a cell-aligned phantom."""
    g = create_grid(AABB, 64)
    g = update_grid(g, sphere_sigma, occ_thre=1e-4)
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (64, 3)) * jnp.array([0.05, 0.05, 0.0]) + jnp.array([0.0, 0.0, -1.0])
    o = jnp.broadcast_to(jnp.array([0.0, 0.0, 1500.0]), d.shape)
    exact = march_rays(g, o, d, 300, 1400.0, 1600.0)
    strided = march_rays(g, o, d, 300, 1400.0, 1600.0, occ_stride=2)
    # superset: strided mask >= exact mask everywhere
    assert np.all(np.asarray(strided.mask) >= np.asarray(exact.mask) - 1e-6)
    # and not wildly larger (cells are ~2.3 samples wide)
    assert float(strided.mask.sum()) <= float(exact.mask.sum()) * 1.8 + 64


def test_query_occ_matches_direct_indexing():
    """Bit-packed row-gather lookup == direct boolean indexing, across
    resolutions (incl. res<32 single-word and res=40 ragged-word cases),
    via BOTH the cached-packed path (with_packed — mutating binary goes
    through it) and the pack-on-the-fly fallback (packed=None)."""
    from nerf_for_angiography_tpu.ops.occupancy import with_packed, world_to_index

    key = jax.random.PRNGKey(3)
    for res in (8, 16, 40, 64):
        g = create_grid(AABB, res)
        bits = jax.random.bernoulli(jax.random.fold_in(key, res), 0.3,
                                    (res, res, res))
        g = with_packed(g._replace(binary=bits))
        g_legacy = g._replace(packed=None, packed_coarse=None)
        pts = jax.random.uniform(
            jax.random.fold_in(key, res + 1), (2000, 3), minval=-120.0,
            maxval=120.0,
        )
        idx = np.asarray(world_to_index(g, pts))
        inside = np.all((np.asarray(pts) >= -100.0) & (np.asarray(pts) <= 100.0), -1)
        want = np.asarray(bits)[idx[:, 0], idx[:, 1], idx[:, 2]] & inside
        np.testing.assert_array_equal(np.asarray(query_occ(g, pts)), want)
        np.testing.assert_array_equal(np.asarray(query_occ(g_legacy, pts)), want)


def test_pack_grid_bits_roundtrip():
    from nerf_for_angiography_tpu.ops.occupancy import pack_grid_bits

    key = jax.random.PRNGKey(5)
    for res in (8, 32, 40):
        bits = jax.random.bernoulli(key, 0.5, (res, res, res))
        packed = np.asarray(pack_grid_bits(bits))
        words = max(1, -(-res // 32))
        assert packed.shape == (res * res, words)
        flat = np.asarray(bits).reshape(res * res, res)
        for w in range(words):
            for b in range(min(32, res - 32 * w)):
                got = (packed[:, w] >> b) & 1
                np.testing.assert_array_equal(got, flat[:, 32 * w + b])


def test_safe_occ_stride_guard():
    from nerf_for_angiography_tpu.ops.occupancy import safe_occ_stride

    # flagship: spacing 2*(200/300)=1.33 < cell 200/128=1.5625 -> keeps 2
    assert safe_occ_stride(2, 300, 1400.0, 1600.0, 200.0, 128) == 2
    # stride 3 -> spacing 2.0 >= 1.5625 -> falls back to 2
    with pytest.warns(UserWarning, match="superset"):
        assert safe_occ_stride(3, 300, 1400.0, 1600.0, 200.0, 128) == 2
    # fewer samples break stride 2: spacing 2*(200/100)=4 >= 1.5625 -> 1
    with pytest.warns(UserWarning, match="superset"):
        assert safe_occ_stride(2, 100, 1400.0, 1600.0, 200.0, 128) == 1
    # stride 1 is always allowed, silently
    assert safe_occ_stride(1, 10, 0.0, 1000.0, 200.0, 128) == 1


def test_occ_stride_superset_property_across_shapes():
    """The guarded stride keeps the superset property for many
    (resolution, n_samples, stride) combinations (VERDICT r1 weak #7)."""
    from nerf_for_angiography_tpu.ops.occupancy import safe_occ_stride

    key = jax.random.PRNGKey(11)
    d = jax.random.normal(key, (32, 3)) * jnp.array([0.08, 0.08, 0.0]) + jnp.array(
        [0.0, 0.0, -1.0]
    )
    o = jnp.broadcast_to(jnp.array([0.0, 0.0, 1500.0]), d.shape)
    for res in (32, 64, 128):
        g = create_grid(AABB, res)
        g = update_grid(g, sphere_sigma, occ_thre=1e-4)
        for n_samples in (100, 200, 300):
            # dedupe: distinct SAFE strides only (requesting 2/3/4 often
            # clamps to the same value), exact march computed once per
            # (res, n_samples) — same assertions, ~3x fewer marches
            # (this test alone was 75 s of the round-5 suite baseline)
            safe = {
                safe_occ_stride(w, n_samples, 1400.0, 1600.0, 200.0, res)
                for w in (2, 3, 4)
            }
            safe.discard(1)  # stride 1 IS the exact march
            exact = np.asarray(
                march_rays(g, o, d, n_samples, 1400.0, 1600.0).mask
            )
            for s in sorted(safe):
                strided = march_rays(g, o, d, n_samples, 1400.0, 1600.0,
                                     occ_stride=s)
                assert np.all(
                    np.asarray(strided.mask) >= exact - 1e-6
                ), (res, n_samples, s)


# ---------------------------------------------------------------------------
# window marching (march_rays_window — the zero-gather compacted march)
# ---------------------------------------------------------------------------

from nerf_for_angiography_tpu.ops import (  # noqa: E402
    coarse_dilated_bits,
    march_rays_window,
    window_probe_stride,
)


def _rand_rays(key, n, aabb_extent=100.0, src_z=1500.0):
    """Rays from a distant source pointed at jittered targets in the box —
    the C-arm geometry regime (cttoray.py:58-69)."""
    k1, k2 = jax.random.split(key)
    origins = jnp.array([[0.0, 0.0, src_z]]) + jax.random.normal(k1, (n, 3)) * 50.0
    targets = jax.random.uniform(k2, (n, 3), minval=-60.0, maxval=60.0)
    d = targets - origins
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return origins, d


def _sphere_grid(res=64, radius=30.0):
    g = create_grid(AABB, res)
    return update_grid(g, sphere_sigma, occ_thre=1e-4)


def test_window_march_covers_every_active_sample():
    """Superset property: every sample the exact lattice march keeps must be
    inside (and unmasked in) the window, across resolutions and radii."""
    for res, radius, n_samples, k in [(64, 30.0, 300, 96), (128, 20.0, 300, 96),
                                      (32, 45.0, 200, 128)]:
        g = create_grid(AABB, res)
        g = update_grid(g, lambda p: sphere_sigma(p, radius), occ_thre=1e-4)
        o, d = _rand_rays(jax.random.PRNGKey(res), 256)
        near, far = 1400.0, 1600.0
        dense = march_rays(g, o, d, n_samples, near, far)
        win = march_rays_window(g, o, d, n_samples, near, far, k=k,
                                aabb_extent=200.0)
        step = (far - near) / n_samples
        w0 = np.round((np.asarray(win.t_starts[:, 0]) - near) / step).astype(int)
        dm = np.asarray(dense.mask) > 0
        wm = np.asarray(win.mask) > 0
        for r in range(dm.shape[0]):
            active = np.nonzero(dm[r])[0]
            if active.size == 0:
                continue
            span_needed = active[-1] - w0[r] + 1
            if span_needed > k:
                # truncation regime (legal: same as compact_k) — skip
                continue
            cols = active - w0[r]
            assert (cols >= 0).all(), f"res={res}: window starts after active"
            assert wm[r, cols].all(), f"res={res}: active sample masked out"


def test_window_march_equals_dense_when_grid_full():
    """All-occupied grid + k = n_samples => the window IS the lattice; the
    render must match the dense path exactly."""
    g = create_grid(AABB, 32)  # fully occupied
    o, d = _rand_rays(jax.random.PRNGKey(3), 64)
    near, far = 1400.0, 1600.0
    n_samples = 128
    dense = march_rays(g, o, d, n_samples, near, far)
    win = march_rays_window(g, o, d, n_samples, near, far, k=n_samples,
                            aabb_extent=200.0)
    sig_d = sphere_sigma(dense.positions)
    sig_w = sphere_sigma(win.positions)
    px_d = np.asarray(jnp.exp(-jnp.sum(sig_d * dense.mask * (dense.t_ends - dense.t_starts), -1)))
    px_w = np.asarray(jnp.exp(-jnp.sum(sig_w * win.mask * (win.t_ends - win.t_starts), -1)))
    np.testing.assert_allclose(px_w, px_d, atol=1e-6)


def test_window_render_matches_lattice_render_on_compact_field():
    """With a field that is zero outside occupied cells (the converged
    regime), window render == exact masked lattice render: gap samples
    contribute nothing, and the window covers all active samples."""
    # radius 20: occupied chord <= ~62 samples + window-start conservatism
    # stays within the k=96 budget for every ray (no truncation regime)
    g = create_grid(AABB, 64)
    g = update_grid(g, lambda p: sphere_sigma(p, radius=20.0), occ_thre=1e-4)
    o, d = _rand_rays(jax.random.PRNGKey(7), 128)
    near, far = 1400.0, 1600.0
    n_samples, k = 300, 96
    dense = march_rays(g, o, d, n_samples, near, far)
    win = march_rays_window(g, o, d, n_samples, near, far, k=k, aabb_extent=200.0)
    # field strictly inside the sphere => zero everywhere outside occupied
    field = lambda p: sphere_sigma(p, radius=18.0, value=0.4)  # noqa: E731
    dt = 200.0 / n_samples
    px_d = np.asarray(jnp.exp(-jnp.sum(field(dense.positions) * dense.mask * dt, -1)))
    px_w = np.asarray(jnp.exp(-jnp.sum(field(win.positions) * win.mask * dt, -1)))
    np.testing.assert_allclose(px_w, px_d, atol=1e-5)


def test_window_march_miss_rays_fully_masked():
    g = _sphere_grid(res=32)
    # rays that never touch the sphere (skim the +x face of the box)
    o = jnp.array([[200.0, 95.0, 95.0]])
    d = jnp.array([[-1.0, 0.0, 0.0]])
    win = march_rays_window(g, o, d, 200, 90.0, 310.0, k=64, aabb_extent=200.0)
    assert float(win.mask.sum()) == 0.0


def test_window_probe_stride_guard():
    # flagship: 300 samples over 200 units, 32^3 coarse cells of 6.25
    s = window_probe_stride(300, 1400.0, 1600.0, 200.0, 32)
    assert 1 <= s <= int(2 * 6.25 / (200.0 / 300))
    # pathological: tiny coarse grid -> stride collapses but stays >= 1
    assert window_probe_stride(10, 0.0, 1000.0, 200.0, 4) >= 1


def test_coarse_dilated_bits_superset():
    g = _sphere_grid(res=64)
    packed, cres = coarse_dilated_bits(np.asarray(g.binary), 4)
    assert cres == 16
    # every occupied fine cell's coarse cell must be set
    from nerf_for_angiography_tpu.ops.occupancy import _query_packed_bits

    pts = cell_centers(g)
    fine = np.asarray(query_occ(g, pts))
    coarse = np.asarray(_query_packed_bits(packed, cres, g.aabb, pts))
    assert (coarse[fine]).all()


def test_window_march_is_jittable():
    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(11), 32)
    f = jax.jit(lambda g, o, d: march_rays_window(
        g, o, d, 300, 1400.0, 1600.0, k=96, aabb_extent=200.0))
    m = f(g, o, d)
    assert m.positions.shape == (32, 96, 3)
    m2 = march_rays_window(g, o, d, 300, 1400.0, 1600.0, k=96, aabb_extent=200.0)
    np.testing.assert_allclose(np.asarray(m.mask), np.asarray(m2.mask))


# ---------------------------------------------------------------------------
# hybrid marching (march_rays_hybrid — coarse window + fine top-k inside)
# ---------------------------------------------------------------------------

from nerf_for_angiography_tpu.ops import (  # noqa: E402
    hybrid_w_cap,
    march_rays_hybrid,
)


def test_hybrid_march_render_equals_lattice_compact():
    """With spans inside w_cap and active counts inside k, the hybrid march
    keeps EXACTLY the samples the lattice top-k keeps: renders match."""
    for res, radius in [(64, 20.0), (128, 30.0)]:
        g = create_grid(AABB, res)
        g = update_grid(g, lambda p: sphere_sigma(p, radius), occ_thre=1e-4)
        o, d = _rand_rays(jax.random.PRNGKey(res + 1), 128)
        near, far, n, k = 1400.0, 1600.0, 300, 96
        lat = march_rays(g, o, d, n, near, far, compact_k=k)
        hyb = march_rays_hybrid(g, o, d, n, near, far, k=k, aabb_extent=200.0)
        field = lambda p: sphere_sigma(p, radius=radius - 2.0, value=0.4)  # noqa: E731
        dt = (far - near) / n
        px_l = np.asarray(jnp.exp(-jnp.sum(field(lat.positions) * lat.mask * dt, -1)))
        px_h = np.asarray(jnp.exp(-jnp.sum(field(hyb.positions) * hyb.mask * dt, -1)))
        np.testing.assert_allclose(px_h, px_l, atol=1e-5, err_msg=f"res={res}")
        # active sample sets are identical (mask-weighted t_starts agree)
        np.testing.assert_allclose(
            np.asarray(jnp.sort(hyb.t_starts * hyb.mask, axis=-1)),
            np.asarray(jnp.sort(lat.t_starts * lat.mask, axis=-1)),
            atol=1e-4,
        )


def test_hybrid_march_strided_is_superset():
    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(5), 96)
    near, far, n, k = 1400.0, 1600.0, 300, 96
    exact = march_rays_hybrid(g, o, d, n, near, far, k=k, aabb_extent=200.0)
    strided = march_rays_hybrid(
        g, o, d, n, near, far, k=k, occ_stride=2, aabb_extent=200.0
    )
    # every exact-active t must appear active in the strided variant
    for r in range(96):
        te = np.asarray(exact.t_starts[r])[np.asarray(exact.mask[r]) > 0]
        ts = set(np.round(
            np.asarray(strided.t_starts[r])[np.asarray(strided.mask[r]) > 0], 4
        ))
        missing = [t for t in np.round(te, 4) if t not in ts]
        assert not missing, (r, missing)


def test_hybrid_march_miss_rays_fully_masked():
    g = _sphere_grid(res=32)
    o = jnp.array([[200.0, 95.0, 95.0]])
    d = jnp.array([[-1.0, 0.0, 0.0]])
    m = march_rays_hybrid(g, o, d, 200, 90.0, 310.0, k=64, aabb_extent=200.0)
    assert float(m.mask.sum()) == 0.0


def test_hybrid_march_jittable_and_shapes():
    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(9), 32)
    f = jax.jit(lambda g, o, d: march_rays_hybrid(
        g, o, d, 300, 1400.0, 1600.0, k=80, occ_stride=2, aabb_extent=200.0))
    m = f(g, o, d)
    assert m.positions.shape == (32, 80, 3)
    m2 = march_rays_hybrid(
        g, o, d, 300, 1400.0, 1600.0, k=80, occ_stride=2, aabb_extent=200.0
    )
    np.testing.assert_allclose(np.asarray(m.mask), np.asarray(m2.mask))


def test_hybrid_w_cap_rule():
    # w_cap = min(n, max(k + 32, 160)): decoupled from 2*k so a jittered
    # k bump doesn't inflate the fine-probe count (fine gathers scale
    # with w_cap, not k)
    assert hybrid_w_cap(80, 300) == 160
    assert hybrid_w_cap(96, 300) == 160
    assert hybrid_w_cap(40, 300) == 160
    assert hybrid_w_cap(160, 300) == 192  # headroom once k outgrows the floor
    assert hybrid_w_cap(96, 128) == 128  # capped at the lattice


def test_choose_compact_mode_falls_back_through_chain():
    """A two-blob grid whose span exceeds both k and w_cap coverage at the
    window mode must fall through to hybrid or lattice."""
    from nerf_for_angiography_tpu.training.train import choose_compact_mode
    from nerf_for_angiography_tpu.training import TrainConfig

    g = create_grid(AABB, 64)

    def two_blobs(p):
        a = jnp.linalg.norm(p - jnp.array([0.0, 0.0, 60.0]), axis=-1) < 12.0
        b = jnp.linalg.norm(p + jnp.array([0.0, 0.0, 60.0]), axis=-1) < 12.0
        return jnp.where(a | b, 0.9, 0.0)

    g = update_grid(g, two_blobs, occ_thre=1e-4)
    # rays along z cross both blobs: active span ~180 units >> active count
    o = jnp.tile(jnp.array([[3.0, 2.0, 1500.0]]), (16, 1))
    jitter = jax.random.normal(jax.random.PRNGKey(0), (16, 3)) * 2.0
    d = jnp.array([0.0, 0.0, -1.0]) + jitter * 1e-3
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cfg = TrainConfig(
        depth_samples_per_ray=300, compact_samples=96, outside=100.0,
        grid_resolution=64, march_mode="window",
    )
    choice = choose_compact_mode(cfg, g, o, d, 1400.0, 1600.0)
    assert choice is not None
    assert choice.mode in ("hybrid", "lattice")  # window span ~270 can't fit 96
    assert choice.width <= int(0.9 * 96)
    if choice.mode == "hybrid":
        # span-sized candidate window: covers the two-blob span, bucketed
        assert choice.w_cap >= 160 and choice.w_cap % 16 == 0


def test_update_grid_pair_matches_separate_updates():
    """One shared sigma pass == two independent update_grid calls
    (bit-identical binaries and EMAs for both thresholds)."""
    from nerf_for_angiography_tpu.ops import update_grid_pair

    g = create_grid(AABB, 32)
    v = jax.tree.map(lambda x: jnp.array(x, copy=True), g)
    fn = lambda p: sphere_sigma(p, radius=30.0)  # noqa: E731
    a_sep = update_grid(g, fn, occ_thre=1e-4)
    b_sep = update_grid(v, fn, occ_thre=5e-2)
    a_pair, b_pair = update_grid_pair(g, v, fn, 1e-4, 5e-2)
    np.testing.assert_array_equal(np.asarray(a_pair.binary), np.asarray(a_sep.binary))
    np.testing.assert_array_equal(np.asarray(b_pair.binary), np.asarray(b_sep.binary))
    np.testing.assert_allclose(np.asarray(a_pair.occs), np.asarray(a_sep.occs))
    np.testing.assert_allclose(np.asarray(b_pair.occs), np.asarray(b_sep.occs))
    np.testing.assert_array_equal(
        np.asarray(a_pair.packed), np.asarray(a_sep.packed)
    )


def test_slab_updates_cover_grid_like_dense():
    """Four consecutive rotating-slab updates == one dense update when the
    EMA reduces to max-accumulation (decay=1.0): every cell is evaluated
    exactly once per rotation, at the same centers."""
    from nerf_for_angiography_tpu.ops import update_grid_pair, update_grid_pair_slab

    g = create_grid(AABB, 32)
    v = jax.tree.map(lambda x: jnp.array(x, copy=True), g)
    fn = lambda p: sphere_sigma(p, radius=30.0)  # noqa: E731
    a_dense, b_dense = update_grid_pair(g, v, fn, 1e-4, 5e-2, ema_decay=1.0)
    a, b = g, v
    for u in range(4):
        a, b = update_grid_pair_slab(
            a, b, fn, 1e-4, 5e-2, update_idx=jnp.int32(u), n_slabs=4,
            ema_decay=1.0,
        )
    np.testing.assert_allclose(np.asarray(a.occs), np.asarray(a_dense.occs))
    np.testing.assert_array_equal(np.asarray(a.binary), np.asarray(a_dense.binary))
    np.testing.assert_array_equal(np.asarray(b.binary), np.asarray(b_dense.binary))
    np.testing.assert_array_equal(np.asarray(a.packed), np.asarray(a_dense.packed))


def test_slab_update_decays_everywhere_samples_slab_only():
    """A slab update decays EVERY cell (preserving the dense update's
    empty-space prune timescale — see the deviation note in
    update_grid_pair_slab) but maxes fresh sigma in only on its slab."""
    from nerf_for_angiography_tpu.ops import update_grid_pair_slab

    g = create_grid(AABB, 32)
    g = update_grid(g, lambda p: sphere_sigma(p, radius=30.0), occ_thre=1e-4)
    v = jax.tree.map(lambda x: jnp.array(x, copy=True), g)
    one = lambda p: jnp.ones(p.shape[:-1])  # noqa: E731
    a, _ = update_grid_pair_slab(
        g, v, one, 1e-4, 5e-2, update_idx=jnp.int32(1), n_slabs=4,
        ema_decay=0.5,
    )
    occs0, occs1 = np.asarray(g.occs), np.asarray(a.occs)
    np.testing.assert_allclose(occs1[:8], occs0[:8] * 0.5)  # decayed only
    np.testing.assert_allclose(occs1[16:], occs0[16:] * 0.5)
    np.testing.assert_allclose(occs1[8:16], 1.0)  # fresh sigma maxed in


def test_every_n_step_pair_slab_warmup():
    """step < warmup_steps runs the dense update even with slabs > 1."""
    from nerf_for_angiography_tpu.ops import every_n_step_pair, update_grid_pair

    g = create_grid(AABB, 32)
    v = jax.tree.map(lambda x: jnp.array(x, copy=True), g)
    fn = lambda p: sphere_sigma(p, radius=30.0)  # noqa: E731
    a_dense, _ = update_grid_pair(g, v, fn, 1e-4, 5e-2)
    a, _ = every_n_step_pair(
        g, v, jnp.int32(16), fn, 1e-4, 5e-2, n=16, slabs=4, warmup_steps=256
    )
    np.testing.assert_allclose(np.asarray(a.occs), np.asarray(a_dense.occs))
    # past warmup: only the rotating slab moves
    a2, _ = every_n_step_pair(
        g, v, jnp.int32(512), fn, 1e-4, 5e-2, n=16, slabs=4, warmup_steps=256
    )
    occs0, occs2 = np.asarray(g.occs), np.asarray(a2.occs)
    start = (512 // 16) % 4 * 8
    moved = np.any(occs2 != occs0, axis=(1, 2))
    assert not moved[:start].any() and not moved[start + 8 :].any()


def test_update_grid_pair_jitter_stays_in_cell():
    """Jittered evaluation points (key given) stay inside each cell: a
    sigma field that is exactly the cell-index parity still binarizes
    identically, while a boundary-sensitive field sees different points
    than the exact-center pass (nerfacc anti-aliasing semantics,
    wired from the train step via TrainConfig.grid_jitter)."""
    from nerf_for_angiography_tpu.ops import update_grid_pair

    g = create_grid(AABB, 16)
    v = jax.tree.map(lambda x: jnp.array(x, copy=True), g)
    res, lo = 16, float(np.asarray(AABB)[0])
    cell = (float(np.asarray(AABB)[3]) - lo) / res

    def cell_parity_sigma(p):
        # constant within each cell -> jitter-invariant
        ix = jnp.floor((p[..., 0] - lo) / cell).astype(jnp.int32)
        return (ix % 2).astype(jnp.float32)

    a0, _ = update_grid_pair(g, v, cell_parity_sigma, 1e-4, 5e-2)
    a1, _ = update_grid_pair(
        g, v, cell_parity_sigma, 1e-4, 5e-2, key=jax.random.PRNGKey(3)
    )
    np.testing.assert_array_equal(np.asarray(a0.binary), np.asarray(a1.binary))

    seen = []

    def record_sigma(p):
        seen.append(np.asarray(p))
        return jnp.zeros(p.shape[:-1], jnp.float32)

    update_grid_pair(g, v, record_sigma, 1e-4, 5e-2, key=jax.random.PRNGKey(0))
    update_grid_pair(g, v, record_sigma, 1e-4, 5e-2)
    jittered, centers = seen
    assert not np.allclose(jittered, centers)
    # every jittered point within half a cell of its center
    assert np.abs(jittered - centers).max() <= cell / 2 + 1e-5


# ---- space-carving grid initialization (carve_feasible) ----


def test_carve_feasible_carves_white_ray_cells():
    """Cells traversed only by white (unattenuated) rays become infeasible;
    cells near a dark ray survive via the 1-cell erosion."""
    from nerf_for_angiography_tpu.ops.occupancy import carve_feasible

    res = 16
    # rays along -z through the box, a DENSE 33x33 grid of (x, y) line
    # positions (spacing ~6 < cell 12.5: every column is traversed, as in
    # a real per-pixel dataset — erosion only resurrects cells adjacent
    # to dark or untraversed ones)
    xs = jnp.linspace(-97.0, 97.0, 33)
    gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
    nr = 33 * 33
    o = jnp.stack(
        [gx.ravel(), gy.ravel(), jnp.full(nr, 1500.0)], axis=-1
    )
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (nr, 1))
    # rays through the central |x|,|y| < 25 column are dark ("the object"):
    # cells fully inside that footprint see ONLY dark rays (like interior
    # cells of a real object), so they stay un-carved; their neighbors
    # recover via the erosion; everything further out is carved.
    dark = (jnp.abs(o[:, 0]) < 25.0) & (jnp.abs(o[:, 1]) < 25.0)
    pix = jnp.where(dark, 0.5, 1.0)
    feas = carve_feasible(o, d, pix, AABB, res, 1400.0, 1600.0)
    feas = np.asarray(feas)
    # cells 6..9 span [-25, 25) at cell size 12.5: only dark lines inside
    assert feas[6:10, 6:10, :].all()
    # a white column >= 2 cells outside the dark footprint is carved
    # (x=y=80 -> cell 14, four cells from the dark block)
    assert not feas[14, 14, res // 2]
    # the mask is boolean and 3-D
    assert feas.shape == (res, res, res) and feas.dtype == bool


def test_carve_feasible_is_persistent_through_updates():
    """A carved cell must never re-occupy, whatever the EMA sees."""
    from nerf_for_angiography_tpu.ops.occupancy import carve_feasible

    res = 16
    # a >= 3-cell-wide bundle of white rays (a single ray can never carve:
    # the erosion resurrects anything adjacent to untraversed cells)
    xs = jnp.linspace(30.0, 70.0, 9)
    gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
    o = jnp.stack(
        [gx.ravel(), gy.ravel(), jnp.full(81, 1500.0)], axis=-1
    )
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (81, 1))
    pix = jnp.ones(81)
    feas = carve_feasible(o, d, pix, AABB, res, 1400.0, 1600.0)
    assert not bool(jnp.all(feas))  # something was carved

    g = create_grid(AABB, res, feasible=feas)
    np.testing.assert_array_equal(np.asarray(g.binary), np.asarray(feas))
    # a bright-everywhere field cannot resurrect carved cells
    g = update_grid(g, lambda p: jnp.full(p.shape[:-1], 0.9), occ_thre=1e-4)
    assert not np.asarray(g.binary)[~np.asarray(feas)].any()
    assert np.asarray(g.binary)[np.asarray(feas)].all()
    # feasible leaf is propagated and the packed cache agrees with binary
    np.testing.assert_array_equal(np.asarray(g.feasible), np.asarray(feas))
    carved_idx = np.argwhere(~np.asarray(feas))[0]
    cell = 200.0 / res
    pt = jnp.array(-100.0 + (carved_idx + 0.5) * cell, jnp.float32)
    assert not bool(query_occ(g, pt))


def test_carve_feasible_render_equality():
    """Carving from the rays' own pixel values never changes their render:
    every sigma > 0 sample lies in a feasible cell (interior cells are
    never white-carved; surface cells recover via the 1-cell erosion)."""
    from nerf_for_angiography_tpu.ops.occupancy import carve_feasible

    res = 32
    n_samples = 96
    # one dense parallel view (65x65 ray lines, spacing ~3 < cell 6.25 —
    # per-pixel density, as in a real dataset)
    xs = jnp.linspace(-98.0, 98.0, 65)
    gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
    n_rays = 65 * 65
    o = jnp.stack(
        [gx.ravel(), gy.ravel(), jnp.full(n_rays, 1500.0)], axis=-1
    )
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n_rays, 1))

    full = create_grid(AABB, res)
    m = march_rays(full, o, d, n_samples, 1400.0, 1600.0)
    sigma = sphere_sigma(m.positions).reshape(m.mask.shape)
    pix_full = render_xray(
        sigma, m.t_starts, mask=m.mask, dists=m.t_ends - m.t_starts
    ).pixels

    feas = carve_feasible(o, d, pix_full, AABB, res, 1400.0, 1600.0)
    carved = create_grid(AABB, res, feasible=feas)
    m2 = march_rays(carved, o, d, n_samples, 1400.0, 1600.0)
    sigma2 = sphere_sigma(m2.positions).reshape(m2.mask.shape)
    pix_carved = render_xray(
        sigma2, m2.t_starts, mask=m2.mask, dists=m2.t_ends - m2.t_starts
    ).pixels
    np.testing.assert_allclose(
        np.asarray(pix_carved), np.asarray(pix_full), atol=1e-6
    )
    # and it actually carved something (white rays exist)
    assert float(feas.mean()) < 1.0


def test_choose_compact_mode_interim_engagement():
    """With compact_engage_max set, a width above the final budget but
    inside the interim cap engages with a 32-bucketed interim k."""
    from nerf_for_angiography_tpu.training.train import (
        choose_compact_mode, compact_k_for,
    )
    from nerf_for_angiography_tpu.training import TrainConfig

    g = create_grid(AABB, 64)

    def slab(p):  # ~56-unit-thick slab -> active width ~84 of 300 samples
        return jnp.where(jnp.abs(p[..., 2]) < 28.0, 0.9, 0.0)

    g = update_grid(g, slab, occ_thre=1e-4)
    o = jnp.tile(jnp.array([[0.0, 0.0, 1500.0]]), (8, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1))
    base = dict(
        depth_samples_per_ray=300, compact_samples=48, outside=100.0,
        grid_resolution=64, march_mode="window",
        compact_engage_max=0,  # pinned: engagement is ON by default (r4)
    )
    # without interim engagement: width ~90 > 0.9*48 -> no mode fits
    cfg0 = TrainConfig(**base)
    assert choose_compact_mode(cfg0, g, o, d, 1400.0, 1600.0) is None
    # with it: engages, k on the 32-bucket interim ladder, lossless
    cfg1 = TrainConfig(**{**base, "compact_engage_max": 160})
    choice = choose_compact_mode(cfg1, g, o, d, 1400.0, 1600.0)
    assert choice is not None
    k = compact_k_for(choice.width, cfg1)
    assert k >= choice.width  # lossless cover
    assert k > cfg1.compact_samples and k % 32 == 0 and k <= 160


# ---------------------------------------------------------------------------
# two-bucket hybrid marching (march_rays_hybrid2 — span-sorted w_lo/w_cap)
# ---------------------------------------------------------------------------

from nerf_for_angiography_tpu.ops import march_rays_hybrid2  # noqa: E402
from nerf_for_angiography_tpu.ops.occupancy import MarchedRays  # noqa: E402


def test_hybrid2_equals_hybrid_when_wlo_covers():
    """With w_lo large enough to cover every lo-bucket span, the two-bucket
    march is EXACTLY the single-bucket hybrid, field for field, in the
    INPUT ray order (the inverse permutation is transparent)."""
    for res, radius in [(64, 20.0), (128, 30.0)]:
        g = create_grid(AABB, res)
        g = update_grid(g, lambda p: sphere_sigma(p, radius), occ_thre=1e-4)
        o, d = _rand_rays(jax.random.PRNGKey(res + 2), 128)
        near, far, n, k = 1400.0, 1600.0, 300, 96
        hyb = march_rays_hybrid(
            g, o, d, n, near, far, k=k, w_cap=192, aabb_extent=200.0
        )
        two = march_rays_hybrid2(
            g, o, d, n, near, far, k=k, w_lo=160, w_cap=192,
            split=0.75, aabb_extent=200.0,
        )
        # identical active sets per INPUT ray (inactive slots carry
        # window-width-dependent fill values and are excluded by design)
        np.testing.assert_allclose(
            np.asarray(two.mask), np.asarray(hyb.mask), err_msg=f"res={res}"
        )
        np.testing.assert_allclose(
            np.asarray(two.t_starts * two.mask),
            np.asarray(hyb.t_starts * hyb.mask),
            atol=1e-5, err_msg=f"t_starts res={res}",
        )
        np.testing.assert_allclose(
            np.asarray(two.positions * two.mask[..., None]),
            np.asarray(hyb.positions * hyb.mask[..., None]),
            atol=1e-4, err_msg=f"positions res={res}",
        )
        # renders match
        field = lambda p: sphere_sigma(p, radius=radius - 2.0, value=0.4)  # noqa: E731
        dt = (far - near) / n
        px_h = np.asarray(jnp.exp(-jnp.sum(field(hyb.positions) * hyb.mask * dt, -1)))
        px_2 = np.asarray(jnp.exp(-jnp.sum(field(two.positions) * two.mask * dt, -1)))
        np.testing.assert_allclose(px_2, px_h, atol=1e-5, err_msg=f"res={res}")


def test_hybrid2_small_wlo_truncates_only_actives_subset():
    """An undersized w_lo may drop active samples of narrow rays, but every
    sample the two-bucket march keeps must be active in the single-bucket
    hybrid (no false actives, no resampled positions)."""
    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(11), 96)
    near, far, n, k = 1400.0, 1600.0, 300, 96
    hyb = march_rays_hybrid(g, o, d, n, near, far, k=k, aabb_extent=200.0)
    two = march_rays_hybrid2(
        g, o, d, n, near, far, k=k, w_lo=48, w_cap=160,
        split=0.75, aabb_extent=200.0,
    )
    for r in range(o.shape[0]):
        th = set(np.round(
            np.asarray(hyb.t_starts[r])[np.asarray(hyb.mask[r]) > 0], 4
        ))
        tt = np.round(
            np.asarray(two.t_starts[r])[np.asarray(two.mask[r]) > 0], 4
        )
        extra = [t for t in tt if t not in th]
        assert not extra, (r, extra)


def test_hybrid2_jittable_and_matches_eager():
    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(13), 64)
    f = jax.jit(lambda g, o, d: march_rays_hybrid2(
        g, o, d, 300, 1400.0, 1600.0, k=80, w_lo=96, w_cap=160,
        split=0.75, occ_stride=2, aabb_extent=200.0,
    ))
    m = f(g, o, d)
    assert m.positions.shape == (64, 80, 3)
    m2 = march_rays_hybrid2(
        g, o, d, 300, 1400.0, 1600.0, k=80, w_lo=96, w_cap=160,
        split=0.75, occ_stride=2, aabb_extent=200.0,
    )
    np.testing.assert_allclose(np.asarray(m.mask), np.asarray(m2.mask))
    np.testing.assert_allclose(
        np.asarray(m.t_starts), np.asarray(m2.t_starts), atol=1e-5
    )


def test_hybrid2_degenerate_falls_back():
    """R < 2, w_lo >= w_cap, or a degenerate split fall back to the
    single-bucket hybrid rather than building empty buckets."""
    g = _sphere_grid(res=32)
    o, d = _rand_rays(jax.random.PRNGKey(17), 1)
    m1 = march_rays_hybrid2(
        g, o, d, 200, 1400.0, 1600.0, k=64, w_lo=48, w_cap=160,
        split=0.75, aabb_extent=200.0,
    )
    h1 = march_rays_hybrid(
        g, o, d, 200, 1400.0, 1600.0, k=64, w_cap=160, aabb_extent=200.0
    )
    np.testing.assert_allclose(np.asarray(m1.mask), np.asarray(h1.mask))
    o2, d2 = _rand_rays(jax.random.PRNGKey(19), 16)
    m2 = march_rays_hybrid2(
        g, o2, d2, 200, 1400.0, 1600.0, k=64, w_lo=160, w_cap=160,
        split=0.75, aabb_extent=200.0,
    )
    h2 = march_rays_hybrid(
        g, o2, d2, 200, 1400.0, 1600.0, k=64, w_cap=160, aabb_extent=200.0
    )
    np.testing.assert_allclose(np.asarray(m2.mask), np.asarray(h2.mask))


def test_hybrid_w_lo_for_rule():
    from nerf_for_angiography_tpu.training.train import hybrid_w_lo_for

    assert hybrid_w_lo_for(30, 160) == 48   # ceil16(30)+16
    assert hybrid_w_lo_for(0, 160) == 32    # floor
    assert hybrid_w_lo_for(150, 160) == 160  # capped (caller disables)
    assert hybrid_w_lo_for(64, 160) == 80


def test_choose_compact_mode_reports_w_lo():
    """With hybrid_split > 0 the chooser sizes the lo window from the
    hit-ray span quantile; without it w_lo stays 0."""
    from nerf_for_angiography_tpu.training.config import TrainConfig
    from nerf_for_angiography_tpu.training.train import choose_compact_mode

    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(23), 512)
    base = dict(
        depth_samples_per_ray=300, compact_samples=128, outside=100.0,
        grid_resolution=64, march_mode="hybrid",
    )
    # hybrid_split pinned to 0 (the split is the r4 DEFAULT; this test
    # checks the single-bucket chooser output)
    c0 = choose_compact_mode(
        TrainConfig(**base, hybrid_split=0.0), g, o, d, 1400.0, 1600.0
    )
    assert c0 is not None and c0.mode == "hybrid" and c0.w_lo == 0
    c1 = choose_compact_mode(
        TrainConfig(**base, hybrid_split=0.75), g, o, d, 1400.0, 1600.0
    )
    assert c1 is not None and c1.mode == "hybrid"
    # a sphere's spans are fairly uniform: the quantile-sized lo window
    # may or may not clear the cap; either w_lo == 0 (disabled) or a
    # 16-bucketed width strictly inside the cap
    assert c1.w_lo == 0 or (32 <= c1.w_lo < c1.w_cap and c1.w_lo % 16 == 0)


# ---------------------------------------------------------------------------
# per-bucket-k two-bucket marching (march_rays_hybrid2k — the narrow
# bucket feeds k_lo < k samples/ray to the MLP)
# ---------------------------------------------------------------------------

from nerf_for_angiography_tpu.ops import (  # noqa: E402
    BucketedRays,
    march_rays_hybrid2k,
)


def _bucket_render(two: BucketedRays, field, dt):
    comp = lambda m: jnp.exp(-jnp.sum(field(m.positions) * m.mask * dt, -1))  # noqa: E731
    return jnp.take(
        jnp.concatenate([comp(two.lo), comp(two.hi)]), two.inv, axis=0
    )


def test_hybrid2k_lossless_render_matches_hybrid():
    """With k_lo sized to the measured active-count max of the batch (and
    w_lo covering every span), the per-bucket-k march renders EXACTLY like
    the single-bucket hybrid in the INPUT ray order — the buckets and the
    inverse permutation are transparent."""
    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(29), 128)
    near, far, n, k = 1400.0, 1600.0, 300, 128
    hyb = march_rays_hybrid(
        g, o, d, n, near, far, k=k, w_cap=192, aabb_extent=200.0
    )
    ac = int(np.asarray(hyb.mask.sum(-1)).max())
    k_lo = ((ac + 7) // 8) * 8
    assert k_lo < k  # genuinely smaller lo bucket, else the test is vacuous
    two = march_rays_hybrid2k(
        g, o, d, n, near, far, k=k, k_lo=k_lo, w_lo=160, w_cap=192,
        split=0.75, aabb_extent=200.0,
    )
    assert isinstance(two, BucketedRays)
    assert two.lo.positions.shape[1] == k_lo
    assert two.hi.positions.shape[1] == k
    field = lambda p: sphere_sigma(p, radius=28.0, value=0.4)  # noqa: E731
    dt = (far - near) / n
    px2 = np.asarray(_bucket_render(two, field, dt))
    pxh = np.asarray(jnp.exp(-jnp.sum(field(hyb.positions) * hyb.mask * dt, -1)))
    np.testing.assert_allclose(px2, pxh, atol=1e-5)


def test_hybrid2k_small_klo_truncates_only_actives_subset():
    """An undersized (k_lo, w_lo) may drop active samples of narrow rays,
    but every sample either bucket keeps must be active in the single-bucket
    hybrid for the SAME input ray (no false actives, no resampled
    positions) — the inv mapping routes each input ray to its bucket row."""
    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(31), 96)
    near, far, n, k = 1400.0, 1600.0, 300, 96
    hyb = march_rays_hybrid(g, o, d, n, near, far, k=k, aabb_extent=200.0)
    two = march_rays_hybrid2k(
        g, o, d, n, near, far, k=k, k_lo=24, w_lo=64, w_cap=160,
        split=0.75, aabb_extent=200.0,
    )
    assert isinstance(two, BucketedRays)
    n_lo = two.lo.mask.shape[0]
    inv = np.asarray(two.inv)
    for i in range(o.shape[0]):
        row = int(inv[i])
        mb = two.lo if row < n_lo else two.hi
        r = row if row < n_lo else row - n_lo
        th = set(np.round(
            np.asarray(hyb.t_starts[i])[np.asarray(hyb.mask[i]) > 0], 4
        ))
        tt = np.round(
            np.asarray(mb.t_starts[r])[np.asarray(mb.mask[r]) > 0], 4
        )
        extra = [t for t in tt if t not in th]
        assert not extra, (i, extra)


def test_hybrid2k_fallbacks():
    """k_lo >= k falls back to the single-k two-bucket march; a degenerate
    batch falls back to the plain hybrid — both as STATIC MarchedRays so
    callers branch on the return type at trace time."""
    g = _sphere_grid(res=32)
    o, d = _rand_rays(jax.random.PRNGKey(37), 32)
    m1 = march_rays_hybrid2k(
        g, o, d, 200, 1400.0, 1600.0, k=64, k_lo=64, w_lo=64, w_cap=160,
        split=0.75, aabb_extent=200.0,
    )
    assert isinstance(m1, MarchedRays)
    m2 = march_rays_hybrid2(
        g, o, d, 200, 1400.0, 1600.0, k=64, w_lo=64, w_cap=160,
        split=0.75, aabb_extent=200.0,
    )
    np.testing.assert_allclose(np.asarray(m1.mask), np.asarray(m2.mask))
    o1, d1 = _rand_rays(jax.random.PRNGKey(41), 1)
    m3 = march_rays_hybrid2k(
        g, o1, d1, 200, 1400.0, 1600.0, k=64, k_lo=32, w_lo=64, w_cap=160,
        split=0.75, aabb_extent=200.0,
    )
    assert isinstance(m3, MarchedRays)
    h3 = march_rays_hybrid(
        g, o1, d1, 200, 1400.0, 1600.0, k=64, w_cap=160, aabb_extent=200.0
    )
    np.testing.assert_allclose(np.asarray(m3.mask), np.asarray(h3.mask))


def test_compact_k_lo_for_rule():
    from nerf_for_angiography_tpu.training.config import TrainConfig
    from nerf_for_angiography_tpu.training.train import compact_k_lo_for

    cfg = TrainConfig()  # compact_k_margin = 1.15
    assert compact_k_lo_for(0, 96, cfg) == 0    # no lo bucket measured
    assert compact_k_lo_for(40, 96, cfg) == 48  # ceil8(40 * 1.15)
    assert compact_k_lo_for(4, 96, cfg) == 16   # floor
    assert compact_k_lo_for(90, 96, cfg) == 0   # would reach k: disabled


def test_choose_compact_mode_reports_width_lo():
    """With hybrid_bucket_k the chooser also measures the lo-bucket active
    width (bounded by both w_lo and the global width); without the knob
    width_lo stays 0."""
    from nerf_for_angiography_tpu.training.config import TrainConfig
    from nerf_for_angiography_tpu.training.train import choose_compact_mode

    g = _sphere_grid(res=64)
    o, d = _rand_rays(jax.random.PRNGKey(43), 512)
    base = dict(
        depth_samples_per_ray=300, compact_samples=128, outside=100.0,
        grid_resolution=64, march_mode="hybrid",
    )
    # bucket_k pinned OFF for c0 (it is the r4 default)
    c0 = choose_compact_mode(
        TrainConfig(**base, hybrid_split=0.75, hybrid_bucket_k=False),
        g, o, d, 1400.0, 1600.0,
    )
    assert c0 is not None and c0.width_lo == 0
    c1 = choose_compact_mode(
        TrainConfig(**base, hybrid_split=0.75, hybrid_bucket_k=True),
        g, o, d, 1400.0, 1600.0,
    )
    assert c1 is not None
    if c1.w_lo:
        assert 0 < c1.width_lo <= min(c1.w_lo, c1.width)
    else:
        assert c1.width_lo == 0


def test_chooser_prefers_bucketk_hybrid_over_window(monkeypatch):
    """With hybrid_bucket_k engaged, the chooser overrides the chain's
    window preference when the bucketed MLP point count undercuts the
    window's k by more than the hybrid-march overhead margin (32
    samples/ray, measured — see MFU.md); window is kept when bucket-k is
    off or the lo bucket degenerates."""
    import importlib

    tr = importlib.import_module("nerf_for_angiography_tpu.training.train")
    from nerf_for_angiography_tpu.training.config import TrainConfig

    g = _sphere_grid(res=32)  # stats are monkeypatched; grid is a prop
    o, d = _rand_rays(jax.random.PRNGKey(47), 8)
    base = dict(
        depth_samples_per_ray=300, compact_samples=96, outside=100.0,
        grid_resolution=32, march_mode="window", compact_engage_max=192,
    )
    # (ac, span, win_w, span_q, ac_lo): window fits at win_w=128 ->
    # k_win=160 (interim ladder); hybrid ac=70 -> k=88; lo bucket
    # ac_lo=38 -> k_lo=48; k_eff = 0.75*48 + 0.25*88 = 58 <= 160-32
    monkeypatch.setattr(
        tr, "_chooser_stats", lambda *a, **k: (70, 112, 128, 40, 38)
    )
    c_off = tr.choose_compact_mode(
        TrainConfig(**base, hybrid_split=0.75, hybrid_bucket_k=False),
        g, o, d, 1400.0, 1600.0,
    )
    assert c_off is not None and c_off.mode == "window"
    c_on = tr.choose_compact_mode(
        TrainConfig(**base, hybrid_split=0.75, hybrid_bucket_k=True),
        g, o, d, 1400.0, 1600.0,
    )
    assert c_on is not None and c_on.mode == "hybrid"
    assert c_on.width_lo == 38 and c_on.w_lo > 0
    # degenerate lo bucket (span quantile reaches w_cap -> w_lo disabled,
    # no bucket-k advantage to weigh) -> window
    monkeypatch.setattr(
        tr, "_chooser_stats", lambda *a, **k: (70, 112, 128, 150, 70)
    )
    c_deg = tr.choose_compact_mode(
        TrainConfig(**base, hybrid_split=0.75, hybrid_bucket_k=True),
        g, o, d, 1400.0, 1600.0,
    )
    assert c_deg is not None and c_deg.mode == "window"
    # window advantage too small (win_w close to the hybrid k_eff):
    # keep window
    monkeypatch.setattr(
        tr, "_chooser_stats", lambda *a, **k: (70, 112, 80, 40, 60)
    )
    c_close = tr.choose_compact_mode(
        TrainConfig(**base, hybrid_split=0.75, hybrid_bucket_k=True),
        g, o, d, 1400.0, 1600.0,
    )
    assert c_close is not None and c_close.mode == "window"
