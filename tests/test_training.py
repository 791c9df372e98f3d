"""Training runtime tests: one jitted step, end-to-end micro-train, early
stop, checkpoint round-trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_for_angiography_tpu.data import (
    DatagenConfig,
    generate_dataset,
    make_sphere_volume,
    make_vessel_volume,
)
from nerf_for_angiography_tpu.training import (
    TrainConfig,
    create_train_state,
    load_grid_vtk,
    load_model,
    make_eval_step,
    make_test_view,
    make_train_step,
    save_grid_vtk,
    save_model,
    train,
)


def tiny_cfg(**kw):
    defaults = dict(
        depth_samples_per_ray=32,
        sample_size=12,
        grid_resolution=8,
        outside=100.0,
        display_every=50,
        n_iters=150,
        early_stop_iters=10_000,
        coarse_lr=5e-3,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


@pytest.fixture(scope="module")
def sphere_data():
    vol = make_sphere_volume(res=48, extent=75.0, radius=30.0, mu=0.02)
    cfg = DatagenConfig(
        limited_size=90.0, number_angles=2.0, img_width=24, img_height=24,
        sample_outside=100.0, stratified_depths=False,
    )
    return generate_dataset(vol, cfg)


def test_single_train_step_runs_and_updates(sphere_data):
    cfg = tiny_cfg()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, near=1400.0, far=1600.0)
    p0 = jax.tree.map(np.array, state.params)
    state, metrics, pred, tgt = step(state, sphere_data.rays)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss/train-pixel-coarse"]))
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p0, jax.tree.map(np.array, state.params),
    )
    assert max(jax.tree.leaves(diffs)) > 0  # params moved


def test_eval_step_psnr_finite(sphere_data):
    cfg = tiny_cfg()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    n_views = int(np.asarray(sphere_data.rays.image_ids).max()) + 1
    rpv = sphere_data.rays.num_rays // n_views
    test = make_test_view(sphere_data.rays, n_views - 1, rpv)
    ev = make_eval_step(model, cfg, 1400.0, 1600.0)
    metrics, pixels = ev(state, test)
    assert np.isfinite(float(metrics["psnr/test-coarse"]))
    assert pixels.shape == (rpv,)


def test_end_to_end_micro_train_psnr_rises(sphere_data):
    """The SURVEY.md §7 minimum slice: PSNR on the held-out view must rise
    substantially within a couple hundred iterations."""
    cfg = tiny_cfg(n_iters=150, depth_samples_per_ray=48, sample_size=16)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    n_views = int(np.asarray(sphere_data.rays.image_ids).max()) + 1
    rpv = sphere_data.rays.num_rays // n_views
    test = make_test_view(sphere_data.rays, n_views - 1, rpv)
    ev = make_eval_step(model, cfg, 1400.0, 1600.0)
    psnr_before = float(ev(state, test)[0]["psnr/test-coarse"])

    result = train(
        cfg, sphere_data.rays, src_pt_z=1500.0, log_dir=None, verbose=False
    )
    psnr_after = result.last_psnr
    assert psnr_after > psnr_before + 5.0, (psnr_before, psnr_after)
    assert psnr_after > 15.0
    # the shipped-model (best-checkpoint) held-out PSNR is recorded and
    # refers to the best_iter eval (run_nerf_acc.py:376-385 semantics)
    assert np.isfinite(result.best_heldout_psnr)
    assert result.best_heldout_psnr > 15.0
    assert result.rays_per_sec > 0


def test_early_stop(sphere_data, monkeypatch):
    """Training stops once no eval improves for early_stop_iters
    (run_nerf_acc.py:434-440). Force a decreasing PSNR sequence."""
    from nerf_for_angiography_tpu.training import loop as loop_mod

    def fake_make_eval_step(model, cfg, near, far):
        counter = {"n": 0}

        def ev(state, test):
            counter["n"] += 1
            psnr = 30.0 - counter["n"]  # strictly decreasing -> no new best
            z = jnp.zeros(test.pixel_values.shape)
            return {
                "loss/test-pixel-coarse": jnp.float32(0.1),
                "psnr/test-coarse": jnp.float32(psnr),
                "psnr/vessel-test-coarse": jnp.float32(psnr),
            }, z

        return ev

    monkeypatch.setattr(loop_mod, "make_eval_step", fake_make_eval_step)
    cfg = tiny_cfg(n_iters=100_000, early_stop_iters=40, display_every=20)
    result = train(cfg, sphere_data.rays, src_pt_z=1500.0, verbose=False)
    # best set at first eval (iter 0 is excluded; iter 20 becomes best) and
    # never beaten -> stop at iter 60
    assert result.iters_run <= 120


def test_train_with_artifacts(tmp_path, sphere_data):
    cfg = tiny_cfg(n_iters=100, display_every=50)
    log_dir = str(tmp_path / "run")
    os.makedirs(log_dir)
    result = train(cfg, sphere_data.rays, src_pt_z=1500.0, log_dir=log_dir, verbose=False)
    assert os.path.exists(os.path.join(log_dir, "coarsegrid.vtk"))
    assert os.path.exists(os.path.join(log_dir, "coarsevesselgrid.vtk"))
    assert os.path.exists(os.path.join(log_dir, "highmodel.npz"))
    assert os.path.exists(os.path.join(log_dir, "readme.txt"))
    assert result.page_data["Model architecture"] == "4x128"

    meta, params = load_model(os.path.join(log_dir, "highmodel.npz"))
    assert meta["parameters"]["num_filters"] == 128
    # loaded params numerically match state
    got = np.asarray(params["params"]["output_linear"]["kernel"])
    want = np.asarray(result.state.params["params"]["output_linear"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-6)

    # wall-clock phase accounting (the QUALITY.md driver-overhead
    # breakdown): the phases must cover the run — 'other' is the residual
    # and a large value there means a phase went untracked
    tm = result.timing
    for key in ("step_dense", "step_compact", "compile", "eval", "choose",
                "log", "export", "other", "total"):
        assert key in tm, key
    tracked = sum(tm[k] for k in ("step_dense", "step_compact", "compile",
                                  "eval", "choose", "log", "export"))
    assert tm["total"] >= tracked - 1e-6
    assert tm["other"] <= 0.25 * tm["total"] + 0.5


def test_compact_k_for_margin():
    """compact_k_for applies compact_k_margin and rounds up to 8."""
    from nerf_for_angiography_tpu.training.train import compact_k_for

    cfg = tiny_cfg(compact_samples=96)
    assert compact_k_for(70, cfg) == 88  # ceil(70*1.15/8)*8
    cfg_nomargin = tiny_cfg(compact_samples=96, compact_k_margin=1.0)
    assert compact_k_for(70, cfg_nomargin) == 72  # ceil(70/8)*8
    # the interim ladder buckets by 32 and honors the margin too
    cfg_engage = tiny_cfg(
        compact_samples=96, compact_engage_max=192, compact_k_margin=1.0
    )
    assert compact_k_for(150, cfg_engage) == 160


def test_grid_vtk_roundtrip(tmp_path, sphere_data):
    cfg = tiny_cfg(n_iters=40, display_every=20)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, 1400.0, 1600.0)
    for _ in range(20):
        state, *_ = step(state, sphere_data.rays)
    p = str(tmp_path / "grid.vtk")
    save_grid_vtk(p, state.grid)
    restored = load_grid_vtk(p, np.asarray(state.grid.aabb))
    np.testing.assert_array_equal(
        np.asarray(restored.binary), np.asarray(state.grid.binary)
    )


def test_barf_training_step(sphere_data):
    cfg = tiny_cfg(pos_enc="barf", pos_enc_basis=4, barf_start=0, barf_stop=100)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, 1400.0, 1600.0)
    state, metrics, *_ = step(state, sphere_data.rays)
    assert np.isfinite(float(metrics["loss/train-pixel-coarse"]))


def test_classic_hierarchical_training(sphere_data):
    """Coarse + hierarchical-fine (classic NeRF path) learns the sphere."""
    from nerf_for_angiography_tpu.training.classic import (
        create_classic_state,
        make_classic_train_step,
    )

    cfg = tiny_cfg(coarse_lr=5e-3, depth_samples_per_ray=48)
    model, state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    cstate = create_classic_state(model, state0.params, cfg, jax.random.PRNGKey(1))
    step = make_classic_train_step(model, cfg, 1400.0, 1600.0, n_fine=16)

    losses = []
    for _ in range(40):
        cstate, metrics = step(cstate, sphere_data.rays)
        losses.append(float(metrics["loss/train-pixel-fine"]))
    assert losses[-1] < losses[0] * 0.5
    assert np.isfinite(losses[-1])


def test_classic_separate_fine_model(sphere_data):
    from nerf_for_angiography_tpu.models import init_cppn
    from nerf_for_angiography_tpu.training.classic import (
        create_classic_state,
        make_classic_train_step,
    )

    cfg = tiny_cfg(depth_samples_per_ray=32)
    model, state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    fine_model, fine_params = init_cppn(cfg.model_config(), jax.random.PRNGKey(7))
    fine_params0 = jax.tree.map(np.array, fine_params)  # donated below
    cstate = create_classic_state(
        model, state0.params, cfg, jax.random.PRNGKey(1), fine_params=fine_params
    )
    step = make_classic_train_step(
        model, cfg, 1400.0, 1600.0, n_fine=8, fine_model=fine_model
    )
    cstate, metrics = step(cstate, sphere_data.rays)
    assert np.isfinite(float(metrics["loss/train-pixel-fine"]))
    # fine params actually updated independently
    d = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        cstate.fine_params, fine_params0,
    )
    assert max(jax.tree.leaves(d)) > 0


def test_image_mode_sampling_step(sphere_data):
    n_views = int(np.asarray(sphere_data.rays.image_ids).max()) + 1
    rpv = sphere_data.rays.num_rays // n_views
    cfg = tiny_cfg(sample_mode="image", sample_size=8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(
        model, cfg, 1400.0, 1600.0, num_images=n_views, rays_per_image=rpv
    )
    state, metrics, *_ = step(state, sphere_data.rays)
    assert np.isfinite(float(metrics["loss/train-pixel-coarse"]))


def test_checkpoint_resume(tmp_path, sphere_data):
    """Kill training mid-way; a second train() call resumes from the orbax
    checkpoint instead of starting over."""
    log_dir = str(tmp_path / "run")
    os.makedirs(log_dir)
    cfg = tiny_cfg(n_iters=40, display_every=20)
    train(
        cfg, sphere_data.rays, src_pt_z=1500.0, log_dir=log_dir,
        verbose=False, checkpoint_every=20,
    )
    # second run with more iters resumes at >= 20
    cfg2 = tiny_cfg(n_iters=60, display_every=20)
    result = train(
        cfg2, sphere_data.rays, src_pt_z=1500.0, log_dir=log_dir,
        verbose=False, checkpoint_every=20,
    )
    assert int(np.asarray(result.state.step)) >= 60
    # resumed (didn't redo all 60 iters): iters_run counts from resume point
    assert result.iters_run == 60


def test_profiling_utils(tmp_path):
    from nerf_for_angiography_tpu.utils.profiling import StepTimer, debug_nans

    t = StepTimer()
    t.start()
    t.stop()
    assert t.avg_s > 0
    assert "Time for iteration 5" in t.iteration_line(5)
    assert t.rays_per_sec(100) > 0

    with debug_nans(True):
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()


def test_train_chunk_matches_single_steps(sphere_data):
    """A scan of k steps == k individual steps (same seeds)."""
    from nerf_for_angiography_tpu.training.train import make_train_chunk

    cfg = tiny_cfg()
    model, s_a = create_train_state(cfg, jax.random.PRNGKey(0))
    _, s_b = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, 1400.0, 1600.0)
    chunk = make_train_chunk(model, cfg, 1400.0, 1600.0, steps_per_call=5)

    losses_a = []
    for _ in range(5):
        s_a, m, _, _ = step(s_a, sphere_data.rays)
        losses_a.append(float(m["loss/train-pixel-coarse"]))
    s_b, ms, pred, tgt = chunk(s_b, sphere_data.rays)
    losses_b = [float(x) for x in np.asarray(ms["loss/train-pixel-coarse"])]
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-4)
    assert int(s_b.step) == 5
    assert pred.shape == (cfg.img_sample_size,)


def test_auto_compaction_switch(sphere_data, capsys):
    """The loop switches to the compacted stepper once the grid has pruned
    (injected here — real pruning takes thousands of iters), and training
    continues to improve."""
    from nerf_for_angiography_tpu.ops.occupancy import update_grid

    cfg = tiny_cfg(
        n_iters=100, display_every=25, compact_samples=24,
        grid_resolution=16, coarse_lr=5e-3, grid_update_every=100_000,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))

    def sphere_sigma(points, radius=35.0):
        return jnp.where(jnp.linalg.norm(points, axis=-1) < radius, 0.9, 0.0)

    pruned = update_grid(state.grid, sphere_sigma, occ_thre=1e-4)
    # step=1 keeps the (step %% n == 0) grid update from refilling the
    # injected pruned grid with the untrained model's sigma
    state = state._replace(
        grid=pruned,
        vessel_grid=jax.tree.map(lambda x: jnp.array(x, copy=True), pruned),
        step=jnp.int32(1),
    )
    result = train(
        cfg, sphere_data.rays, src_pt_z=1500.0, verbose=True,
        initial_state=state,
    )
    out = capsys.readouterr().out
    assert "switching to compacted stepper" in out
    assert np.isfinite(result.last_psnr)


@pytest.mark.slow
def test_pose_refinement_recovers_translation():
    """Marked slow (260 s measured r5: 900 training iterations on the
    1-core host; the 600-iter trim was probed in round 4 and fails
    recovery). Pose-refinement WIRING stays fast-lane-covered by
    test_pose_refinement_wiring below.

    Per-view learnable camera translations recover a known injected
    world-space pose error (the reference declares per-image translation
    params at model/CPPN.py:133-135 but never consumes them; here they are
    first-class): dataset rays come from the NOMINAL cameras while pixels
    are rendered by translated cameras (translation enters cam2world
    additively with unchanged rotation, geometry/pose.py::source_matrix).

    Observability: the photometric loss constrains each camera only in its
    IMAGE PLANE — an along-ray translation changes magnification by
    ~t/src_distance (~0.3% here, invisible at 24px), and a global world
    translation is a gauge freedom shared with the field. So recovery is
    asserted on per-view in-plane residuals after solving for the best
    global gauge translation (the standard camera-opt evaluation, cf. BARF
    test-time pose alignment)."""
    from nerf_for_angiography_tpu.data import make_vessel_volume

    vol = make_vessel_volume(res=48)
    dcfg = DatagenConfig(
        limited_size=90.0, number_angles=1.0, img_width=24, img_height=24,
        sample_outside=100.0, stratified_depths=False,
        max_shift_translation=0.05, rays_from_nominal=True,
    )
    ds = generate_dataset(vol, dcfg, key=jax.random.PRNGKey(5))
    gt = np.stack(
        [
            np.asarray(ds.proj[c])
            for c in ("translation_x", "translation_y", "translation_z")
        ],
        axis=-1,
    )  # (V, 3); last (test) view is zero by construction
    n_views = gt.shape[0]
    assert np.abs(gt[:-1]).max() > 1.0  # the injection actually happened

    # per-view in-plane projector from the central ray direction
    per = dcfg.img_width * dcfg.img_height
    dirs = np.asarray(ds.rays.directions).reshape(n_views, per, 3)
    d_c = dirs[:, (dcfg.img_height // 2) * dcfg.img_width + dcfg.img_width // 2]
    d_c = d_c / np.linalg.norm(d_c, axis=-1, keepdims=True)
    proj = np.eye(3)[None] - d_c[:, :, None] * d_c[:, None, :]  # (V, 3, 3)

    def inplane_residuals(learned):
        r = learned - gt  # (V, 3)
        rhs = np.einsum("vij,vj->vi", proj, r)
        g, *_ = np.linalg.lstsq(
            proj.reshape(-1, 3), rhs.reshape(-1), rcond=None
        )  # best global gauge translation
        e = np.einsum("vij,vj->vi", proj, r - g[None])
        return np.linalg.norm(e, axis=-1)

    cfg = tiny_cfg(
        pose_refine=True, pose_lr=3e-2, pose_start=200, n_iters=900,
        grid_update_every=100_000,  # keep the all-occupied grid: isolate pose
        coarse_lr=2e-3, sample_size=24,  # 576-ray batches (of 2880 total)
    )
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), num_views=n_views
    )
    assert state.params["params"]["view_shifts"].shape == (n_views, 3)
    step = make_train_step(model, cfg, near=1400.0, far=1600.0)
    for _ in range(cfg.n_iters):
        state, metrics, _, _ = step(state, ds.rays)

    learned = np.asarray(state.params["params"]["view_shifts"])
    e0 = inplane_residuals(np.zeros_like(gt))  # error with zero correction
    e = inplane_residuals(learned)
    assert e.mean() < 0.4 * e0.mean(), f"aligned in-plane {e} vs initial {e0}"
    assert (e < 0.8 * e0 + 0.05).all(), f"aligned in-plane {e} vs initial {e0}"
    assert np.isfinite(float(metrics["loss/train-pixel-coarse"]))


def test_pose_refinement_wiring():
    """Fast-lane wiring coverage for pose_refine (the full 900-iter
    recovery assertion is the slow test above): view_shifts params exist
    per view, stay EXACTLY zero through the pose_start curriculum, move
    once it lifts, and the loss stays finite."""
    from nerf_for_angiography_tpu.data import make_sphere_volume

    vol = make_sphere_volume(res=16)
    dcfg = DatagenConfig(
        limited_size=90.0, number_angles=1.0, img_width=10, img_height=10,
        sample_outside=100.0, stratified_depths=False,
        max_shift_translation=0.05, rays_from_nominal=True,
    )
    ds = generate_dataset(vol, dcfg, key=jax.random.PRNGKey(5))
    n_views = int(np.asarray(ds.rays.image_ids).max()) + 1

    cfg = tiny_cfg(
        pose_refine=True, pose_lr=3e-2, pose_start=10, n_iters=30,
        grid_update_every=100_000, sample_size=8,
    )
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), num_views=n_views
    )
    assert state.params["params"]["view_shifts"].shape == (n_views, 3)
    step = make_train_step(model, cfg, near=1400.0, far=1600.0)
    for i in range(30):
        state, metrics, _, _ = step(state, ds.rays)
        if i + 1 == cfg.pose_start - 1:
            frozen = np.asarray(state.params["params"]["view_shifts"])
            assert (frozen == 0).all(), "shifts moved before pose_start"
    moved = np.asarray(state.params["params"]["view_shifts"])
    assert np.abs(moved).max() > 0, "shifts never moved after pose_start"
    assert np.isfinite(float(metrics["loss/train-pixel-coarse"]))


def test_classic_viewdirs_barf_training(sphere_data):
    """View-direction branch + BARF: both alphas anneal on the shared
    schedule (the reference's CPPN.py:236-242 supports the views alpha but
    run_nerf_acc.py:268-272 only ever steps 'pts' — wired end-to-end here)
    and the two-head model (rgb/alpha, CPPN.py:120-131) still learns the
    X-ray phantom through its density head."""
    from nerf_for_angiography_tpu.training.classic import (
        create_classic_state,
        make_classic_train_step,
    )

    cfg = tiny_cfg(
        coarse_lr=5e-3, depth_samples_per_ray=48,
        num_input_channels_views=3, pos_enc="barf", pos_enc_basis=4,
        barf_start=0, barf_stop=30,
    )
    mc = cfg.model_config()
    assert mc.use_viewdirs and mc.num_output_channels == 2
    model, state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    cstate = create_classic_state(model, state0.params, cfg, jax.random.PRNGKey(1))
    step = make_classic_train_step(model, cfg, 1400.0, 1600.0, n_fine=16)

    losses, alphas, alphas_v = [], [], []
    for _ in range(40):
        cstate, metrics = step(cstate, sphere_data.rays)
        losses.append(float(metrics["loss/train-pixel-fine"]))
        alphas.append(float(metrics["barf-coarse"]))
        alphas_v.append(float(metrics["barf-views-coarse"]))
    assert losses[-1] < losses[0] * 0.5
    assert np.isfinite(losses[-1])
    # both schedules ramp from 0 to their basis by barf_stop=30 < 40 steps
    assert alphas[0] < 1.0 and alphas[-1] == cfg.pos_enc_basis
    assert alphas_v[0] < 1.0 and alphas_v[-1] == cfg.pos_enc_basis_views


def test_compacted_stepper_reverts_to_dense(sphere_data, capsys, monkeypatch):
    """If the evolved grid stops fitting any compacted mode, the loop must
    revert to the dense stepper instead of silently truncating."""
    import importlib

    from nerf_for_angiography_tpu.ops.occupancy import update_grid
    from nerf_for_angiography_tpu.training import loop as loop_mod

    # training.train the MODULE (the package re-exports train() the function
    # under the same name)
    train_mod = importlib.import_module("nerf_for_angiography_tpu.training.train")

    calls = {"n": 0}
    real_choose = train_mod.choose_compact_mode

    def flaky_choose(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return real_choose(*a, **kw)  # engage normally
        return None  # then: nothing fits any more

    monkeypatch.setattr(loop_mod, "choose_compact_mode", flaky_choose, raising=False)
    # loop imports inside the function body -> patch the source module
    monkeypatch.setattr(train_mod, "choose_compact_mode", flaky_choose)

    cfg = tiny_cfg(
        n_iters=100, display_every=25, compact_samples=24,
        grid_resolution=16, coarse_lr=5e-3, grid_update_every=100_000,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))

    def sphere_sigma(points, radius=35.0):
        return jnp.where(jnp.linalg.norm(points, axis=-1) < radius, 0.9, 0.0)

    pruned = update_grid(state.grid, sphere_sigma, occ_thre=1e-4)
    state = state._replace(
        grid=pruned,
        vessel_grid=jax.tree.map(lambda x: jnp.array(x, copy=True), pruned),
        step=jnp.int32(1),
    )
    result = train(
        cfg, sphere_data.rays, src_pt_z=1500.0, verbose=True,
        initial_state=state,
    )
    out = capsys.readouterr().out
    assert "switching to compacted stepper" in out
    assert "reverting to dense stepper" in out
    assert np.isfinite(result.last_psnr)


def test_carve_init_engages_compaction_immediately(sphere_data, capsys):
    """With space-carving init (carve_init) the occupancy grid starts at
    the visual hull, so the compacted stepper engages at the FIRST
    readiness check (iter 0) instead of after the ~3-4k-iteration EMA
    prune; the interim ladder (compact_engage_max) lets it engage with a
    32-bucketed k above the configured budget. Training stays finite."""
    # a SPARSE structure (vessel phantom) with enough views that the white
    # rays' union covers the box (26 views, box matched to the 48px beam:
    # measured 56% carved, test-ray active count 28 of 64 at iter 0 —
    # above the 0.9*24 budget, inside the interim cap 56)
    vol = make_vessel_volume(res=48, extent=40.0)
    dcfg = DatagenConfig(
        limited_size=180.0, number_angles=4.0, img_width=48, img_height=48,
        sample_outside=50.0, stratified_depths=False,
    )
    ds = generate_dataset(vol, dcfg)
    cfg = tiny_cfg(
        n_iters=60, display_every=20, grid_resolution=32, outside=50.0,
        depth_samples_per_ray=64, sample_size=16,
        compact_samples=24, compact_engage_max=56,
        carve_init=True,
    )
    result = train(cfg, ds.rays, src_pt_z=1500.0, verbose=True)
    out = capsys.readouterr().out
    assert "carve_init:" in out  # carving ran and reported its fraction
    assert "switching to compacted stepper at iter 0" in out
    assert np.isfinite(result.last_psnr)
    # the engaged k sits on the interim ladder: above the budget,
    # 32-bucketed, within the cap
    import re

    m = re.search(r"-> k=(\d+)", out)
    assert m, out
    k = int(m.group(1))
    assert cfg.compact_samples < k <= cfg.compact_engage_max


def test_train_step_hybrid2_march(sphere_data):
    """One jitted train step through the two-bucket hybrid march
    (hybrid_split + hybrid_w_lo): finite loss, params move, and the loss
    matches the single-bucket hybrid step when w_lo covers every span
    (the split is then a pure re-ordering of the batch)."""
    base = dict(
        depth_samples_per_ray=200, grid_resolution=32, sample_size=12,
        outside=100.0, march_mode="hybrid", compact_samples=48,
    )
    cfg2 = tiny_cfg(**base, hybrid_split=0.75, hybrid_w_lo=160,
                    hybrid_w_cap=160)
    cfg1 = tiny_cfg(**base, hybrid_w_cap=160)
    model, state2 = create_train_state(cfg2, jax.random.PRNGKey(0))
    _, state1 = create_train_state(cfg1, jax.random.PRNGKey(0))
    step2 = make_train_step(model, cfg2, near=1400.0, far=1600.0)
    step1 = make_train_step(model, cfg1, near=1400.0, far=1600.0)
    s2, m2, _, _ = step2(state2, sphere_data.rays)
    s1, m1, _, _ = step1(state1, sphere_data.rays)
    l2 = float(m2["loss/train-pixel-coarse"])
    l1 = float(m1["loss/train-pixel-coarse"])
    assert np.isfinite(l2)
    assert abs(l2 - l1) < 1e-6, (l2, l1)
    assert int(s2.step) == 1


def test_train_step_hybrid2k_march(sphere_data):
    """One jitted train step through the per-bucket-k march
    (hybrid_bucket_k + hybrid_k_lo, ops/occupancy.py::march_rays_hybrid2k):
    finite loss and params move — exercises the flat-MLP + per-bucket
    composite + inverse-permutation gradient path end to end."""
    cfgk = tiny_cfg(
        depth_samples_per_ray=200, grid_resolution=32, sample_size=12,
        outside=100.0, march_mode="hybrid", compact_samples=48,
        hybrid_split=0.75, hybrid_w_lo=128, hybrid_w_cap=160,
        hybrid_bucket_k=True, hybrid_k_lo=32,
    )
    model, state = create_train_state(cfgk, jax.random.PRNGKey(0))
    stepk = make_train_step(model, cfgk, near=1400.0, far=1600.0)
    p0 = jax.tree.map(np.array, state.params)
    s, m, _, _ = stepk(state, sphere_data.rays)
    lk = float(m["loss/train-pixel-coarse"])
    assert np.isfinite(lk) and int(s.step) == 1
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p0, jax.tree.map(np.array, s.params),
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_render_rays_hybrid2k_matches_hybrid_when_lossless(sphere_data):
    """render_rays through a BucketedRays march returns the SAME pixels (in
    input ray order) as the single-bucket hybrid when k_lo covers the
    measured lo-bucket active max — with the real MLP in the loop."""
    from nerf_for_angiography_tpu.ops import (
        create_grid,
        march_rays_hybrid,
        update_grid,
    )
    from nerf_for_angiography_tpu.training.train import render_rays

    def sphere_sigma(p, radius=30.0, value=1.0):
        return jnp.where(jnp.linalg.norm(p, axis=-1) < radius, value, 0.0)

    base = dict(
        depth_samples_per_ray=200, grid_resolution=32, sample_size=12,
        outside=100.0, march_mode="hybrid", compact_samples=96,
    )
    aabb = jnp.array([-100.0, -100.0, -100.0, 100.0, 100.0, 100.0])
    g = create_grid(aabb, 32)
    g = update_grid(g, sphere_sigma, occ_thre=1e-4)
    o = sphere_data.rays.origins[:96]
    d = sphere_data.rays.directions[:96]
    cfg1 = tiny_cfg(**base, hybrid_w_cap=160)
    model, state = create_train_state(cfg1, jax.random.PRNGKey(0))
    hyb = march_rays_hybrid(
        g, o, d, 200, 1400.0, 1600.0, k=96, w_cap=160, aabb_extent=200.0
    )
    ac = int(np.asarray(hyb.mask.sum(-1)).max())
    k_lo = ((ac + 7) // 8) * 8
    assert k_lo < 96, (ac, k_lo)
    # w_lo must stay < w_cap for the split to engage; both cover every
    # span here, so the render is lossless in both buckets
    cfgk = tiny_cfg(
        **base, hybrid_split=0.75, hybrid_w_lo=160, hybrid_w_cap=192,
        hybrid_bucket_k=True, hybrid_k_lo=k_lo,
    )
    px1, _, _ = render_rays(
        model, state.params, g, o, d, cfg1, 1400.0, 1600.0
    )
    pxk, _, _ = render_rays(
        model, state.params, g, o, d, cfgk, 1400.0, 1600.0
    )
    np.testing.assert_allclose(
        np.asarray(pxk), np.asarray(px1), atol=1e-5
    )

    # feature-major MLP input path: same pixels AND same gradients as the
    # point-major default, on both the rectangular and the bucketed march
    # (positions recomputed from compacted t midpoints — 1 ulp tolerance)
    import dataclasses

    for cfg in (cfg1, cfgk):
        cfg_fm = dataclasses.replace(cfg, feature_major_mlp=True)

        def loss(p, c):
            px, _, _ = render_rays(model, p, g, o, d, c, 1400.0, 1600.0)
            return jnp.mean((px - 0.5) ** 2)

        l_pm, g_pm = jax.value_and_grad(loss)(state.params, cfg)
        l_fm, g_fm = jax.value_and_grad(loss)(state.params, cfg_fm)
        np.testing.assert_allclose(float(l_fm), float(l_pm), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4
            ),
            g_fm, g_pm,
        )
