"""Evaluation layer tests: metrics, perceptual stubs, heatmap exports, and a
small end-to-end sweep on a trained micro-model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from nerf_for_angiography_tpu.data import (
    DatagenConfig,
    generate_dataset,
    make_sphere_volume,
)
from nerf_for_angiography_tpu.evaluation import (
    EvalConfig,
    PerceptualMetrics,
    binarize,
    convert_to_polar,
    dice_binary,
    dice_micro,
    dot_score,
    get_2d_heatmap,
    gt_from_volume,
    hemisphere_mask,
    normalize_cam_poses,
    psnr,
    run_sweep,
    ssim,
    sweep_angles,
)
from nerf_for_angiography_tpu.training import TrainConfig, train
from nerf_for_angiography_tpu.utils import read_vtk


def test_psnr_identity():
    x = jnp.ones((8, 8)) * 0.5
    assert float(psnr(x, x + 0.1)) == pytest.approx(20.0, abs=0.01)


def test_ssim_bounds_and_identity():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (32, 32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    y = jax.random.uniform(jax.random.PRNGKey(1), (32, 32))
    s = float(ssim(x, y))
    assert -1.0 <= s < 0.5


def test_ssim_monotone_with_noise():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (32, 32))
    s1 = float(ssim(x, x + 0.01))
    s2 = float(ssim(x, x + 0.1))
    assert s1 > s2


def test_dice_micro_is_accuracy_for_dense_labels():
    """torchmetrics Dice(average='micro') on dense binary maps == accuracy
    (documented reference semantics)."""
    p = jnp.array([[1, 0], [1, 1]])
    t = jnp.array([[1, 1], [1, 1]])
    assert float(dice_micro(p, t)) == pytest.approx(2 * 3 / (2 * 3 + 1 + 1))


def test_dice_binary_overlap():
    p = jnp.array([1, 1, 0, 0])
    t = jnp.array([1, 0, 1, 0])
    assert float(dice_binary(p, t)) == pytest.approx(2 * 1 / (2 + 2))


def test_binarize_threshold():
    img = jnp.array([0.2, 0.99, 1.0])
    np.testing.assert_array_equal(np.asarray(binarize(img)), [0, 0, 1])


def test_dot_score_normalized():
    x = jnp.array([[0.0, 2.0]])
    y = jnp.array([[0.0, 4.0]])
    assert float(dot_score(x, y)) == pytest.approx(0.5)  # both normalize to [0,1]


def test_perceptual_uncalibrated():
    pm = PerceptualMetrics.uncalibrated()
    assert not pm.calibrated
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 64))
    y = jax.random.uniform(jax.random.PRNGKey(1), (64, 64))
    d_same = float(pm.lpips(x, x))
    d_diff = float(pm.lpips(x, y))
    assert d_same == pytest.approx(0.0, abs=1e-5)
    assert d_diff > 1e-4
    s_same = float(pm.dists(x, x))
    s_diff = float(pm.dists(x, y))
    assert s_same < s_diff


def test_convert_to_polar():
    t, r = convert_to_polar(np.array([1.0, 0.0]), np.array([0.0, 1.0]))
    np.testing.assert_allclose(t, [0.0, np.round(np.pi / 2, 2)])
    np.testing.assert_allclose(r, [1.0, 1.0])


def test_hemisphere_masks():
    th = np.array([45.0, -45.0, 135.0])
    ph = np.array([0.0, 0.0, 0.0])
    top = hemisphere_mask(th, ph, "X", "Z", "top")
    np.testing.assert_array_equal(top, [True, False, True])
    bot = hemisphere_mask(th, ph, "X", "Z", "bottom")
    np.testing.assert_array_equal(bot, [False, True, False])


def test_sweep_angles_grid():
    a = sweep_angles(EvalConfig())
    assert a.shape == (37 * 37, 2)
    assert a[:, 0].min() == -180.0 and a[:, 0].max() == 180.0


@pytest.mark.slow
def test_end_to_end_sweep(tmp_path):
    """Micro-train a sphere, sweep a coarse angle grid, check artifacts."""
    vol = make_sphere_volume(res=48, extent=75.0, radius=30.0, mu=0.02)
    dcfg = DatagenConfig(
        limited_size=90.0, number_angles=2.0, img_width=20, img_height=20,
        sample_outside=100.0, stratified_depths=False,
    )
    ds = generate_dataset(vol, dcfg)
    tcfg = TrainConfig(
        depth_samples_per_ray=48, sample_size=16, grid_resolution=16,
        display_every=50, n_iters=100, coarse_lr=5e-3,
    )
    result = train(tcfg, ds.rays, src_pt_z=1500.0, verbose=False)

    from nerf_for_angiography_tpu.models import CPPN

    model = CPPN(tcfg.model_config())
    ecfg = EvalConfig(
        limited_size_vis=180.0, number_angles_vis=3.0, img_width=20,
        img_height=20, sample_outside=100.0, depth_samples_per_ray=48,
        outside=100.0, field_resolution=17, save_videos=False,
        heatmap_metrics=("PSNR",),
    )
    gt = gt_from_volume(vol, ecfg)
    out = str(tmp_path / "eval")
    df = run_sweep(
        model, result.state.params, result.state.grid, ecfg, gt, out,
        page_data=result.page_data, verbose=False,
    )
    assert len(df) == 16  # arange(-90, 91, 60) -> 4 thetas x 4 phis
    # metric table exists with the schema columns
    md = pd.read_csv(os.path.join(out, "df-metrics.csv"), sep=";", index_col=0)
    for col in ("image_id", "theta", "phi", "theta_360", "cam_pose_x", "PSNR"):
        assert col in md.columns
    # a reasonable fraction of views reconstruct decently
    assert md["PSNR"].mean() > 10.0
    # VTK field written and readable
    g = read_vtk(os.path.join(out, "coarse-field.vtk"))
    assert g.dimensions == (17, 17, 17)
    # heatmap JSONs exist
    json_root = os.path.join(out, "jsonData")
    found = []
    for root, _, files in os.walk(json_root):
        found += [f for f in files if f.endswith(".json")]
    assert any(f.startswith("PSNR-top") for f in found)
    # per-angle image JSON round-trips
    pa = [f for f in found if not f.startswith("PSNR")]
    assert len(pa) > 0
    # summary stats file
    assert os.path.exists(os.path.join(out, "metrics-summary.txt"))


def test_heatmap_json_structure(tmp_path):
    """Synthetic df -> JSON with rad sorted descending and matching the
    cag-vis consumption format (ReactHeatmap.js:245-363)."""
    n = 5
    th = np.repeat(np.linspace(0, 180, n), n)
    ph = np.tile(np.linspace(-90, 90, n), n)
    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {
            "theta": th, "phi": ph,
            "cam_pose_x": np.sin(np.deg2rad(th)) * np.cos(np.deg2rad(ph)),
            "cam_pose_y": np.sin(np.deg2rad(th)) * np.sin(np.deg2rad(ph)),
            "cam_pose_z": np.cos(np.deg2rad(th)),
            "PSNR": rng.rand(n * n) * 30,
            "pred_img": [rng.rand(4).tolist() for _ in range(n * n)],
            "org_img": [rng.rand(4).tolist() for _ in range(n * n)],
        }
    )
    normalize_cam_poses(df)
    out = str(tmp_path)
    obj = get_2d_heatmap(
        df, out, os.path.join(out, "exp"), name="top", x_axis="X", y_axis="Z",
        metric="PSNR", vminmax=(15, 50), save_png=False,
    )
    assert obj is not None
    assert set(obj.keys()) == {"rad", "theta", "angles", "vals"}
    rads = obj["rad"]
    assert all(rads[i] >= rads[i + 1] for i in range(len(rads) - 1))
    with open(os.path.join(out, "exp", "PSNR-top-X-Z.json")) as f:
        loaded = json.load(f)
    assert loaded["vals"] == obj["vals"]
    # per-angle files contain pred/org/diff
    a0 = obj["angles"][0]
    with open(os.path.join(out, "exp", f"{a0[0]}{a0[1]}.json")) as f:
        per = json.load(f)
    assert set(per.keys()) == {"pred", "org", "diff"}


def test_lca_dense_render_path():
    """The LCA (dense, grid-free) view renderer produces valid images
    (visualization.py:356-397 semantics)."""
    from nerf_for_angiography_tpu.evaluation import lca_eval_config, render_view_pair
    from nerf_for_angiography_tpu.models import CPPN, CPPNConfig, init_cppn
    from nerf_for_angiography_tpu.ops import create_grid

    cfg = lca_eval_config(
        img_width=8, img_height=10, depth_samples_per_ray=16,
        sample_outside=50.0, outside=80.0, field_resolution=5,
    )
    model, params = init_cppn(
        CPPNConfig(input_scale=1.0 / cfg.outside), jax.random.PRNGKey(0)
    )
    grid = create_grid(np.array([-80.0] * 3 + [80.0] * 3), 8)
    pred, bpred, c2w = render_view_pair(model, params, grid, cfg, 30.0, 45.0)
    assert pred.shape == (10, 8)
    assert np.all((pred >= 0) & (pred <= 1))
    # binary render zeroes low densities -> at least as transparent
    assert np.all(bpred >= pred - 1e-6)


def test_vgg16_features_match_torch():
    """Our flax VGG16 == a torch VGG16 with identical weights (validates the
    conversion path in tools/convert_perceptual_weights.py without network
    access: HWIO transposition, SAME padding, pooling placement)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from nerf_for_angiography_tpu.evaluation.perceptual import (
        _VGG16_PLAN,
        init_vgg16,
        vgg16_features,
    )

    params = init_vgg16(jax.random.PRNGKey(0))

    layers = []
    in_c = 3
    for (w, b), (out_c, pool) in zip(params, _VGG16_PLAN):
        if pool:
            layers.append(tnn.MaxPool2d(2, 2))
        conv = tnn.Conv2d(in_c, out_c, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(np.asarray(w).transpose(3, 2, 0, 1)))
            conv.bias.copy_(torch.tensor(np.asarray(b)))
        layers += [conv, tnn.ReLU()]
        in_c = out_c
    tmodel = tnn.Sequential(*layers).eval()

    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    feats = vgg16_features(params, jnp.asarray(x))

    with torch.no_grad():
        h = torch.tensor(x.transpose(0, 3, 1, 2))
        tfeats = []
        conv_idx = 0
        for layer in tmodel:
            h = layer(h)
            if isinstance(layer, tnn.ReLU):
                if conv_idx in (1, 3, 6, 9, 12):
                    tfeats.append(h.numpy().transpose(0, 2, 3, 1))
                conv_idx += 1

    assert len(feats) == len(tfeats) == 5
    for f_jax, f_torch in zip(feats, tfeats):
        np.testing.assert_allclose(
            np.asarray(f_jax), f_torch, atol=5e-4, rtol=1e-3
        )


def test_reconstruction_api(tmp_path):
    """Reconstruction.from_run_dir round-trips training artifacts and
    renders novel views / fields."""
    from nerf_for_angiography_tpu.data import make_sphere_volume
    from nerf_for_angiography_tpu.reconstruction import Reconstruction

    vol = make_sphere_volume(res=32)
    dcfg = DatagenConfig(
        limited_size=90.0, number_angles=1.0, img_width=12, img_height=12,
        sample_outside=100.0, stratified_depths=False,
    )
    ds = generate_dataset(vol, dcfg)
    tcfg = TrainConfig(
        depth_samples_per_ray=32, sample_size=10, grid_resolution=8,
        display_every=25, n_iters=50,
    )
    log_dir = str(tmp_path / "run")
    os.makedirs(log_dir)
    train(tcfg, ds.rays, src_pt_z=1500.0, log_dir=log_dir, verbose=False)

    ecfg = EvalConfig(
        img_width=12, img_height=12, sample_outside=100.0,
        depth_samples_per_ray=32, outside=100.0,
    )
    rec = Reconstruction.from_run_dir(log_dir, eval_config=ecfg)
    img = rec.render_view(30.0, -45.0)
    assert img.shape == (12, 12)
    assert np.all((img >= 0) & (img <= 1.0 + 1e-6))
    b = rec.render_view(30.0, -45.0, binary=True)
    assert np.all(b >= img - 1e-5)
    field = rec.density_field(resolution=9)
    assert field.shape == (9, 9, 9)
    d = rec.density(np.zeros((4, 3)))
    assert d.shape == (4,)


def test_ssim_bounded_on_constant_regions():
    """Near-constant (white-background) images must not push SSIM above 1
    via f32 cancellation."""
    x = jnp.ones((64, 64))
    y = jnp.ones((64, 64)).at[30:34, 30:34].set(0.2)
    s = float(ssim(x, y))
    assert s <= 1.0 + 1e-6
    s2 = float(ssim(x * 0.9998, x))
    assert s2 <= 1.0 + 1e-6


def test_lpips_dists_match_torch_formula():
    """Our LPIPS/DISTS math == an independent torch implementation of the
    published formulas with identical (random) weights — architecture-level
    golden values without network access (VERDICT r1 #3a)."""
    torch = pytest.importorskip("torch")

    from nerf_for_angiography_tpu.evaluation.perceptual import (
        _IMAGENET_MEAN,
        _IMAGENET_STD,
        _VGG16_PLAN,
        PerceptualMetrics,
        vgg16_features,
    )

    pm = PerceptualMetrics.uncalibrated(jax.random.PRNGKey(7))
    rs = np.random.RandomState(1)
    a = rs.rand(24, 24).astype(np.float32)
    b = np.clip(a + 0.1 * rs.randn(24, 24).astype(np.float32), 0, 1)

    got_lpips = float(pm.lpips(jnp.asarray(a), jnp.asarray(b)))
    got_dists = float(pm.dists(jnp.asarray(a), jnp.asarray(b)))

    def t_prep(img):
        x = torch.tensor(img)[None, None].repeat(1, 3, 1, 1)
        mean = torch.tensor(_IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(_IMAGENET_STD).view(1, 3, 1, 1)
        return (x - mean) / std

    def t_feats(x, avg_pool=False):
        feats = []
        h = x
        for i, ((w, bb), (out_c, pool)) in enumerate(zip(pm.vgg_params, _VGG16_PLAN)):
            if pool:
                h = (torch.nn.functional.avg_pool2d if avg_pool
                     else torch.nn.functional.max_pool2d)(h, 2, 2)
            wt = torch.tensor(np.asarray(w).transpose(3, 2, 0, 1))
            h = torch.nn.functional.relu(
                torch.nn.functional.conv2d(h, wt, torch.tensor(np.asarray(bb)),
                                           padding=1)
            )
            if i in (1, 3, 6, 9, 12):
                feats.append(h)
        return feats

    with torch.no_grad():
        xa, xb = t_prep(a), t_prep(b)
        fa, fb = t_feats(xa), t_feats(xb)
        # LPIPS: unit-normalize channels, squared diff, 1x1 linear, mean, sum
        t_lpips = 0.0
        for f1, f2, w in zip(fa, fb, pm.lpips_weights):
            n1 = f1 / torch.sqrt((f1**2).sum(1, keepdim=True) + 1e-10)
            n2 = f2 / torch.sqrt((f2**2).sum(1, keepdim=True) + 1e-10)
            d = (n1 - n2) ** 2
            wt = torch.tensor(np.asarray(w)).view(1, -1, 1, 1)
            t_lpips += float((d * wt).sum(1).mean())
        # DISTS: texture/structure similarities over [input]+stages on the
        # AVG-pool backbone (piq replace_pooling=True)
        fa_d, fb_d = t_feats(xa, avg_pool=True), t_feats(xb, avg_pool=True)
        t_dists_sim = 0.0
        for f1, f2, al, be in zip(
            [xa] + fa_d, [xb] + fb_d, pm.dists_alpha, pm.dists_beta
        ):
            mu1 = f1.mean((2, 3))
            mu2 = f2.mean((2, 3))
            var1 = f1.var((2, 3), unbiased=False)
            var2 = f2.var((2, 3), unbiased=False)
            cov = (f1 * f2).mean((2, 3)) - mu1 * mu2
            c1 = c2 = 1e-6
            texture = (2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)
            structure = (2 * cov + c2) / (var1 + var2 + c2)
            t_dists_sim += float(
                (torch.tensor(np.asarray(al)) * texture
                 + torch.tensor(np.asarray(be)) * structure).sum()
            )
        t_dists = 1.0 - t_dists_sim

    assert abs(got_lpips - t_lpips) < 5e-4, (got_lpips, t_lpips)
    assert abs(got_dists - t_dists) < 5e-4, (got_dists, t_dists)


def test_perceptual_golden_analytic_images():
    """Golden block (VERDICT r3 next-#6): LPIPS/DISTS on analytic images
    (constant-vs-brighter, impulse, one-pixel-shifted edge) with the
    DETERMINISTIC uncalibrated weights (PRNGKey 1234), values pinned so the
    metric math cannot drift silently. Together with
    test_lpips_dists_match_torch_formula (independent torch transcription
    of piq's published formulas, piq/perceptual.py semantics incl. the
    DISTS avg-pool backbone), calibration to piq-comparable values is a
    one-weight-file drop (PerceptualMetrics.from_npz; ingest doc in
    README). Ref: /root/reference/visualization/visualization.py:419-433."""
    from nerf_for_angiography_tpu.evaluation.perceptual import PerceptualMetrics

    pm = PerceptualMetrics.uncalibrated()
    const = np.full((32, 32), 0.25, np.float32)
    bright = np.full((32, 32), 0.75, np.float32)
    impulse = const.copy()
    impulse[16, 16] = 1.0
    edge = np.zeros((32, 32), np.float32)
    edge[:, 16:] = 1.0
    edge_shift = np.zeros((32, 32), np.float32)
    edge_shift[:, 17:] = 1.0

    golden = {
        # (lpips, dists) computed at pinning time on the CPU backend
        "const_vs_bright": ((const, bright), (0.03234453, 0.47617298)),
        "const_vs_impulse": ((const, impulse), (0.00087667, 0.01762462)),
        "edge_vs_shifted": ((edge, edge_shift), (0.00214119, 0.02966177)),
    }
    for name, ((a, b), (want_lpips, want_dists)) in golden.items():
        got_lpips = float(pm.lpips(jnp.asarray(a), jnp.asarray(b)))
        got_dists = float(pm.dists(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got_lpips - want_lpips) < 2e-5, (name, got_lpips)
        assert abs(got_dists - want_dists) < 2e-4, (name, got_dists)
    # ordinal sanity piq guarantees: a large luminance change dominates a
    # one-pixel impulse under both metrics
    assert golden["const_vs_bright"][1][0] > golden["const_vs_impulse"][1][0]
    assert golden["const_vs_bright"][1][1] > golden["const_vs_impulse"][1][1]


def test_dists_closed_form_zero_vgg():
    """With all-zero VGG convs every feature stage is 0 (texture =
    structure = 1 exactly), so DISTS reduces to a CLOSED FORM in the input
    stage alone — a by-hand golden value of the published formula (Ding et
    al. 2020 eq. 6/7 as implemented by piq). LPIPS with zero features is
    exactly 0 for ANY image pair."""
    from nerf_for_angiography_tpu.evaluation.perceptual import (
        _IMAGENET_MEAN,
        _IMAGENET_STD,
        _STAGE_CHANNELS,
        _VGG16_PLAN,
        PerceptualMetrics,
    )

    vgg = []
    in_c = 3
    for out_c, _ in _VGG16_PLAN:
        vgg.append((jnp.zeros((3, 3, in_c, out_c)), jnp.zeros((out_c,))))
        in_c = out_c
    n_total = 2 * (sum(_STAGE_CHANNELS) + 3)
    lp = [jnp.full((c,), 1.0 / c) for c in _STAGE_CHANNELS]
    al = [jnp.full((c,), 1.0 / n_total) for c in (3,) + _STAGE_CHANNELS]
    be = [jnp.full((c,), 1.0 / n_total) for c in (3,) + _STAGE_CHANNELS]
    pm = PerceptualMetrics(vgg, lp, al, be, calibrated=False)

    va, vb = 0.25, 0.75
    a = np.full((16, 16), va, np.float32)
    b = np.full((16, 16), vb, np.float32)

    assert float(pm.lpips(jnp.asarray(a), jnp.asarray(b))) == 0.0

    # input stage per channel: mu = (v - mean_c)/std_c, var = cov = 0
    c1 = c2 = 1e-6
    mu1 = (va - _IMAGENET_MEAN) / _IMAGENET_STD
    mu2 = (vb - _IMAGENET_MEAN) / _IMAGENET_STD
    texture0 = (2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)
    structure0 = 1.0  # (2*0 + c2) / (0 + 0 + c2)
    sim = (
        # zero-feature stages: texture = structure = 1
        sum((c / n_total) * 2 for c in _STAGE_CHANNELS)
        + float(np.sum(texture0) / n_total)
        + (3 / n_total) * structure0
    )
    want = 1.0 - sim
    got = float(pm.dists(jnp.asarray(a), jnp.asarray(b)))
    # tolerance: the input-stage structure term is ill-conditioned on
    # constant images (cov = E[f1 f2] - mu1 mu2 cancels to ~f32-eps against
    # c2 = 1e-6 — piq's own uncentered formula, DISTS official code, has
    # the identical wobble), so structure0 can wander within +-1 of its
    # exact value of 1; everything else is pinned to float precision
    tol = 3.0 / n_total  # b0-weighted worst-case structure0 excursion
    assert abs(got - want) < tol, (got, want, tol)


def test_perceptual_identity_is_zero():
    from nerf_for_angiography_tpu.evaluation.perceptual import PerceptualMetrics

    pm = PerceptualMetrics.uncalibrated(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.RandomState(0).rand(16, 16), jnp.float32)
    assert float(pm.lpips(img, img)) < 1e-6
    # DISTS(x,x): texture=structure=1 -> sim = sum(alpha+beta) = 1 -> 0
    assert abs(float(pm.dists(img, img))) < 1e-3


def test_sweep_uncalibrated_perceptual_exports(tmp_path):
    """Default-ish sweep with the uncalibrated backend: LPIPS/DISTS columns
    present + flagged, and LPIPS/DISTS heatmap JSONs carry calibrated=false
    (VERDICT r1 #3b/#4)."""
    import json as _json

    from nerf_for_angiography_tpu.evaluation.perceptual import PerceptualMetrics
    from nerf_for_angiography_tpu.models import CPPN
    from nerf_for_angiography_tpu.ops.interpolation import trilinear

    vol = make_sphere_volume(res=24, extent=75.0, radius=30.0, mu=0.02)
    tcfg = TrainConfig(
        depth_samples_per_ray=32, sample_size=8, grid_resolution=8, n_iters=1,
        display_every=1,
    )
    from nerf_for_angiography_tpu.training import create_train_state

    model, state = create_train_state(tcfg, jax.random.PRNGKey(0))
    ecfg = EvalConfig(
        limited_size_vis=180.0, number_angles_vis=2.0, img_width=12,
        img_height=12, sample_outside=100.0, depth_samples_per_ray=32,
        outside=100.0, field_resolution=9, save_videos=True,
    )
    gt = gt_from_volume(vol, ecfg)
    out = str(tmp_path / "eval")
    pm = PerceptualMetrics.uncalibrated(jax.random.PRNGKey(0))
    df = run_sweep(
        model, state.params, state.grid, ecfg, gt, out,
        perceptual=pm, gt_volume_sampler=lambda p: trilinear(vol, p),
        verbose=False,
    )
    assert "LPIPS" in df.columns and "DISTS" in df.columns
    assert "DICE 3D" in df.columns and "DOT 3D" in df.columns
    assert bool(df["perceptual_calibrated"].iloc[0]) is False
    md = pd.read_csv(os.path.join(out, "df-metrics.csv"), sep=";", index_col=0)
    for col in ("LPIPS", "DISTS", "DICE 3D", "DOT 3D", "perceptual_calibrated"):
        assert col in md.columns
    # every computed per-view metric exports top+bottom heatmap JSONs
    json_root = os.path.join(out, "jsonData")
    found = []
    for root, _, files in os.walk(json_root):
        found += [os.path.join(root, f) for f in files]
    names = [os.path.basename(f) for f in found]
    for m in ("PSNR", "SSIM", "DICE 2D", "DOT 2D", "LPIPS", "DISTS"):
        assert f"{m}-top-X-Z.json" in names, names
        assert f"{m}-bottom-X-Z.json" in names, names
    # constant 3D metrics are not heatmapped
    assert "DICE 3D-top-X-Z.json" not in names
    lp = [f for f in found if f.endswith("LPIPS-top-X-Z.json")][0]
    obj = _json.load(open(lp))
    assert obj["calibrated"] is False
    ps = [f for f in found if f.endswith("PSNR-top-X-Z.json")][0]
    assert "calibrated" not in _json.load(open(ps))
    # rotation videos materialized (GIF fallback without ffmpeg)
    vids = [f for f in os.listdir(os.path.join(out, "projections"))
            if f.endswith((".gif", ".mp4"))]
    assert any("theta-rotation" in v for v in vids)
    assert all(os.path.getsize(os.path.join(out, "projections", v)) > 0
               for v in vids)


def test_video_gif_fallback(tmp_path):
    from nerf_for_angiography_tpu.evaluation.video import get_videos

    rows = [
        {"org_img": np.random.rand(64), "pred_img": np.random.rand(64),
         "binary_pred_img": np.random.rand(64)}
        for _ in range(4)
    ]
    written = get_videos(rows, "theta-rotation", 8, 8, str(tmp_path))
    assert len(written) == 4
    for w in written:
        assert os.path.getsize(w) > 0


def _parse_boxes(data, start=0, end=None):
    """Flat ISO-BMFF box scan: [(fourcc, payload_start, payload_end)]."""
    import struct

    out = []
    i = start
    end = len(data) if end is None else end
    while i + 8 <= end:
        size = struct.unpack(">I", data[i : i + 4])[0]
        out.append((data[i + 4 : i + 8], i + 8, i + size))
        i += size
    return out


def test_video_mjpeg_mp4_container(tmp_path):
    """Without ffmpeg, save_video writes ``path`` itself as a
    structurally-valid ISO-BMFF .mp4 (the reference's actual artifact
    format, helpers.py:47-49): ftyp|mdat|moov box chain, a 'jpeg'
    (Motion-JPEG) sample entry, stsz sizes + the stco offset locating
    samples that PIL decodes as JPEG, plus a browser-previewable GIF."""
    import io
    import struct

    from PIL import Image

    from nerf_for_angiography_tpu.evaluation.video import save_video

    frames = [(np.random.rand(32, 48) * 255).astype(np.uint8) for _ in range(5)]
    p = save_video(frames, str(tmp_path / "rot.mp4"), fps=10)
    assert p.endswith(".mp4")
    assert (tmp_path / "rot.gif").exists()

    data = open(p, "rb").read()
    top = _parse_boxes(data)
    kinds = [b[0] for b in top]
    assert kinds == [b"ftyp", b"mdat", b"moov"]
    assert top[-1][2] == len(data)  # box sizes tile the file exactly
    moov = dict((b[0], b) for b in _parse_boxes(data, top[2][1], top[2][2]))
    assert b"mvhd" in moov and b"trak" in moov
    # walk trak -> mdia -> minf -> stbl
    def child(span, fourcc, skip=0):
        for b in _parse_boxes(data, span[1] + skip, span[2]):
            if b[0] == fourcc:
                return b
        raise AssertionError(f"{fourcc} not found")

    stbl = child(child(child(moov[b"trak"], b"mdia"), b"minf"), b"stbl")
    stsd = child(stbl, b"stsd")
    assert b"jpeg" in data[stsd[1] : stsd[2]]
    stsz = child(stbl, b"stsz")
    n = struct.unpack(">I", data[stsz[1] + 8 : stsz[1] + 12])[0]
    assert n == 5
    sizes = struct.unpack(f">{n}I", data[stsz[1] + 12 : stsz[1] + 12 + 4 * n])
    stco = child(stbl, b"stco")
    off = struct.unpack(">I", data[stco[1] + 8 : stco[1] + 12])[0]
    # every sample decodes as a JPEG of the right dimensions
    for sz in sizes:
        img = Image.open(io.BytesIO(data[off : off + sz]))
        assert img.size == (48, 32)
        off += sz
    assert off == top[1][2]  # samples tile the mdat payload exactly


def test_video_mjpeg_avi_container(tmp_path):
    """The MJPEG/AVI muxer (kept for players without MJPEG-in-MP4
    support) writes a structurally-valid RIFF whose embedded JPEG frames
    PIL can decode."""
    import io
    import struct

    from PIL import Image

    from nerf_for_angiography_tpu.evaluation.video import _mjpeg_avi

    frames = [(np.random.rand(32, 48) * 255).astype(np.uint8) for _ in range(5)]
    p = str(tmp_path / "rot.avi")
    _mjpeg_avi(frames, p, fps=10)

    data = open(p, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"idx1" in data
    # decode the first '00dc' frame chunk inside 'movi'
    j = data.find(b"00dc", data.find(b"movi"))
    sz = struct.unpack("<I", data[j + 4 : j + 8])[0]
    img = Image.open(io.BytesIO(data[j + 8 : j + 8 + sz]))
    assert img.size == (48, 32)
    # frame count in the avih header matches
    avih = data.find(b"avih")
    n_frames = struct.unpack("<I", data[avih + 8 + 16 : avih + 8 + 20])[0]
    assert n_frames == 5
