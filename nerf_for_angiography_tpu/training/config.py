"""Training configuration.

One dataclass per entry point (SURVEY.md §5 config plan) with a CLI shim
exposing exactly the reference's flags and defaults
(run_nerf_acc.py:25-47: --limited_size --number_angles --center_point
--binary --sampling_strategy --data_name --num_layers --num_hidden_units),
plus the module-level constants from run_nerf_acc.py:59-183 as fields.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses

from ..models import CPPNConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # reference CLI flags (run_nerf_acc.py:40-47)
    limited_size: float = 180.0
    number_angles: float = 4.0
    center_point: tuple[float, float] = (90.0, 0.0)
    binary: bool = False
    sampling_strategy: str = "frangi"  # frangi | segmentation | random
    data_name: str = "ct"
    num_layers: int = 4
    num_hidden_units: int = 128

    # schedule (run_nerf_acc.py:129-167)
    n_iters: int = 500_000
    early_stop_iters: int = 50_000
    display_every: int = 500
    save_every_factor: int = 100  # save_every = display_every * 100
    depth_samples_per_ray: int = 300
    coarse_lr: float = 1e-4
    decay_rate: float = 0.1
    decay_steps: int = 500 * 1000  # lr_decay(500) * 1000
    sample_size: int = 75  # rays per dim per iter -> batch = sample_size^2
    sample_mode: str = "pixel"  # 'pixel' | 'image'

    # scene bounds (run_nerf_acc.py:66,131-134,196)
    outside: float = 100.0

    # nerfacc-equivalent marching params (run_nerf_acc.py:68-70).
    # alpha_thre doubles as the occupancy-grid occ_thre (run_nerf_acc.py:285)
    early_stop_eps: float = 1e-2
    alpha_thre: float = 1e-4
    vessel_alpha_thre: float = 5e-2
    # apply alpha_thre as a hard per-sample mask in the TRAINING loss
    # (nerfacc-strict). Off by default: we evaluate the sample lattice
    # densely, so the mask changes pixels by <= alpha_thre while killing
    # gradient recovery from transparent collapse (see training/train.py)
    train_alpha_prune: bool = False
    grid_resolution: int = 128
    grid_update_every: int = 16
    grid_ema_decay: float = 0.95
    # jitter the grid-update evaluation points uniformly inside each cell
    # (nerfacc's anti-aliasing cell sampling, ops/occupancy.py::update_grid).
    # Prevents thin structures near cell boundaries from aliasing onto the
    # exact-center lattice. Default OFF at the 128^3 flagship: the jittered
    # EMA max grows the occupied set by a surface shell (~0.0071 -> 0.0093
    # occupancy measured at bench), fattening compaction k 80 -> 88 and the
    # hybrid probe window 160 -> 224 for ~8% throughput — while CT vessels
    # span multiple cells, so center sampling cannot miss them (held-out
    # PSNR parity measured in benchmarks/MFU.md's jitter column). Enable
    # for sub-cell structures.
    grid_jitter: bool = False
    # partial grid updates: 1 = dense (every cell every update), N > 1 =
    # rotating 1/N x-slab per update after a 256-step full-update warmup
    # (nerfacc's partial-cell sampling, ops/occupancy.py::
    # update_grid_pair_slab). The dense 2x128^3-point sigma pass costs
    # ~one training step per cadence; slabs=4 cuts that ~4x with full
    # coverage every 4 updates and identical per-evaluation EMA decay.
    grid_update_slabs: int = 4
    # 0 = always-dense lattice; k > 0 enables nerfacc-style empty-space
    # skipping: the train loop switches to a stepper that gathers only the
    # first k grid-occupied samples per ray ONCE the grid has pruned enough
    # that k covers every test ray's active samples (auto-switch in
    # training/loop.py — 2x measured steady-state speedup on v5e; lossless
    # at the switch criterion)
    compact_samples: int = 96
    # allow the compacted stepper to ENGAGE EARLY with an interim k above
    # compact_samples (bucketed to 32 to bound the compiled-stepper
    # universe; the loop shrinks k as the grid prunes). The dense phase
    # runs ~4x slower than compacted; interim engagement converts most of
    # it. 0 = round-2 behavior (wait for width <= 0.9*compact_samples).
    # Lossless: the switch criterion (choose_compact_mode) still requires
    # the interim k to cover every test ray's active width. DEFAULT ON
    # since round 4: the production protocol (carve + interim engagement)
    # is the shipped default — 1.11M rays/s end-to-end at 20k iters vs
    # 337k without, at equal-or-better held-out PSNR (benchmarks/
    # QUALITY.md round-3 table; 8-run gate in quality_runs_r3.jsonl).
    # --reference-strict restores the reference-parity warmup.
    compact_engage_max: int = 192
    # space-carving grid initialization (ops/occupancy.py::carve_feasible):
    # cells traversed by an unattenuated (pixel >= carve_thresh) training
    # ray start — and stay — pruned, engaging the compacted stepper within
    # ~100 iterations instead of ~3-4k (the EMA prune time). Carving is
    # eroded by one cell for conservativeness and skipped automatically
    # under pose_refine (the rays move during training). DEFAULT ON since
    # round 4 (see compact_engage_max); False = the reference's
    # always-start-fully-occupied nerfacc behavior (run_nerf_acc.py:
    # 196-198), restored by --reference-strict.
    carve_init: bool = True
    carve_thresh: float = 0.995
    # probe the occupancy grid every n-th sample during marching (union of
    # bracketing probes; see ops/occupancy.py). 1 = exact per-sample query.
    # At the flagship defaults the probe spacing (stride*(far-near)/samples
    # = 1.33) stays below the cell size (200/128 = 1.56), so stride 2 is a
    # guaranteed superset mask — measured 410k -> 493k rays/s with
    # identical PSNR on v5e
    occ_stride: int = 2
    # compacted-march strategy once compact_samples kicks in:
    # 'window' = contiguous k-sample lattice window located by ~19 probes
    #   of a dilated 4x-coarser grid (ops/occupancy.py::march_rays_window;
    #   zero gathers, superset semantics);
    # 'hybrid' = coarse window + exact strided fine query + top-k INSIDE a
    #   w_cap window (march_rays_hybrid — halves the gather-bound fine
    #   query, handles multi-branch spans the window mode cannot);
    # 'lattice' = per-sample fine-grid query + top-k compaction
    #   (march_rays compact_k — nerfacc-strict masking).
    # The training loop auto-falls back window -> hybrid -> lattice by the
    # measured lossless width (choose_compact_mode).
    march_mode: str = "window"
    # hybrid-march candidate-window width; 0 = the static formula
    # (ops/occupancy.py::hybrid_w_cap). The training loop sizes it from
    # the measured worst-ray span (train.py::hybrid_w_cap_for) so a
    # jitter-fattened grid pays a few extra fine probes instead of
    # falling through to the slower lattice march.
    hybrid_w_cap: int = 0
    # two-bucket hybrid march (ops/occupancy.py::march_rays_hybrid2):
    # sort the batch by coarse-window span and march the narrow
    # hybrid_split fraction at the smaller hybrid_w_lo window, the rest at
    # hybrid_w_cap. The fine-probe count — the step's top cost — drops to
    # ~ split*w_lo + (1-split)*w_cap of w_cap. 0 disables (single-bucket
    # hybrid). The loop tunes hybrid_w_lo from the measured hit-ray span
    # quantile (train.py::hybrid_w_lo_for) exactly like hybrid_w_cap.
    # DEFAULT 0.75 since round 4 per the pre-registered queue14 gate
    # (tools/r3_queue14.sh rule, tools/r3_gate_eval.py verdict): per-seed
    # held-out deltas +0.04/−1.74/−1.68/+2.20 dB all inside the 3.30 dB
    # control cross-seed spread, mean steady 0.994M >= controls' 0.989M
    # rays/s. NOTE the mean held-out delta is −0.29 dB — inside seed
    # noise, but monitored: the round-4 confirmation runs at the shipped
    # defaults re-check it (benchmarks/quality_runs_r4.jsonl). The split
    # only activates when the loop's chooser proposes a w_lo (hybrid-mode
    # grids); window-mode runs are unaffected.
    hybrid_split: float = 0.75
    hybrid_w_lo: int = 0
    # per-bucket compaction width for the two-bucket march
    # (ops/occupancy.py::march_rays_hybrid2k): with hybrid_bucket_k the
    # narrow bucket emits only hybrid_k_lo samples/ray to the MLP — its
    # active counts are bounded by hybrid_w_lo and typically far below k,
    # so the MLP point count (the step's other half) drops to
    # ~ split*k_lo + (1-split)*k of k. The loop sizes hybrid_k_lo from the
    # measured lo-bucket active-count max (the chooser's ac_lo stat,
    # train.py::compact_k_lo_for) and re-grows it at check cadence —
    # the same losslessness protocol as k/w_cap/w_lo. hybrid_k_lo is the
    # RUNTIME value (normally loop-tuned); 0 = single k. DEFAULT ON since
    # round 4 (queue14 gate — see hybrid_split above).
    hybrid_bucket_k: bool = True
    hybrid_k_lo: int = 0
    # grid-evolution margin on the runtime compaction width k
    # (train.py::compact_k_for): k = ceil(width * margin / 8) * 8. The
    # compacted step's MLP cost is LINEAR in k, so every margin point is
    # paid on every step, while the loop re-measures and grows k at
    # display cadence anyway — the same economics that removed the
    # hybrid_w_cap margin in round 3 (a 15% w_cap margin measured
    # 4.60 vs 4.38 ms/step for nothing). Kept slightly above 1.0 by
    # default: unlike w_cap (whose re-check GROWS before truncation can
    # bias), an undersized k drops ACTIVE samples for up to one re-check
    # interval when the EMA re-thresholds cells back on. (1.15 until the
    # lower margins clear the 20k-iter quality gate on the TPU.)
    compact_k_margin: float = 1.15
    # first-k-active compaction backend inside the marches
    # (ops/occupancy.py::_first_k_active): 'xla' (cumsum compare+count) or
    # 'pallas' (ops/pallas/first_k.py, rays-in-lanes transposed kernel).
    # Both measured ~0.6 ms at the flagship shape (benchmarks/MFU.md
    # "first-k-active as a Pallas kernel"); plumbed as a config knob so
    # the A/B is one flag at the SHIPPED march shapes (VERDICT r4 #2).
    march_fka: str = "xla"
    # how often (iters) the loop checks whether the grid has pruned enough
    # to engage the compacted stepper. The dense phase runs at ~1/4 of the
    # compacted throughput, so checking only at display_every cadence (the
    # round-2 behavior) leaves minutes of avoidable dense stepping; the
    # check itself is one jitted probe march (~ms). Once engaged,
    # re-validation drops back to display_every cadence.
    compact_check_every: int = 100
    # write coarsegrid.vtk / coarsevesselgrid.vtk at display cadence
    # (run_nerf_acc.py:359-367 parity). The writes go through an async
    # latest-wins writer thread either way; False skips them entirely
    # (best-model highgrid.vtk exports still happen).
    grid_export: bool = True

    # positional encoding / BARF (run_nerf_acc.py:160-167)
    pos_enc: str = "none"
    pos_enc_basis: int = 5
    fourier_sigma: float = 5.0
    barf_start: int = 8000
    barf_stop: int = 250_000
    # view-direction branch (classic path): 0 disables (the reference's
    # accelerated driver also runs without viewdirs, run_nerf_acc.py:174).
    # When > 0 the model grows the rgb/alpha two-head output
    # (model/CPPN.py:120-131) and barf_alpha_views anneals on the same
    # start/stop schedule as barf_alpha (CPPN.py:236-242 supports the
    # views alpha; the reference driver leaves it at 0 forever — fixed
    # here, SURVEY.md §2.9-bis spirit).
    num_input_channels_views: int = 0
    pos_enc_basis_views: int = 4

    # per-view pose refinement: learnable world-space translation per
    # training view added to ray origins inside the jitted step, trained
    # jointly with the field at pose_lr. The TPU-native generalization of
    # the reference's per-image translation parameters (model/CPPN.py:133-135
    # img1/img2 — declared there but consumed nowhere). Pair with a dataset
    # generated with max_shift_translation > 0 and rays_from_nominal=True.
    pose_refine: bool = False
    pose_lr: float = 1e-2
    # small decay on the shifts: the along-ray translation component is
    # photometrically near-unobservable (it changes magnification by
    # ~t/src_distance), so prefer the minimum-norm correction there
    pose_weight_decay: float = 1e-3
    # steps before the pose shifts start moving (BARF-style curriculum: a
    # randomly-initialized field gives noise pose gradients — let the field
    # form from the misaligned views first, then align)
    pose_start: int = 0

    # weighted ray sampler: 'overdraw' = inverse-CDF overdraw + dedupe
    # (~3x cheaper than the exact sampler — the full-dataset top_k was a
    # profiled 1.37 ms/step; inclusion probabilities within ~1% at the
    # flagship overdraw ratio); 'gumbel' = exact pandas successive-draw
    # semantics (nerf_helpers.py:139) via Gumbel top-k.
    sampling_impl: str = "overdraw"

    # parallelism (no reference counterpart; SURVEY.md §2 parallelism)
    data_axis: str = "data"

    # TPU compute dtype for the MLP hot path; 'float32' for bit-exact
    # reference-style math, 'bfloat16' for ~1.6x MXU throughput (inputs are
    # pre-normalized via input_scale so bf16 keeps sub-voxel resolution).
    compute_dtype: str = "bfloat16"
    # MLP execution backend: 'pallas' = fused VMEM-resident kernel
    # (ops/pallas/fused_mlp.py, 2.4x measured fwd+bwd vs XLA on v5e),
    # 'xla' = flax path, 'auto' = pallas on TPU when the model config is
    # eligible (pos_enc 'none', relu, no view branch), else xla.
    mlp_backend: str = "auto"
    # feed the fused kernel FEATURE-MAJOR (3, P) positions recomputed
    # affinely from the march's compacted t values, skipping the
    # (P, 3) -> (8, P) input relayout its wrapper otherwise pays per step
    # (training/train.py::_raw_for / _flat_positions_fm). Numerically the
    # midpoint recompute matches the march's t_mid to 1 ulp f32. Priced
    # end-to-end in round 5 (MFU.md, tag r5-fm): steady identical,
    # settled −1.4%, quality parity — the relayout it removes was already
    # XLA-fused. NEGATIVE result; stays off as a tested variant.
    feature_major_mlp: bool = False
    # whole-train-step fused kernel (ops/pallas/fused_step.py): MLP
    # forward + Beer-Lambert composite + MSE gradient + MLP backward in
    # ONE pallas_call, replacing the split fwd/bwd kernel pair plus the
    # XLA composite/loss glue between them. Eligible when the pallas MLP
    # path is (pos_enc 'none', relu stack) AND pose_refine/
    # train_alpha_prune are off — otherwise the split path runs.
    # 'auto' = on-TPU when eligible, 'on' = force (raises if ineligible;
    # interpret-mode on CPU, for tests), 'off' = always split.
    # Priced in round 4 (MFU.md r4q6): full_step 7.03 vs 6.03 ms split,
    # 863k vs 1.024M steady at quality parity — NEGATIVE result; stays
    # off as a gradient-exact tested variant.
    fused_train_step: str = "off"

    seed: int = 0

    @property
    def img_sample_size(self) -> int:
        return self.sample_size**2

    @property
    def save_every(self) -> int:
        return self.display_every * self.save_every_factor

    def model_config(self) -> CPPNConfig:
        """The reference's model params dict (run_nerf_acc.py:168-183)."""
        import jax.numpy as jnp

        return CPPNConfig(
            num_early_layers=self.num_layers,
            num_late_layers=0,
            num_filters=self.num_hidden_units,
            num_input_channels=3,
            # with viewdirs the model splits into rgb/alpha heads of
            # num_output_channels - 1 features each (the reference's own
            # head sizing, model/CPPN.py:120-131): 2 -> 1ch rgb + 1ch alpha
            num_output_channels=2 if self.num_input_channels_views > 0 else 1,
            num_input_channels_views=self.num_input_channels_views,
            use_bias=True,
            pos_enc=self.pos_enc,
            pos_enc_basis=self.pos_enc_basis,
            pos_enc_basis_views=self.pos_enc_basis_views,
            act_func="relu",
            fourier_sigma=self.fourier_sigma,
            num_img=1,
            dtype=jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32,
            input_scale=1.0 / self.outside,
        )

    @property
    def file_name(self) -> str:
        """Experiment file naming (run_nerf_acc.py:72-79, cathlab branch)."""
        return "clinical-angles"


# the reference-parity protocol knobs that round 4 flipped ON by default
# (run_nerf_acc.py:196-198 starts fully occupied and marches single-width;
# the production defaults carve + engage early + two-bucket march). One
# flag restores the strict behavior for apples-to-apples comparisons.
# Orthogonal exactness knobs keep their own fields: sampling_impl='gumbel'
# (exact pandas draw semantics), compute_dtype='float32'.
REFERENCE_STRICT_OVERRIDES = dict(
    carve_init=False,
    compact_engage_max=0,
    hybrid_split=0.0,
    hybrid_bucket_k=False,
)


def parse_train_args(argv=None) -> TrainConfig:
    """CLI shim with the exact reference flags and defaults
    (run_nerf_acc.py:25-47)."""
    p = argparse.ArgumentParser()
    p.add_argument("--limited_size", help="Angle range to sample the projections in")
    p.add_argument("--number_angles", help="Number of projections to sample per axis")
    p.add_argument("--center_point", help="Center point for the angle sampling")
    p.add_argument("--binary", help="Whether images are binary or not")
    p.add_argument(
        "--sampling_strategy",
        help="What sampling strategy to use, options: frangi, segmentation or random",
    )
    p.add_argument("--data_name", help="Either CT data or LCA data")
    p.add_argument("--num_layers", help="Number of layers for MLP")
    p.add_argument("--num_hidden_units", help="Number of hidden units for MLP")
    p.add_argument("--data_dir", default="data", help="dataset root directory")
    p.add_argument("--n_iters", default=None, help="override max iterations")
    p.add_argument("--grid_resolution", default=None, help="occupancy grid resolution")
    p.add_argument("--depth_samples", default=None, help="samples per ray")
    p.add_argument("--display_every", default=None, help="eval cadence")
    p.add_argument(
        "--pose_refine", action="store_true",
        help="learn a per-view camera translation jointly with the field "
        "(pair with datagen --max_shift_translation > 0)",
    )
    p.add_argument("--pose_lr", default=None, help="pose-shift Adam lr")
    p.add_argument(
        "--march_mode", default=None, choices=["window", "hybrid", "lattice"],
        help="compacted-march strategy (auto-falls back window->lattice)",
    )
    p.add_argument(
        "--mlp_backend", default=None, choices=["auto", "xla", "pallas"],
        help="density-MLP backend (auto = fused Pallas kernel on TPU)",
    )
    p.add_argument(
        "--feature_major_mlp", default=None, action="store_true",
        help="feed the fused MLP feature-major positions (skips the "
        "(P,3)->(8,P) input relayout on the Pallas path)",
    )
    p.add_argument(
        "--fused_train_step", default=None, choices=["auto", "on", "off"],
        help="whole-train-step fused Pallas kernel (MLP fwd + composite + "
        "loss grad + MLP bwd in one pallas_call); 'auto' = on-TPU when "
        "the march/model are eligible",
    )
    p.add_argument(
        "--sampling_impl", default=None, choices=["overdraw", "gumbel"],
        help="weighted ray sampler (overdraw = fast table sampler; "
        "gumbel = exact pandas successive-draw semantics)",
    )
    p.add_argument(
        "--carve_init", default=None, choices=["True", "False"],
        help="space-carving occupancy-grid init from unattenuated training "
        "rays (skips most of the dense warmup phase; auto-disabled with "
        "--pose_refine). Default True (production protocol)",
    )
    p.add_argument(
        "--compact_engage_max", default=None,
        help="interim compaction ladder cap: engage the compacted stepper "
        "early with k up to this value (0 = wait for compact_samples fit). "
        "Default 192 (production protocol)",
    )
    p.add_argument(
        "--hybrid_split", default=None,
        help="two-bucket hybrid march: fraction of the batch (sorted by "
        "span) marched at the smaller auto-tuned w_lo window (0 = off). "
        "Default 0.75 (round-4 queue14 gate)",
    )
    p.add_argument(
        "--hybrid_bucket_k", default=None, choices=["True", "False"],
        help="per-bucket compaction width for the two-bucket march: the "
        "narrow bucket emits an auto-tuned k_lo < k samples/ray to the MLP "
        "(needs --hybrid_split > 0). Default True (round-4 queue14 gate)",
    )
    p.add_argument(
        "--reference-strict", action="store_true", dest="reference_strict",
        help="restore the reference-parity training protocol: no carve "
        "init, no interim compaction engagement, single-bucket march "
        "(run_nerf_acc.py:196-198 semantics). Explicit per-knob flags "
        "still override on top",
    )
    a = p.parse_args(argv)

    kw = {}
    if a.limited_size is not None:
        kw["limited_size"] = float(a.limited_size)
    if a.number_angles is not None:
        kw["number_angles"] = float(a.number_angles)
    if a.center_point is not None:
        kw["center_point"] = tuple(ast.literal_eval(a.center_point))
    if a.binary is not None:
        kw["binary"] = a.binary == "True"
    if a.sampling_strategy is not None:
        kw["sampling_strategy"] = a.sampling_strategy
    if a.data_name:
        kw["data_name"] = a.data_name
    if a.num_layers:
        kw["num_layers"] = int(a.num_layers)
    if a.num_hidden_units:
        kw["num_hidden_units"] = int(a.num_hidden_units)
    if a.n_iters:
        kw["n_iters"] = int(a.n_iters)
    if a.grid_resolution:
        kw["grid_resolution"] = int(a.grid_resolution)
    if a.depth_samples:
        kw["depth_samples_per_ray"] = int(a.depth_samples)
    if a.display_every:
        kw["display_every"] = int(a.display_every)
    if a.pose_refine:
        kw["pose_refine"] = True
    if a.pose_lr:
        kw["pose_lr"] = float(a.pose_lr)
    if a.march_mode:
        kw["march_mode"] = a.march_mode
    if a.mlp_backend:
        kw["mlp_backend"] = a.mlp_backend
    if a.feature_major_mlp:
        kw["feature_major_mlp"] = True
    if a.fused_train_step:
        kw["fused_train_step"] = a.fused_train_step
    if a.sampling_impl:
        kw["sampling_impl"] = a.sampling_impl
    if a.reference_strict:
        kw.update(REFERENCE_STRICT_OVERRIDES)
    if a.carve_init is not None:
        kw["carve_init"] = a.carve_init == "True"
    if a.compact_engage_max is not None:
        kw["compact_engage_max"] = int(a.compact_engage_max)
    if a.hybrid_split is not None:
        kw["hybrid_split"] = float(a.hybrid_split)
    if a.hybrid_bucket_k is not None:
        kw["hybrid_bucket_k"] = a.hybrid_bucket_k == "True"
    cfg = TrainConfig(**kw)
    return cfg, a.data_dir


def categories_for(cfg: TrainConfig) -> list[str]:
    """Experiment categorization (run_nerf_acc.py:49-54)."""
    cats = ["Background"]
    if cfg.binary:
        cats = ["Sparse projections", "Limited projections"]
    if cfg.num_hidden_units != 128 or cfg.num_layers != 4:
        cats = ["Model architecture"]
    return cats
