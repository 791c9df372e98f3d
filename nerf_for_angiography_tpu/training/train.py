"""Jitted training runtime: the TPU-native redesign of the reference's hot
loop (nerf/run_nerf_acc.py:263-440).

Per-iteration structure kept at exact semantic parity (ref lines inline),
but everything — BARF anneal, occupancy EMA updates, weighted ray sampling,
grid-pruned marching, MLP eval, Beer-Lambert compositing, Adam + exp-decay —
is ONE jitted XLA program per step. The reference instead crosses the
host/device boundary multiple times per iteration (pandas sampling!) and
evaluates the MLP twice per sample (alpha_fn during marching + the grad
pass, SURVEY.md §3.1); here the single sigma evaluation serves both the
stop-gradient pruning mask and the differentiable composite.

Multi-chip: the ray batch shards over a 1-D mesh; the loss mean over the
global batch makes XLA emit the gradient ``psum`` over ICI. Params/grids are
replicated (the MLP is ~50k params — TP/PP are pointless, SURVEY.md §2).
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import CPPN, barf_alpha_schedule, init_cppn
from ..ops.occupancy import (
    BucketedRays,
    OccupancyGrid,
    coarse_window,
    create_grid,
    every_n_step,
    every_n_step_pair,
    march_rays,
    march_rays_hybrid,
    march_rays_hybrid2,
    march_rays_hybrid2k,
    march_rays_window,
    prune_mask,
    safe_occ_stride,
)
from ..ops.rendering import psnr_from_mse
from ..ops.sampling import RayDataset, sample_pixel_rays
from .config import TrainConfig


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    grid: OccupancyGrid  # scene grid, alpha_thre=1e-4 (run_nerf_acc.py:197)
    vessel_grid: OccupancyGrid  # vessel grid, 5e-2 (run_nerf_acc.py:198)
    step: jnp.ndarray
    key: jax.Array


class TestView(NamedTuple):
    """Held-out view tensors (run_nerf_acc.py:84-107)."""

    origins: jnp.ndarray  # (P, 3)
    directions: jnp.ndarray  # (P, 3)
    pixel_values: jnp.ndarray  # (P,)
    vessel_mask: jnp.ndarray  # (P,) bool: distance_pixel_value > mean
    x_positions: jnp.ndarray
    y_positions: jnp.ndarray
    img_width: int
    img_height: int


def make_test_view(rays: RayDataset, view_index: int, rays_per_view: int) -> TestView:
    """Slice the last (custom) view out of the dataset as the test view —
    the reference uses proj_df.index[-1] (run_nerf_acc.py:85)."""
    s = view_index * rays_per_view
    e = s + rays_per_view
    w = rays.weights[s:e]
    xp = np.asarray(rays.x_positions[s:e])
    yp = np.asarray(rays.y_positions[s:e])
    return TestView(
        origins=rays.origins[s:e],
        directions=rays.directions[s:e],
        pixel_values=rays.pixel_values[s:e],
        vessel_mask=w > jnp.mean(w),
        x_positions=rays.x_positions[s:e],
        y_positions=rays.y_positions[s:e],
        img_width=int(xp.max()) + 1,
        img_height=int(yp.max()) + 1,
    )


def drop_test_view(rays: RayDataset, view_index: int, rays_per_view: int) -> RayDataset:
    """Training rays = all views except the held-out one. Any cached
    sampling table is dropped — it indexes the OLD ray set and must be
    rebuilt for the reduced one (training/loop.py does)."""
    s = view_index * rays_per_view
    e = s + rays_per_view
    take = lambda a: jnp.concatenate([a[:s], a[e:]], axis=0)  # noqa: E731
    per_ray = (
        "origins", "directions", "pixel_values", "weights", "image_ids",
        "x_positions", "y_positions",
    )
    return RayDataset(
        **{name: take(getattr(rays, name)) for name in per_ray},
        sampling_table=None,
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with the reference's continuous exponential lr decay
    lr * 0.1^(step/500k) (run_nerf_acc.py:322-328). With pose refinement,
    the per-view shifts get their own Adam at cfg.pose_lr (translations
    live at mm scale — the field lr would take ~10^4 steps per mm)."""
    schedule = optax.exponential_decay(
        init_value=cfg.coarse_lr,
        transition_steps=cfg.decay_steps,
        decay_rate=cfg.decay_rate,
        staircase=False,
    )
    base = optax.adam(learning_rate=schedule)
    if not cfg.pose_refine:
        return base

    def labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: (
                "pose"
                if any(getattr(k, "key", None) == "view_shifts" for k in path)
                else "model"
            ),
            params,
        )

    pose_schedule = lambda step: jnp.where(  # noqa: E731
        step < cfg.pose_start, 0.0, cfg.pose_lr
    )
    # adamw: the decay pulls the near-unobservable along-ray component of
    # each shift toward the minimum-norm solution (see TrainConfig)
    return optax.multi_transform(
        {
            "model": base,
            "pose": optax.adamw(
                pose_schedule, weight_decay=cfg.pose_weight_decay
            ),
        },
        labels,
    )


def create_train_state(
    cfg: TrainConfig, key: jax.Array, num_views: int | None = None
) -> tuple[CPPN, TrainState]:
    k_model, k_loop = jax.random.split(key)
    model, params = init_cppn(cfg.model_config(), k_model)
    if cfg.pose_refine:
        if not num_views:
            raise ValueError("pose_refine needs num_views")
        # per-view learnable world translations live INSIDE the params
        # collection (flax ignores extra entries; checkpoints/optimizer
        # pick them up for free). Generalizes CPPN.py:133-135 img1/img2.
        params = {"params": dict(params["params"])}
        params["params"]["view_shifts"] = jnp.zeros((num_views, 3), jnp.float32)
    tx = make_optimizer(cfg)
    aabb = jnp.array([-cfg.outside] * 3 + [cfg.outside] * 3, jnp.float32)
    grid = create_grid(aabb, cfg.grid_resolution)
    # distinct buffers for the second grid — both live in one donated
    # TrainState and XLA rejects donating an aliased buffer twice
    vessel_grid = jax.tree.map(lambda x: jnp.array(x, copy=True), grid)
    return model, TrainState(
        params=params,
        opt_state=tx.init(params),
        grid=grid,
        vessel_grid=vessel_grid,
        step=jnp.zeros((), jnp.int32),
        key=k_loop,
    )


def _pallas_eligible(model: CPPN) -> bool:
    """The fused kernel covers the relu density stack for pos_enc 'none'
    (ops/pallas/fused_mlp.py::fused_mlp_raw) AND 'fourier'/'barf'
    (fused_mlp_enc_raw — the encode runs in-kernel as a tiny matmul +
    row-selected sin/cos). Covers the flagship 4x128, both reference
    variants (2x128 / 4x64), and the BARF/fourier configs of CPPN.py:62-94."""
    c = model.config
    enc_ok = c.pos_enc == "none" or (
        c.pos_enc in ("fourier", "barf") and c.pos_enc_basis > 0
    )
    return (
        enc_ok
        and c.act_func == "relu"
        and c.num_late_layers == 0
        and c.num_input_channels == 3
        and c.num_input_channels_views == 0
        and c.num_output_channels == 1
    )


def density_raw(
    model: CPPN, params, pts: jnp.ndarray, barf_alpha=0.0, backend: str = "auto"
) -> jnp.ndarray:
    """Raw 1-channel density at pts (P, 3) -> (P,).

    backend='pallas' routes through the fused VMEM-resident MLP kernel
    (ops/pallas/fused_mlp.py — 2.4x measured fwd+bwd vs XLA at the flagship
    shape on v5e); 'auto' does so on a TPU backend when the model config is
    eligible; 'xla' (and ineligible/CPU 'auto') uses the flax path.
    """
    use = False
    if backend == "pallas":
        if not _pallas_eligible(model):
            raise ValueError(
                "mlp_backend='pallas' needs pos_enc='none', relu, no view "
                "branch/late layers (got an ineligible CPPNConfig)"
            )
        use = True
    elif backend == "auto":
        use = _pallas_eligible(model) and jax.devices()[0].platform in (
            "tpu",
            "axon",
        )
    if use:
        from ..ops.pallas.fused_mlp import (
            cppn_params_to_list,
            fused_mlp_enc_raw,
            fused_mlp_raw,
        )

        # pallas through the axon tunnel needs the remote-compile shim
        os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
        c = model.config
        plist = cppn_params_to_list(params, c.num_early_layers)
        x = pts * c.input_scale
        if c.pos_enc == "none":
            return fused_mlp_raw(plist, x)
        if c.pos_enc == "fourier":
            enc = {"coeff": params["params"]["fourier_coefficients_pts"]}
        else:  # barf: window weights at the current anneal alpha
            from ..models import barf_k_values, barf_weights

            enc = {
                "w": barf_weights(
                    barf_alpha, barf_k_values(c.pos_enc_basis, 3)
                )
            }
        return fused_mlp_enc_raw((c.pos_enc, c.pos_enc_basis), plist, enc, x)
    return model.apply(params, pts, barf_alpha=barf_alpha)[..., -1]


def density_raw_fm(
    model: CPPN, params, pts_fm: jnp.ndarray, barf_alpha=0.0,
    backend: str = "auto",
) -> jnp.ndarray:
    """density_raw for a FEATURE-MAJOR (3, P) point block.

    On the fused-kernel path (pallas-eligible pos_enc='none' model on TPU)
    this feeds fused_mlp_raw_fm directly — no (P, 3) -> (8, P) relayout
    anywhere. Every other configuration transposes back and defers to
    density_raw (correctness fallback; callers only build feature-major
    input when cfg.feature_major_mlp asks for it)."""
    use = False
    if backend in ("pallas", "auto") and _pallas_eligible(model):
        if model.config.pos_enc == "none":
            use = backend == "pallas" or jax.devices()[0].platform in (
                "tpu",
                "axon",
            )
    if use:
        from ..ops.pallas.fused_mlp import cppn_params_to_list, fused_mlp_raw_fm

        os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
        c = model.config
        plist = cppn_params_to_list(params, c.num_early_layers)
        x8 = jnp.pad(pts_fm * c.input_scale, ((0, 8 - pts_fm.shape[0]), (0, 0)))
        return fused_mlp_raw_fm(plist, x8)
    return density_raw(model, params, pts_fm.T, barf_alpha, backend)


def _sigma_fn(model: CPPN, params, barf_alpha, backend: str = "auto"):
    """Density field closure: sigmoid of the 1-channel MLP output
    (nerf_helpers_acc.py:22-24, 66-70)."""

    def fn(pts):
        return jax.nn.sigmoid(density_raw(model, params, pts, barf_alpha, backend))

    return fn


def _march_for(
    cfg: TrainConfig,
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    near: float,
    far: float,
):
    """Marching strategy dispatch. Dense lattice when compaction is off;
    with compaction, 'window' (contiguous lattice window via the dilated
    coarse grid — zero gathers) or 'lattice' (per-sample fine-grid query +
    top-k compaction, nerfacc-strict masking) per cfg.march_mode."""
    compacting = 0 < cfg.compact_samples < cfg.depth_samples_per_ray
    if compacting and cfg.march_mode == "window":
        return march_rays_window(
            grid, origins, directions, cfg.depth_samples_per_ray, near, far,
            k=cfg.compact_samples, aabb_extent=2 * cfg.outside,
        )
    if compacting and cfg.march_mode == "hybrid":
        stride = safe_occ_stride(
            cfg.occ_stride, cfg.depth_samples_per_ray, near, far,
            2 * cfg.outside, cfg.grid_resolution,
        )
        if cfg.hybrid_split > 0.0 and cfg.hybrid_w_lo > 0:
            if cfg.hybrid_bucket_k and cfg.hybrid_k_lo > 0:
                return march_rays_hybrid2k(
                    grid, origins, directions, cfg.depth_samples_per_ray,
                    near, far, k=cfg.compact_samples, k_lo=cfg.hybrid_k_lo,
                    w_lo=cfg.hybrid_w_lo, w_cap=cfg.hybrid_w_cap or None,
                    split=cfg.hybrid_split, aabb_extent=2 * cfg.outside,
                    occ_stride=stride, fka=cfg.march_fka,
                )
            return march_rays_hybrid2(
                grid, origins, directions, cfg.depth_samples_per_ray,
                near, far, k=cfg.compact_samples,
                w_lo=cfg.hybrid_w_lo, w_cap=cfg.hybrid_w_cap or None,
                split=cfg.hybrid_split, aabb_extent=2 * cfg.outside,
                occ_stride=stride, fka=cfg.march_fka,
            )
        return march_rays_hybrid(
            grid, origins, directions, cfg.depth_samples_per_ray, near, far,
            k=cfg.compact_samples, w_cap=cfg.hybrid_w_cap or None,
            aabb_extent=2 * cfg.outside,
            occ_stride=stride, fka=cfg.march_fka,
        )
    return march_rays(
        grid, origins, directions, cfg.depth_samples_per_ray, near, far,
        compact_k=cfg.compact_samples if compacting else None,
        occ_stride=safe_occ_stride(
            cfg.occ_stride, cfg.depth_samples_per_ray, near, far,
            2 * cfg.outside, cfg.grid_resolution,
        ),
        fka=cfg.march_fka,
    )


@functools.lru_cache(maxsize=32)
def _jitted_chooser_stats(
    n: int, near: float, far: float, k: int, aabb_extent: float,
    split: float = 0.0,
):
    """ONE jitted device probe for the compact-mode chooser, reduced to
    five int32 scalars on device:

      ac     — max per-ray active sample count (lattice width)
      span   — max per-ray (last active - coarse-window start + 1), the
               hybrid candidate-window requirement. Measured from the
               UNCLAMPED window start: march_rays_hybrid's far-end clamp
               (w = clip(start, 0, n - w_cap)) only moves the window
               earlier, so start-based span <= w_cap guarantees coverage
      win_w  — max per-ray (last active - k-window start + 1), the
               'window' mode width
      span_q — with split > 0: the ``split``-quantile of the COARSE span
               (window end - start + 1, the hybrid2 sort key) over
               HIT rays — sizes the two-bucket march's w_lo. Hit-only
               because the probe rays are a uniform view while the train
               batch is importance-weighted onto the vessel (~all hits);
               the hit-only quantile tracks the batch's. 0 when split=0.
      ac_lo  — with split > 0: the max ACTIVE sample count among the lo
               bucket's rays (hit rays whose coarse span <= span_q) —
               sizes the per-bucket k_lo (march_rays_hybrid2k). The lo
               bucket's march keeps at most min(ac_lo, w_lo) actives, so
               k_lo >= that is lossless within the bucket. 0 when split=0.

    Unjitted, every march op is a separate dispatch through the tunnel
    (~1.3 ms each); worse, the previous implementation shipped the whole
    (R, n_samples) dense mask to the host per check — ~12 MB through the
    tunnel at eval cadence. Reduced on device, the transfer is 16 bytes.
    lru-cached so the production loop's periodic checks never re-trace."""

    def stats(g, o, d):
        dm = march_rays(g, o, d, n, near, far).mask > 0
        ac = jnp.max(jnp.sum(dm, axis=-1))
        has = jnp.any(dm, axis=-1)
        last = dm.shape[-1] - 1 - jnp.argmax(dm[..., ::-1], axis=-1)
        c_start, c_end, c_hit = coarse_window(
            g, o, d, n, near, far, aabb_extent=aabb_extent
        )
        start = jnp.maximum(c_start, 0)
        span = jnp.max(jnp.where(has, last - start + 1, 0))
        t0 = march_rays_window(
            g, o, d, n, near, far, k=k, aabb_extent=aabb_extent
        ).t_starts[:, 0]
        step_sz = (far - near) / n
        w0 = jnp.round((t0 - near) / step_sz).astype(jnp.int32)
        win_w = jnp.max(jnp.where(has, last - w0 + 1, 0))
        if split > 0.0:
            # hit-only quantile with static shapes: sort the per-ray
            # coarse spans DESCENDING (misses carry 0, hits >= 1 sort
            # first), then index the split-quantile rank among the n_hit
            # leading entries with a traced scalar index
            cspan = jnp.where(c_hit, c_end - c_start + 1, 0).astype(jnp.int32)
            sq = jnp.sort(cspan)[::-1]
            n_hit = jnp.sum(c_hit.astype(jnp.int32))
            idx = jnp.clip(
                n_hit - jnp.ceil(split * n_hit).astype(jnp.int32),
                0, cspan.shape[0] - 1,
            )
            span_q = sq[idx]
            # lo-bucket active-count max: the rays hybrid2k's span sort
            # puts in the lo bucket are exactly those with cspan <= the
            # split quantile — their max active count sizes k_lo
            counts = jnp.sum(dm, axis=-1).astype(jnp.int32)
            lo_sel = c_hit & (cspan <= span_q)
            ac_lo = jnp.max(jnp.where(lo_sel, counts, 0))
        else:
            span_q = jnp.zeros((), jnp.int32)
            ac_lo = jnp.zeros((), jnp.int32)
        return jnp.stack([
            ac.astype(jnp.int32), span.astype(jnp.int32),
            win_w.astype(jnp.int32), span_q.astype(jnp.int32),
            ac_lo.astype(jnp.int32),
        ])

    return jax.jit(stats)


def _chooser_stats(cfg, grid, origins, directions, near, far):
    fn = _jitted_chooser_stats(
        cfg.depth_samples_per_ray, near, far, cfg.compact_samples,
        2 * cfg.outside, getattr(cfg, "hybrid_split", 0.0),
    )
    ac, span, win_w, span_q, ac_lo = (
        int(v) for v in np.asarray(fn(grid, origins, directions))
    )
    return ac, span, win_w, span_q, ac_lo


def compact_switch_width(
    cfg: TrainConfig,
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    near: float,
    far: float,
    mode: str | None = None,
) -> int:
    """Max per-ray sample width the compacted stepper would need to render
    these rays losslessly — the auto-switch criterion (switch when this is
    <= ~0.9 * cfg.compact_samples).

    'lattice' mode keeps the first k ACTIVE samples: width = max active
    count. 'window' mode keeps k CONSECUTIVE samples from the conservative
    window start: width = max over rays of (last active - window start + 1).
    'hybrid' keeps k active samples within a span-sized w_cap window:
    width = max active count when the span-derived window stays cheaper
    than the lattice march (hybrid_w_cap_for <= _max_hybrid_w_cap), else
    n_samples (never engages).
    """
    mode = cfg.march_mode if mode is None else mode
    n = cfg.depth_samples_per_ray
    ac, span, win_w, _, _ = _chooser_stats(
        cfg, grid, origins, directions, near, far
    )
    if mode == "lattice":
        return ac
    if mode == "window":
        return win_w
    return ac if hybrid_w_cap_for(span, n) <= _max_hybrid_w_cap(n) else n


def hybrid_w_cap_for(span: int, n_samples: int) -> int:
    """Adaptive hybrid candidate window: the measured worst-ray span,
    bucketed to 16 (compiled steppers are cached per (mode, k, w_cap) —
    buckets bound tunnel recompiles), floored at hybrid_w_cap's static
    160. NO grid-evolution margin, deliberately: the fine-probe count —
    the step's top cost — scales with w_cap, and the loop re-measures and
    GROWS w_cap at display cadence (training/loop.py), so a margin buys
    nothing but gathers (a 15% margin measured 4.60 vs 4.46 ms/step at
    the flagship bench: span 157 -> w_cap 192 instead of 160). Round-2
    used a fixed 160; jittered grid updates fatten spans past 160, and a
    fixed cap made the chain fall through to the ~20% slower lattice
    march instead of paying a few extra fine probes."""
    return min(n_samples, max(160, -(-int(span) // 16) * 16))


def _max_hybrid_w_cap(n_samples: int) -> int:
    """Beyond ~3/4 of the lattice the hybrid's fine-probe count approaches
    the lattice march's while still paying the coarse-window pass — let
    the chain fall through to 'lattice' there."""
    return max(160, (3 * n_samples) // 4)


def hybrid_w_lo_for(span_q: int, w_cap: int) -> int:
    """Two-bucket march: lo-bucket window from the measured hit-ray span
    quantile, bucketed to 16 (bounds stepper recompiles, like
    hybrid_w_cap_for) PLUS one 16-bucket of margin — unlike w_cap, an
    undersized w_lo truncates ACTIVE samples of narrow rays whenever a
    step's batch quantile lands above the probe's (the probe is one fixed
    ray set; batches resample every step), and the margin prices at only
    ``split`` of the probe bill. Floor 32; capped at w_cap (at which
    point the split is pointless and the caller disables it)."""
    return min(w_cap, max(32, -(-int(span_q) // 16) * 16 + 16))


class CompactChoice(NamedTuple):
    """Compacted-march tuning from the chooser's probe: the mode, the
    measured lossless active width (sizes k via compact_k_for), for
    'hybrid' the span-sized candidate window (0 = mode has no window),
    with cfg.hybrid_split > 0 the two-bucket lo window (0 = single
    bucket), and with cfg.hybrid_bucket_k the measured lo-bucket active
    width (sizes k_lo via compact_k_lo_for; 0 = single k)."""

    mode: str
    width: int
    w_cap: int = 0
    w_lo: int = 0
    width_lo: int = 0


def choose_compact_mode(
    cfg: TrainConfig,
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    near: float,
    far: float,
) -> CompactChoice | None:
    """Pick the cheapest compacted march that renders these rays losslessly
    at k = cfg.compact_samples, or None if none fits yet.

    'window' needs the active SPAN (incl. gaps) to fit k; rays crossing
    several vessel branches have spans far above their active counts, so it
    falls back to 'hybrid' (span-sized candidate window) and finally
    'lattice' (top-k on active samples) before giving up — measured at the
    flagship bench the worst-ray span is ~157-180 vs an active count that
    fits 96, so hybrid is what actually engages there.
    """
    if not (0 < cfg.compact_samples < cfg.depth_samples_per_ray):
        return None
    budget = int(0.9 * cfg.compact_samples)
    # interim engagement (compact_engage_max > compact_samples): accept a
    # width above the final budget while it still fits the interim cap —
    # compact_k_for sizes k into the coarse 32-bucket interim ladder and
    # the loop shrinks it as the grid prunes. Converts most of the ~4x
    # slower dense phase into compacted stepping, still lossless.
    emax = getattr(cfg, "compact_engage_max", 0)
    if emax > cfg.compact_samples:
        budget = int(0.9 * min(emax, cfg.depth_samples_per_ray - 1))
    n = cfg.depth_samples_per_ray
    chains = {
        "window": ("window", "hybrid", "lattice"),
        "hybrid": ("hybrid", "lattice"),
    }
    modes = chains.get(cfg.march_mode, (cfg.march_mode,))
    # ONE jitted device probe shared across the whole mode chain, reduced
    # to four scalars on device (_jitted_chooser_stats)
    ac, span, win_w, span_q, ac_lo = _chooser_stats(
        cfg, grid, origins, directions, near, far
    )
    def hybrid_candidate() -> CompactChoice | None:
        wcap = hybrid_w_cap_for(span, n)
        if ac > budget or wcap > _max_hybrid_w_cap(n):
            return None
        w_lo = 0
        width_lo = 0
        if getattr(cfg, "hybrid_split", 0.0) > 0.0:
            w_lo = hybrid_w_lo_for(span_q, wcap)
            if w_lo >= wcap:
                w_lo = 0  # no narrow majority — single bucket
            elif getattr(cfg, "hybrid_bucket_k", False):
                # the lo bucket's march keeps <= min(ac_lo, w_lo)
                # active samples — the lossless k_lo requirement
                width_lo = min(ac_lo, w_lo)
        return CompactChoice("hybrid", ac, wcap, w_lo, width_lo)

    for mode in modes:
        if mode == "window" and win_w <= budget:
            # Measured preference (benchmarks/MFU.md "per-bucket k",
            # QUALITY.md round-3 table): the chain order prefers the
            # cheap window march, but when the per-bucket-k hybrid is
            # configured AND engages, its effective MLP point count
            # (split*k_lo + (1-split)*k) can undercut the window's k by
            # far more than the hybrid march overhead costs (~0.4 ms ≈
            # 32 samples/ray at the flagship shapes: window@k128 stepped
            # 4.59 ms vs hybrid2k@k_eff60 3.84 ms). Prefer hybrid2k when
            # it wins by more than that overhead margin.
            if (
                getattr(cfg, "hybrid_bucket_k", False)
                and getattr(cfg, "hybrid_split", 0.0) > 0.0
            ):
                hyb = hybrid_candidate()
                if hyb is not None and hyb.width_lo:
                    k_win = compact_k_for(win_w, cfg)
                    k_h = compact_k_for(hyb.width, cfg)
                    k_lo = compact_k_lo_for(hyb.width_lo, k_h, cfg)
                    if k_lo:
                        s = cfg.hybrid_split
                        k_eff = s * k_lo + (1.0 - s) * k_h
                        if k_eff + 32 <= k_win:
                            return hyb
            return CompactChoice("window", win_w)
        if mode == "hybrid":
            hyb = hybrid_candidate()
            if hyb is not None:
                return hyb
        if mode == "lattice" and ac <= budget:
            return CompactChoice("lattice", ac)
    return None


def compact_k_for(width: int, cfg: TrainConfig) -> int:
    """Runtime compaction width: the measured lossless width plus a
    grid-evolution margin (cfg.compact_k_margin) for drift between
    re-checks, rounded up to a multiple of 8 (f32 sublane tile), capped at
    the configured budget. The compacted step's MLP cost is linear in k,
    so sizing k to the measured width instead of always paying
    cfg.compact_samples is a direct throughput win. (Round 2 rounded to 16
    for the one-hot mask einsum's lane axis; that einsum is gone —
    sort_key_val compaction — and the coarser bucket cost a full 80->96
    jump when jittered grid updates nudged the measured width from 69 to
    73.)"""
    margin = getattr(cfg, "compact_k_margin", 1.15)
    k = int(np.ceil(width * margin / 8)) * 8
    if k <= cfg.compact_samples:
        return max(16, k)
    # interim ladder (compact_engage_max): k above the configured budget is
    # bucketed to 32 — a handful of distinct (mode, k) programs per run,
    # all shared across runs via the persistent XLA cache — and capped at
    # the engage max (>= width by choose_compact_mode's 0.9 slack, so the
    # march stays lossless; only the evolution margin thins).
    emax = getattr(cfg, "compact_engage_max", 0)
    if emax > cfg.compact_samples:
        k32 = int(np.ceil(width * margin / 32)) * 32
        return max(16, min(k32, emax))
    return max(16, min(k, cfg.compact_samples))


def compact_k_lo_for(width_lo: int, k: int, cfg: TrainConfig) -> int:
    """Runtime lo-bucket compaction width for the per-bucket-k march
    (march_rays_hybrid2k): the measured lo-bucket lossless width
    (CompactChoice.width_lo = min(ac_lo, w_lo)) with the same
    grid-evolution margin and 8-rounding as compact_k_for, capped at k.
    Returns 0 when the bucket-k split buys nothing (k_lo would reach k) —
    callers fall back to the single-k march."""
    if width_lo <= 0:
        return 0
    margin = getattr(cfg, "compact_k_margin", 1.15)
    k_lo = max(16, int(np.ceil(width_lo * margin / 8)) * 8)
    return 0 if k_lo >= k else k_lo


def _flat_positions(m) -> jnp.ndarray:
    """Sample positions of a march result as one (P, 3) point batch — for
    BucketedRays the two buckets concatenate (lo first) so ONE MLP call
    serves both."""
    if isinstance(m, BucketedRays):
        return jnp.concatenate(
            [m.lo.positions.reshape(-1, 3), m.hi.positions.reshape(-1, 3)],
            axis=0,
        )
    return m.positions.reshape(-1, 3)


def _flat_positions_fm(m, origins, directions) -> jnp.ndarray:
    """Sample positions of a march result as one FEATURE-MAJOR (3, P)
    block — the layout ops/pallas/fused_mlp.py::fused_mlp_raw_fm consumes
    without the (P, 3) -> (8, P) relayout fused_mlp_raw's wrapper pays.

    Positions are recomputed affinely from the march's compacted t values
    (the same o + d * t_mid the march materializes point-major); inside
    one jitted step XLA dead-code-eliminates the unused (R, k, 3)
    ``m.positions`` array. Midpoint recompute (t_starts + t_ends) / 2
    equals the march's t_mid up to 1 ulp f32."""

    def fm(mm, o, d):
        t_mid = (mm.t_starts + mm.t_ends) * 0.5  # (R, k)
        pts = o.T[:, :, None] + d.T[:, :, None] * t_mid[None]  # (3, R, k)
        return pts.reshape(3, -1)

    if isinstance(m, BucketedRays):
        o_s = jnp.take(origins, m.perm, axis=0)
        d_s = jnp.take(directions, m.perm, axis=0)
        cut = m.lo.t_starts.shape[0]
        return jnp.concatenate(
            [fm(m.lo, o_s[:cut], d_s[:cut]), fm(m.hi, o_s[cut:], d_s[cut:])],
            axis=1,
        )
    return fm(m, origins, directions)


def _bucket_sigmas(m, raw: jnp.ndarray):
    """Split the flat MLP output back into per-bucket (R_b, k_b) sigma
    blocks: [(marched, sigma), ...] — one entry for a rectangular march."""
    if isinstance(m, BucketedRays):
        n_lo = m.lo.mask.shape[0] * m.lo.mask.shape[1]
        sig = jax.nn.sigmoid(raw)
        return [
            (m.lo, sig[:n_lo].reshape(m.lo.mask.shape)),
            (m.hi, sig[n_lo:].reshape(m.hi.mask.shape)),
        ]
    return [(m, jax.nn.sigmoid(raw).reshape(m.mask.shape))]


def _raw_for(model, params, m, origins, directions, cfg, barf_alpha):
    """MLP raw densities for a march result — feature-major when
    cfg.feature_major_mlp asks for it (skips the (P, 3) -> (8, P) input
    relayout on the fused-kernel path), point-major otherwise. Output is
    the same flat (P,) array in bucket-concatenation order either way."""
    if getattr(cfg, "feature_major_mlp", False):
        return density_raw_fm(
            model, params, _flat_positions_fm(m, origins, directions),
            barf_alpha, cfg.mlp_backend,
        )
    return density_raw(
        model, params, _flat_positions(m), barf_alpha, cfg.mlp_backend
    )


def _keep_mask(m, sigma: jnp.ndarray, cfg: TrainConfig) -> tuple:
    """(dists, keep) for one rectangular bucket.

    nerfacc's alpha_thre exists to SKIP compute for negligible samples; we
    evaluate the lattice densely anyway, so applying it as a hard mask
    only changes the pixel by <= alpha_thre per sample while ZEROING the
    gradient. Worse, a transiently all-transparent field (sigmoid < 1.5e-4
    everywhere — routine after the initial brighten-everything phase on
    mostly-white targets) would never recover: every sample pruned, every
    gradient dead. Keep it available (train_alpha_prune) for strict
    ablations; default off. early_stop_eps is retained — it only bites on
    opaque rays where the leading samples still carry gradient."""
    dists = m.t_ends - m.t_starts
    keep = prune_mask(
        sigma, dists, m.mask,
        cfg.alpha_thre if cfg.train_alpha_prune else 0.0,
        cfg.early_stop_eps,
    )
    return dists, jax.lax.stop_gradient(keep)


def _fused_step_eligible(model: CPPN, cfg: TrainConfig) -> bool:
    """Whether the whole-train-step fused kernel (ops/pallas/fused_step.py)
    can replace the split fwd/bwd pair for this model/config.

    Requirements beyond _pallas_eligible: pos_enc 'none' (the encoded
    variants keep the split kernels), no pose refinement (positions must
    be non-differentiable — the kernel returns only parameter grads) and
    no alpha-threshold pruning (the kernel replays nerfacc's
    early_stop_eps transmittance mask only). 'on' forces it (interpret
    mode off-TPU, for tests); 'auto' engages on a TPU backend."""
    mode = getattr(cfg, "fused_train_step", "off")
    if mode == "off":
        return False
    c = model.config
    ok = (
        c.pos_enc == "none"
        and _pallas_eligible(model)
        and not cfg.pose_refine
        and not cfg.train_alpha_prune
        and cfg.mlp_backend in ("auto", "pallas")
    )
    if mode == "on":
        if not ok:
            raise ValueError(
                "fused_train_step='on' needs pos_enc='none', relu, no "
                "pose_refine/train_alpha_prune and a pallas-capable "
                "mlp_backend (got an ineligible model/config)"
            )
        return True
    return ok and jax.devices()[0].platform in ("tpu", "axon")


def _fused_loss_and_grads(
    model: CPPN, params, grid, origins, directions, targets, cfg, near, far
):
    """One-pallas_call loss gradient: march, then fold MLP forward +
    Beer-Lambert composite + MSE gradient + MLP backward into
    ops/pallas/fused_step.py::fused_step_grads (per bucket on the
    two-bucket march — each bucket is a rectangular (R_b, k_b) lattice and
    every ray lives in exactly one bucket, so the buckets' parameter grads
    sum). Returns (loss, pixels, march, grads_pytree) with grads exactly
    matching jax.grad of the split path (tests/test_fused_step.py::
    test_train_wiring_dense_march / test_train_wiring_two_bucket_march)."""
    from ..ops.pallas.fused_mlp import cppn_params_to_list, list_grads_to_cppn
    from ..ops.pallas.fused_step import fused_step_grads

    os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
    c = model.config
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    kw = dict(
        step=(far - near) / cfg.depth_samples_per_ray,
        early_stop_eps=cfg.early_stop_eps,
        n_rays_loss=origins.shape[0],
        input_scale=c.input_scale,
        interpret=interpret,
    )
    plist = cppn_params_to_list(params, c.num_early_layers)
    m = _march_for(cfg, grid, origins, directions, near, far)
    if isinstance(m, BucketedRays):
        o_s = jnp.take(origins, m.perm, axis=0)
        d_s = jnp.take(directions, m.perm, axis=0)
        t_s = jnp.take(targets, m.perm, axis=0)
        cut = m.lo.t_starts.shape[0]
        px_lo, g_lo = fused_step_grads(
            plist, o_s[:cut], d_s[:cut],
            (m.lo.t_starts + m.lo.t_ends) * 0.5, m.lo.mask, t_s[:cut], **kw,
        )
        px_hi, g_hi = fused_step_grads(
            plist, o_s[cut:], d_s[cut:],
            (m.hi.t_starts + m.hi.t_ends) * 0.5, m.hi.mask, t_s[cut:], **kw,
        )
        pixels = jnp.take(jnp.concatenate([px_lo, px_hi]), m.inv, axis=0)
        glist = [
            (gw_l + gw_h, gb_l + gb_h)
            for (gw_l, gb_l), (gw_h, gb_h) in zip(g_lo, g_hi)
        ]
    else:
        pixels, glist = fused_step_grads(
            plist, origins, directions,
            (m.t_starts + m.t_ends) * 0.5, m.mask, targets, **kw,
        )
    grads = list_grads_to_cppn(glist, params, c.num_early_layers)
    loss = jnp.mean((pixels - targets) ** 2)
    return loss, pixels, m, grads


def render_rays(
    model: CPPN,
    params,
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: TrainConfig,
    near: float,
    far: float,
    barf_alpha=0.0,
    binary_thresh: float | None = None,
    return_march: bool = False,
):
    """Grid-pruned masked render of a ray batch (differentiable wrt params).

    Equivalent of acc_ray_marching + get_predictions +
    acc_render_volume_density (run_nerf_acc.py:287-296) in one fused pass.
    With ``binary_thresh``, densities below it are zeroed — the reference's
    ``zero_idx`` binary render (nerf_helpers_acc.py:50-51,
    visualization.py:348-352). ``cfg.compact_samples > 0`` gathers only the
    first k occupied samples per ray before the MLP (the nerfacc-style
    skip-empty-space speedup, ops/occupancy.py::compact_rays).

    Returns (pixels, sigma, keep). pixels is always in INPUT ray order;
    with the two-bucket per-k march engaged (hybrid_bucket_k — the march
    returns BucketedRays) the per-sample sigma/keep are FLAT (P,) arrays in
    bucket-concatenation order, since the buckets' per-ray sample counts
    differ by design. No in-tree consumer reads them in that mode.
    ``return_march=True`` appends the raw march result (MarchedRays or
    BucketedRays) for truncation-pressure accounting (march_pressure).
    """
    m = _march_for(cfg, grid, origins, directions, near, far)
    raw = _raw_for(model, params, m, origins, directions, cfg, barf_alpha)
    if isinstance(m, BucketedRays):
        parts, sigmas, keeps = [], [], []
        for mb, sb in _bucket_sigmas(m, raw):
            dists, keep = _keep_mask(mb, sb, cfg)
            if binary_thresh is not None:
                sb = jnp.where(sb < binary_thresh, 0.0, sb)
            parts.append(jnp.exp(-jnp.sum(sb * keep * dists, axis=-1)))
            sigmas.append(sb.reshape(-1))
            keeps.append(keep.reshape(-1))
        pixels = jnp.take(jnp.concatenate(parts), m.inv, axis=0)
        if return_march:
            return pixels, jnp.concatenate(sigmas), jnp.concatenate(keeps), m
        return pixels, jnp.concatenate(sigmas), jnp.concatenate(keeps)
    ((_, sigma),) = _bucket_sigmas(m, raw)
    dists, keep = _keep_mask(m, sigma, cfg)
    if binary_thresh is not None:
        sigma = jnp.where(sigma < binary_thresh, 0.0, sigma)
    pixels = jnp.exp(-jnp.sum(sigma * keep * dists, axis=-1))
    if return_march:
        return pixels, sigma, keep, m
    return pixels, sigma, keep


def march_pressure(m) -> dict[str, jnp.ndarray]:
    """Batch truncation-pressure scalars of a compacted march result.

    over_k    — max over rays of (pre-compaction actives − emitted k):
                > 0 means first-k compaction DROPPED active samples this
                step (exact for lattice/hybrid; window mode never
                count-truncates, so 0 there).
    over_k_lo — same for the lo bucket of a per-bucket-k march (0 single).
    edge_rays — rays whose candidate window's far edge is active: the
                active region may extend past w_cap/w_lo (hybrid) or the
                coarse window past the k-window (window mode) —
                span-truncation pressure.
    ac/ac_lo  — the batch's MAX per-ray active count this step, k-relative
                evidence even when nothing truncates: the tuner's floor
                decay refuses to shed a floor below what the batch
                measurably used within the display window (invariant 5's
                evidence gate — a decay that the very next fire must undo
                is pure churn, ~100 truncating iters per bounce).

    The training loop reads these each chunk and grows k/w_cap within two
    chunk boundaries (the r4q8 pipelined drain defers ``tuner.observe`` by
    one chunk) instead of waiting out the re-check cadence: the 4-seed
    forced-hybrid gates (benchmarks/quality_runs_r3.jsonl) measured
    −2.2…−5.9 dB held-out when this drift runs unchecked for a full
    display cadence. Under a sharded batch the reductions ride the mesh's
    collectives like every other metric."""
    if isinstance(m, BucketedRays):
        ac = jnp.max(m.hi.active_count)
        ac_lo = jnp.max(m.lo.active_count)
        over = jnp.maximum(ac - m.hi.mask.shape[-1], 0)
        over_lo = jnp.maximum(ac_lo - m.lo.mask.shape[-1], 0)
        edges = jnp.sum(m.lo.edge_active) + jnp.sum(m.hi.edge_active)
        return {
            "march/over_k": over.astype(jnp.int32),
            "march/over_k_lo": over_lo.astype(jnp.int32),
            "march/edge_rays": edges.astype(jnp.int32),
            "march/ac": ac.astype(jnp.int32),
            "march/ac_lo": ac_lo.astype(jnp.int32),
        }
    ac = jnp.max(m.active_count)
    return {
        "march/over_k": jnp.maximum(ac - m.mask.shape[-1], 0).astype(jnp.int32),
        "march/over_k_lo": jnp.zeros((), jnp.int32),
        "march/edge_rays": jnp.sum(m.edge_active).astype(jnp.int32),
        "march/ac": ac.astype(jnp.int32),
        "march/ac_lo": jnp.zeros((), jnp.int32),
    }


def render_rays_with_binary(
    model: CPPN,
    params,
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: TrainConfig,
    near: float,
    far: float,
    binary_thresh: float,
    barf_alpha=0.0,
):
    """Normal + binary renders from ONE march + MLP evaluation (the two
    differ only in zeroing sub-threshold densities, visualization.py:343-352
    — the reference also reuses its predictions tensor there)."""
    m = _march_for(cfg, grid, origins, directions, near, far)
    raw = _raw_for(model, params, m, origins, directions, cfg, barf_alpha)
    parts, bparts = [], []
    for mb, sigma in _bucket_sigmas(m, raw):
        dists, keep = _keep_mask(mb, sigma, cfg)
        parts.append(jnp.exp(-jnp.sum(sigma * keep * dists, axis=-1)))
        bsigma = jnp.where(sigma < binary_thresh, 0.0, sigma)
        bparts.append(jnp.exp(-jnp.sum(bsigma * keep * dists, axis=-1)))
    if isinstance(m, BucketedRays):
        return (
            jnp.take(jnp.concatenate(parts), m.inv, axis=0),
            jnp.take(jnp.concatenate(bparts), m.inv, axis=0),
        )
    return parts[0], bparts[0]


def _build_train_step(
    model: CPPN,
    cfg: TrainConfig,
    near: float,
    far: float,
    num_images: int | None = None,
    rays_per_image: int | None = None,
):
    """Unjitted train-step body. Ref loop body: run_nerf_acc.py:263-328.

    ``sample_mode='image'`` (run_nerf_acc.py:279-280) draws the batch from
    one random view and needs num_images/rays_per_image.
    """
    tx = make_optimizer(cfg)
    if cfg.sample_mode == "image" and not (num_images and rays_per_image):
        raise ValueError("sample_mode='image' needs num_images and rays_per_image")
    use_fused_step = _fused_step_eligible(model, cfg)

    def sample_batch(k_sample, rays: RayDataset):
        # ray sampling on device (run_nerf_acc.py:275-280)
        if cfg.sample_mode == "image":
            from ..ops.sampling import sample_image_rays

            return sample_image_rays(
                k_sample, rays, cfg.img_sample_size, num_images, rays_per_image
            )
        return sample_pixel_rays(
            k_sample, rays, cfg.img_sample_size,
            weighted=cfg.sampling_strategy != "random",
            impl=cfg.sampling_impl,
        )

    def step_core(state: TrainState, batch, k_grid, key_next):
        # BARF alpha anneal (run_nerf_acc.py:268-272)
        barf_alpha = (
            barf_alpha_schedule(state.step, cfg.pos_enc_basis, cfg.barf_start, cfg.barf_stop)
            if cfg.pos_enc == "barf"
            else 0.0
        )

        # occupancy EMA updates every n steps (run_nerf_acc.py:285-286);
        # one shared 2M-point sigma pass feeds both grids
        sig = _sigma_fn(model, state.params, barf_alpha, cfg.mlp_backend)
        grid, vessel_grid = every_n_step_pair(
            state.grid, state.vessel_grid, state.step, sig,
            cfg.alpha_thre, cfg.vessel_alpha_thre,
            cfg.grid_update_every, cfg.grid_ema_decay,
            key=k_grid if cfg.grid_jitter else None,
            slabs=cfg.grid_update_slabs,
        )

        # compacted steppers report truncation pressure so the loop can
        # regrow k/w_cap within two chunk boundaries of drift — one chunk
        # of observe latency under the pipelined drain (march_pressure)
        compacting = 0 < cfg.compact_samples < cfg.depth_samples_per_ray

        def loss_fn(params):
            origins = batch.origins
            if cfg.pose_refine:
                # learnable per-view camera translation (pose refinement):
                # gradients flow loss -> sigma -> positions -> origins
                origins = origins + params["params"]["view_shifts"][batch.image_ids]
            out = render_rays(
                model, params, grid, origins, batch.directions,
                cfg, near, far, barf_alpha, return_march=compacting,
            )
            pixels = out[0]
            pressure = march_pressure(out[3]) if compacting else {}
            loss = jnp.mean((pixels - batch.pixel_values) ** 2)
            return loss, (pixels, pressure)

        if use_fused_step:
            loss, pixels, march, grads = _fused_loss_and_grads(
                model, state.params, grid, batch.origins, batch.directions,
                batch.pixel_values, cfg, near, far,
            )
            pressure = march_pressure(march) if compacting else {}
        else:
            (loss, (pixels, pressure)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {
            "loss/train-pixel-coarse": loss,
            "psnr/train-coarse": psnr_from_mse(loss),
            "mean/train-pred-coarse": jnp.mean(pixels),
            "mean/train": jnp.mean(batch.pixel_values),
            "barf-coarse": jnp.asarray(barf_alpha, jnp.float32),
            **pressure,
        }
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            grid=grid,
            vessel_grid=vessel_grid,
            step=state.step + 1,
            key=key_next,
        )
        return new_state, metrics, pixels, batch.pixel_values

    def train_step(state: TrainState, rays: RayDataset):
        key, k_sample, k_grid = jax.random.split(state.key, 3)
        batch = sample_batch(k_sample, rays)
        return step_core(state, batch, k_grid, key)

    return train_step


@functools.lru_cache(maxsize=64)
def make_train_step(
    model: CPPN,
    cfg: TrainConfig,
    near: float,
    far: float,
    num_images: int | None = None,
    rays_per_image: int | None = None,
):
    """Jitted single train step (donated state).

    lru-cached on the (hashable, structurally-equal) model/config: repeat
    ``train()`` calls in one process — seed grids, sweeps, retrain loops —
    get the SAME jitted callable back, so jax's compile cache hits instead
    of re-tracing + re-compiling (4-12 s per program through the tunnel).
    """
    return jax.jit(
        _build_train_step(model, cfg, near, far, num_images, rays_per_image),
        donate_argnums=(0,),
    )


@functools.lru_cache(maxsize=64)
def make_train_chunk(
    model: CPPN,
    cfg: TrainConfig,
    near: float,
    far: float,
    steps_per_call: int,
    num_images: int | None = None,
    rays_per_image: int | None = None,
):
    """lax.scan over ``steps_per_call`` train steps in ONE jitted program.

    Amortizes per-dispatch overhead (host->device launch through the
    tunnel is ~1.5-2ms — comparable to the whole MLP fwd at bf16).
    Returns (state, stacked_metrics, last_pred_pixels, last_target_pixels);
    metrics are stacked (steps_per_call,) so the driver can still log every
    step if it wants to.
    """
    inner = _build_train_step(model, cfg, near, far, num_images, rays_per_image)

    def chunk(state: TrainState, rays: RayDataset):
        # NOTE (r4q8 negative result): pre-drawing all 50 ray batches in
        # one vmapped sampler call before the scan — instead of 50 small
        # sequential ops inside it — measured SLOWER on TPU (chunk_step
        # 4.92 vs 4.66 ms/step, /tmp/r4q8_profile.log) despite identical
        # keys/samples; the inline sampler stays.
        def body(carry, _):
            st, _, _ = carry
            st, metrics, pred, tgt = inner(st, rays)
            return (st, pred, tgt), metrics

        dummy = jnp.zeros((cfg.img_sample_size,), jnp.float32)
        (state, pred, tgt), metrics = jax.lax.scan(
            body, (state, dummy, dummy), None, length=steps_per_call
        )
        return state, metrics, pred, tgt

    return jax.jit(chunk, donate_argnums=(0,))


@functools.lru_cache(maxsize=64)
def make_eval_step(model: CPPN, cfg: TrainConfig, near: float, far: float):
    """Held-out view evaluation (run_nerf_acc.py:330-380): full-image MSE,
    PSNR, vessel-pixel PSNR."""

    def eval_step(state: TrainState, test: TestView):
        barf_alpha = (
            barf_alpha_schedule(state.step, cfg.pos_enc_basis, cfg.barf_start, cfg.barf_stop)
            if cfg.pos_enc == "barf"
            else 0.0
        )
        pixels, _, _ = render_rays(
            model, state.params, state.grid, test.origins, test.directions,
            cfg, near, far, barf_alpha,
        )
        mse = jnp.mean((pixels - test.pixel_values) ** 2)
        psnr = psnr_from_mse(mse)
        vessel_sq = (pixels - test.pixel_values) ** 2 * test.vessel_mask
        vessel_mse = jnp.sum(vessel_sq) / jnp.maximum(jnp.sum(test.vessel_mask), 1)
        vessel_psnr = psnr_from_mse(vessel_mse)
        return {
            "loss/test-pixel-coarse": mse,
            "psnr/test-coarse": psnr,
            "psnr/vessel-test-coarse": vessel_psnr,
        }, pixels

    return jax.jit(eval_step)
