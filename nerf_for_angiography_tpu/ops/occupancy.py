"""Occupancy-grid acceleration: the TPU-native replacement for
``nerfacc.OccupancyGrid`` + ``nerfacc.ray_marching`` (SURVEY.md §2.7-bis).

Reference semantics reproduced (used at run_nerf_acc.py:196-198,285-287 and
nerf_helpers_acc.py:10-31,65-78):
  * a 128^3 binary occupancy grid over an axis-aligned box, EMA-updated from
    density samples every n steps: ``occs = max(occs * decay, sigma)``,
    ``binary = occs > min(mean(occs), occ_thre)``;
  * grid-pruned ray marching with uniform step ``(far-near)/n_samples``,
    per-sample alpha threshold ``alpha_thre`` and transmittance early stop
    ``early_stop_eps``.

TPU-first re-design (the central departure from the CUDA reference):
  * nerfacc's DDA traversal emits a **ragged** ``(ray_indices, t_starts,
    t_ends)`` list — XLA-hostile dynamic shapes. Here marching produces a
    **fixed** (n_rays, n_samples) sample lattice plus a {0,1} validity mask
    from a trilinear-floor gather on the grid. Masked samples behave exactly
    like samples nerfacc never emitted (alpha = 1 in the Beer-Lambert
    product).
  * the EMA update densely re-evaluates all res^3 cell centers on the MXU
    (2.1M tiny-MLP evals ~= one training step) instead of nerfacc's
    partial-cell CUDA sampling — simpler, deterministic, and cheap on TPU.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class OccupancyGrid(NamedTuple):
    """Dense occupancy grid state (a pytree — jit/shard-friendly).

    occs:   float32 (res, res, res) EMA of density per cell
    binary: bool    (res, res, res) occupied mask
    aabb:   float32 (6,) [xmin, ymin, zmin, xmax, ymax, zmax]
    packed:        uint32 (res*res, words) bit-packed binary (z on bits) —
                   cached because packing the 128^3 grid costs ~1.1 ms/step
                   on v5e while the grid only changes every 16 steps
    packed_coarse: uint32 (cres*cres, words) bit-packed DILATED coarse grid
                   (coarse_dilated_bits at factor res//32) — ~0.9 ms/step
                   cached for the window/hybrid marches

    The packed fields may be None (legacy constructors / hand-built test
    grids); every consumer falls back to packing on the fly.
    """

    occs: jnp.ndarray
    binary: jnp.ndarray
    aabb: jnp.ndarray
    packed: jnp.ndarray | None = None
    packed_coarse: jnp.ndarray | None = None
    # optional PERSISTENT feasibility mask (space-carving init,
    # carve_feasible): cells proven empty by an unattenuated training ray
    # stay pruned through every EMA re-binarization. None = all feasible.
    feasible: jnp.ndarray | None = None

    @property
    def resolution(self) -> int:
        return self.occs.shape[0]

    @property
    def coarse_factor(self) -> int:
        """The factor packed_coarse is (and marches are) built at."""
        return max(1, self.resolution // 32)


def with_packed(grid: OccupancyGrid) -> OccupancyGrid:
    """Populate the cached bit-packed tables from grid.binary."""
    packed = pack_grid_bits(grid.binary)
    packed_coarse, _ = coarse_dilated_bits(grid.binary, grid.coarse_factor)
    return grid._replace(packed=packed, packed_coarse=packed_coarse)


def create_grid(
    aabb, resolution: int = 128, feasible: jnp.ndarray | None = None
) -> OccupancyGrid:
    """Fresh grid, everything occupied (matches nerfacc's conservative
    start: an empty grid would kill all gradients on step 0). With
    ``feasible`` (space-carving init, carve_feasible), provably-empty
    cells start — and stay — pruned."""
    aabb = jnp.asarray(aabb, jnp.float32)
    shape = (resolution, resolution, resolution)
    binary = jnp.ones(shape, bool)
    if feasible is not None:
        binary = binary & feasible
    return with_packed(OccupancyGrid(
        occs=jnp.zeros(shape, jnp.float32),
        binary=binary,
        aabb=aabb,
        feasible=feasible,
    ))


def _binarize(
    occs: jnp.ndarray, thresh, feasible: jnp.ndarray | None
) -> jnp.ndarray:
    """nerfacc binarization ``occs > min(mean, occ_thre)`` intersected with
    the persistent carve mask (a carved cell must never re-occupy: its
    emptiness is proven by the training data, not estimated by the EMA)."""
    binary = occs > thresh
    return binary if feasible is None else binary & feasible


def cell_centers(grid: OccupancyGrid) -> jnp.ndarray:
    """(res^3, 3) world-space coordinates of all cell centers."""
    res = grid.resolution
    lo, hi = grid.aabb[:3], grid.aabb[3:]
    idx = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    xs = lo[0] + idx * (hi[0] - lo[0])
    ys = lo[1] + idx * (hi[1] - lo[1])
    zs = lo[2] + idx * (hi[2] - lo[2])
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def update_grid(
    grid: OccupancyGrid,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    occ_thre: float,
    ema_decay: float = 0.95,
    key: jax.Array | None = None,
) -> OccupancyGrid:
    """One EMA occupancy update (dense over all cells).

    Ref semantics: nerfacc OccupancyGrid._update as wrapped by
    nerf_helpers_acc.py:65-78 — ``occs = max(occs*decay, sigma(cell))``,
    binarized at ``min(mean(occs), occ_thre)``. If ``key`` is given, cell
    evaluation points are uniformly jittered inside each cell (nerfacc does
    this to avoid aliasing onto cell centers).
    """
    res = grid.resolution
    pts = cell_centers(grid)
    if key is not None:
        cell_size = (grid.aabb[3:] - grid.aabb[:3]) / res
        jitter = (jax.random.uniform(key, pts.shape) - 0.5) * cell_size
        pts = pts + jitter
    sigma = sigma_fn(pts).reshape(res, res, res)
    occs = jnp.maximum(grid.occs * ema_decay, sigma)
    thresh = jnp.minimum(jnp.mean(occs), occ_thre)
    return with_packed(OccupancyGrid(
        occs=occs,
        binary=_binarize(occs, thresh, grid.feasible),
        aabb=grid.aabb,
        feasible=grid.feasible,
    ))


def update_grid_pair(
    grid: OccupancyGrid,
    vessel_grid: OccupancyGrid,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    occ_thre: float,
    vessel_thre: float,
    ema_decay: float = 0.95,
    key: jax.Array | None = None,
) -> tuple[OccupancyGrid, OccupancyGrid]:
    """EMA-update the scene and vessel grids from ONE shared sigma pass.

    The reference updates its two 128^3 grids back to back with two full
    density evaluations (run_nerf_acc.py:285-286) — but both sample the
    SAME field at the same cell centers; only the binarization threshold
    differs (alpha_thre 1e-4 vs vessel 5e-2). Sharing the evaluation
    halves the dominant grid-update cost (a 2M-point MLP pass) with
    bit-identical results. With ``key``, evaluation points are uniformly
    jittered inside each cell (nerfacc's anti-aliasing sampling; the EMA
    max across successive jittered updates then covers the cell volume
    instead of pinning to exact centers).
    """
    res = grid.resolution
    pts = cell_centers(grid)
    if key is not None:
        cell_size = (grid.aabb[3:] - grid.aabb[:3]) / res
        pts = pts + (jax.random.uniform(key, pts.shape) - 0.5) * cell_size
    sigma = sigma_fn(pts).reshape(res, res, res)

    def apply(g: OccupancyGrid, thre: float) -> OccupancyGrid:
        occs = jnp.maximum(g.occs * ema_decay, sigma)
        thresh = jnp.minimum(jnp.mean(occs), thre)
        return with_packed(OccupancyGrid(
            occs=occs,
            binary=_binarize(occs, thresh, g.feasible),
            aabb=g.aabb,
            feasible=g.feasible,
        ))

    return apply(grid, occ_thre), apply(vessel_grid, vessel_thre)


def _slab_centers(
    grid: OccupancyGrid, start: jnp.ndarray, slab: int
) -> jnp.ndarray:
    """(slab*res^2, 3) cell centers of x-rows [start, start+slab)."""
    res = grid.resolution
    lo, hi = grid.aabb[:3], grid.aabb[3:]
    idx = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    xi = (jnp.arange(slab, dtype=jnp.float32) + start.astype(jnp.float32) + 0.5) / res
    xs = lo[0] + xi * (hi[0] - lo[0])
    ys = lo[1] + idx * (hi[1] - lo[1])
    zs = lo[2] + idx * (hi[2] - lo[2])
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def update_grid_pair_slab(
    grid: OccupancyGrid,
    vessel_grid: OccupancyGrid,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    occ_thre: float,
    vessel_thre: float,
    update_idx: jnp.ndarray,
    n_slabs: int = 4,
    ema_decay: float = 0.95,
    key: jax.Array | None = None,
) -> tuple[OccupancyGrid, OccupancyGrid]:
    """Partial EMA update: one rotating 1/n_slabs x-slab per call.

    nerfacc's OccupancyGrid._update evaluates only a PARTIAL set of cells
    per update after its warmup (uniform + occupied samples); evaluating
    all res^3 centers every update (update_grid_pair) costs one extra
    training step's worth of MLP time every cadence. TPU-native partial
    variant: a contiguous x-slab selected by ``update_idx % n_slabs`` —
    dynamic_update_slice instead of nerfacc's scatter, static shapes, full
    coverage every n_slabs updates.

    Deviation from nerfacc, deliberately: EVERY cell decays every update
    (a 2M-point elementwise multiply — free next to the MLP pass); only
    the slab gets fresh sigma maxed in. nerfacc decays sampled cells
    only, which with 1/4 sampling quadruples the empty-space prune time
    constant — at our sigmoid density (~0.5 at init, never exactly 0)
    that left the grid 100% occupied after 3k steps where the dense
    update prunes to ~1%. Decay-everywhere keeps the dense update's
    prune timescale bit-comparable; a cell's occ is max over past visits
    of sigma * decay^(updates since visit), exactly what the dense
    update computes when sigma only changes at visits. Both binarization
    thresholds still use the full-grid mean.
    """
    res = grid.resolution
    assert res % n_slabs == 0, (res, n_slabs)
    slab = res // n_slabs
    start = (update_idx % n_slabs) * slab
    pts = _slab_centers(grid, start, slab)
    if key is not None:
        cell_size = (grid.aabb[3:] - grid.aabb[:3]) / res
        pts = pts + (jax.random.uniform(key, pts.shape) - 0.5) * cell_size
    sigma = sigma_fn(pts).reshape(slab, res, res)

    def apply(g: OccupancyGrid, thre: float) -> OccupancyGrid:
        occs = g.occs * ema_decay
        old = jax.lax.dynamic_slice(occs, (start, 0, 0), (slab, res, res))
        occs = jax.lax.dynamic_update_slice(
            occs, jnp.maximum(old, sigma), (start, 0, 0)
        )
        thresh = jnp.minimum(jnp.mean(occs), thre)
        return with_packed(OccupancyGrid(
            occs=occs,
            binary=_binarize(occs, thresh, g.feasible),
            aabb=g.aabb,
            feasible=g.feasible,
        ))

    return apply(grid, occ_thre), apply(vessel_grid, vessel_thre)


def every_n_step_pair(
    grid: OccupancyGrid,
    vessel_grid: OccupancyGrid,
    step: jnp.ndarray,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    occ_thre: float,
    vessel_thre: float,
    n: int = 16,
    ema_decay: float = 0.95,
    key: jax.Array | None = None,
    slabs: int = 1,
    warmup_steps: int = 256,
) -> tuple[OccupancyGrid, OccupancyGrid]:
    """jit-safe every-n gate over update_grid_pair (both grids together).
    ``key`` enables jittered cell evaluation (see update_grid_pair).

    ``slabs > 1`` switches to rotating-slab partial updates after
    ``warmup_steps`` (nerfacc's warmup: every cell every update until the
    field has taken shape, ~256 steps — then partial sampling)."""
    if grid.packed is None:
        grid = with_packed(grid)
    if vessel_grid.packed is None:
        vessel_grid = with_packed(vessel_grid)
    do = (step % n) == 0

    def full(gs):
        return update_grid_pair(
            gs[0], gs[1], sigma_fn, occ_thre, vessel_thre, ema_decay, key=key
        )

    if slabs <= 1 or grid.resolution % slabs:
        # non-divisible resolutions (tiny test grids) degrade to dense
        update = full
    else:

        def update(gs):
            return jax.lax.cond(
                step < warmup_steps,
                full,
                lambda gs: update_grid_pair_slab(
                    gs[0], gs[1], sigma_fn, occ_thre, vessel_thre,
                    update_idx=step // n, n_slabs=slabs,
                    ema_decay=ema_decay, key=key,
                ),
                gs,
            )

    return jax.lax.cond(do, update, lambda gs: gs, (grid, vessel_grid))


def every_n_step(
    grid: OccupancyGrid,
    step: jnp.ndarray,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    occ_thre: float,
    n: int = 16,
    ema_decay: float = 0.95,
) -> OccupancyGrid:
    """jit-safe "update every n steps" gate (lax.cond on step % n).
    Ref: nerfacc every_n_step via nerf_helpers_acc.py:65-78."""
    if grid.packed is None:
        # both cond branches must return one pytree structure, and the
        # update branch populates the packed caches
        grid = with_packed(grid)
    do = (step % n) == 0
    return jax.lax.cond(
        do,
        lambda g: update_grid(g, sigma_fn, occ_thre, ema_decay),
        lambda g: g,
        grid,
    )


def world_to_index(grid: OccupancyGrid, points: jnp.ndarray) -> jnp.ndarray:
    """World coords (..., 3) -> integer cell indices (..., 3), clipped."""
    res = grid.resolution
    lo, hi = grid.aabb[:3], grid.aabb[3:]
    norm = (points - lo) / (hi - lo)
    return jnp.clip((norm * res).astype(jnp.int32), 0, res - 1)


def pack_grid_bits(binary: jnp.ndarray) -> jnp.ndarray:
    """(res, res, res) bool -> (res*res, ceil(res/32)) uint32, z packed into
    bits (bit b of word w = cell z = 32*w + b)."""
    res = binary.shape[0]
    words = max(1, -(-res // 32))
    pad = words * 32 - res
    b = binary
    if pad:
        b = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))
    b = b.reshape(res * res, words, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def _query_packed_bits(
    packed: jnp.ndarray, res: int, aabb: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Bit-packed occupancy lookup at world points; False outside the AABB.
    ``packed`` is pack_grid_bits() of a (res, res, res) binary grid."""
    lo, hi = aabb[:3], aabb[3:]
    inside = jnp.all((points >= lo) & (points <= hi), axis=-1)
    norm = (points - lo) / (hi - lo)
    idx = jnp.clip((norm * res).astype(jnp.int32), 0, res - 1)
    rows = jnp.take(packed, idx[..., 0] * res + idx[..., 1], axis=0)  # (..., words)
    iz = idx[..., 2]
    word_sel = (
        jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
        == (iz[..., None] >> 5)
    )
    word = jnp.sum(jnp.where(word_sel, rows, jnp.uint32(0)), axis=-1)
    occ = ((word >> (iz.astype(jnp.uint32) & jnp.uint32(31))) & jnp.uint32(1)) > 0
    return occ & inside


def query_occ(grid: OccupancyGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Occupancy lookup at world points; False outside the AABB.
    Ref: nerfacc query_occ (visualization.py:214).

    TPU notes (the profiled top cost of a training step, v5e):
      * a scalar triple-index gather from the 128^3 grid is ~3.5x slower
        than gathering whole z-rows and selecting the lane — random scalar
        gathers don't vectorize, row gathers do (22ms -> 6.4ms / 1.7M pts);
      * gather time is per-row-count-bound, so the z axis is BIT-PACKED:
        rows shrink from 128 uint8 lanes to 4 uint32 words, cutting the
        post-gather one-hot select and the gathered intermediate 32x.
        Packing itself is a cheap dense pass (~2M bit-ops) fused by XLA.
    """
    packed = grid.packed
    if packed is None:  # legacy / hand-built grid: pack on the fly
        packed = pack_grid_bits(grid.binary)  # (res*res, words)
    return _query_packed_bits(packed, grid.resolution, grid.aabb, points)


def _dilate3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 binary dilation (max-pool window 3, stride 1, same padding)."""
    for axis in range(3):
        pad = [(0, 0)] * 3
        pad[axis] = (1, 1)
        xp = jnp.pad(x, pad)
        n = x.shape[axis]
        a = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
        b = jax.lax.slice_in_dim(xp, 1, n + 1, axis=axis)
        c = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
        x = a | b | c
    return x


def coarse_dilated_bits(
    binary: jnp.ndarray, factor: int
) -> tuple[jnp.ndarray, int]:
    """Max-pool a (res,res,res) binary grid by ``factor`` and dilate by one
    coarse cell (26-neighborhood) -> (packed bits, coarse res).

    The dilation buys the window-march superset guarantee: any fine-occupied
    point lies inside an occupied coarse cell, and every point within one
    coarse cell of it (per axis) lands in a dilated-occupied cell — so a
    probe within cell-size of an occupied point always hits."""
    res = binary.shape[0]
    cres = res // factor
    c = binary.reshape(cres, factor, cres, factor, cres, factor).any(axis=(1, 3, 5))
    return pack_grid_bits(_dilate3(c)), cres


def carve_feasible(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    pixel_values: jnp.ndarray,
    aabb,
    resolution: int,
    near: float,
    far: float,
    thresh: float = 0.995,
    samples_per_cell: float = 2.0,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Space-carving feasibility mask from the training rays (one-time).

    Physics of the X-ray forward model (helpers.py:192-224 semantics): a
    pixel value of ~1 means ``prod(exp(-sigma*dt)) ~ 1`` along the whole
    ray, i.e. zero attenuation — the training objective itself pins the
    density along that ray to ~0. Every grid cell such a "white" ray
    traverses is therefore provably empty *under the training data*, and
    can start (and stay) pruned instead of waiting ~3k iterations for the
    MLP to learn emptiness and the EMA grid to decay below threshold. This
    is the classic visual-hull / silhouette-carving initialization; the
    reference's nerfacc grid has no equivalent (it always starts fully
    occupied, run_nerf_acc.py:196-198) — a deliberate TPU-era improvement,
    flagged off by ``TrainConfig.carve_init=False`` for strict-reference
    behavior.

    Conservativeness: per-ray carving over-carves cells the ray only clips
    a corner of (the cell may hold density OFF the ray), so the carved set
    is ERODED by one cell — a cell stays feasible if any 26-neighbor is
    un-carved. Cells no white ray traverses are never carved. Works
    unchanged under pose-shift augmentation (the evidence is about the rays
    as trained, not about world-truth), but the caller should skip carving
    when poses themselves are being refined (the rays move during
    training).

    Returns a bool (res, res, res) mask: True = feasible.
    """
    aabb = jnp.asarray(aabb, jnp.float32)
    res = int(resolution)
    lo, hi = aabb[:3], aabb[3:]
    # ray-march step <= cell/samples_per_cell so traversed cells are hit
    # (missing grazing cells is safe: un-carved = feasible)
    extent = float(jnp.max(hi - lo))
    cell = extent / res
    n_s = int(np.ceil((far - near) / (cell / samples_per_cell)))
    n_s = max(8, min(n_s, 4 * res * int(np.ceil(samples_per_cell))))
    ts = near + (jnp.arange(n_s, dtype=jnp.float32) + 0.5) * (
        (far - near) / n_s
    )

    n = origins.shape[0]
    pad = (-n) % chunk
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
    d = jnp.concatenate([directions, jnp.zeros((pad, 3), directions.dtype)])
    white = jnp.concatenate(
        [pixel_values >= thresh, jnp.zeros((pad,), bool)]
    )
    n_cells = res * res * res

    def body(carved, inp):
        co, cd, cw = inp
        pos = co[:, None, :] + cd[:, None, :] * ts[None, :, None]
        inside = jnp.all((pos >= lo) & (pos <= hi), axis=-1)
        idx = jnp.clip(
            ((pos - lo) / (hi - lo) * res).astype(jnp.int32), 0, res - 1
        )
        flat = (idx[..., 0] * res + idx[..., 1]) * res + idx[..., 2]
        # sentinel slot n_cells for non-carving samples (scatter-set True)
        flat = jnp.where(cw[:, None] & inside, flat, n_cells)
        carved = carved.at[flat.reshape(-1)].set(True)
        return carved, None

    carved = jnp.zeros((n_cells + 1,), bool)
    carved, _ = jax.lax.scan(
        body,
        carved,
        (
            o.reshape(-1, chunk, 3),
            d.reshape(-1, chunk, 3),
            white.reshape(-1, chunk),
        ),
    )
    carved = carved[:n_cells].reshape(res, res, res)
    # erode the carved set by one cell == dilate the feasible set
    return _dilate3(~carved)


def window_probe_stride(
    n_samples: int, near: float, far: float, aabb_extent: float, coarse_res: int
) -> int:
    """Largest probe stride keeping the window-march superset guarantee:
    probe spacing stride*step must stay below 2x the coarse cell size
    (miss at a probe => no occupied fine cell within one coarse cell of it
    => nearest occupied sample is > cell/step samples away)."""
    step = (far - near) / n_samples
    cell = aabb_extent / coarse_res
    return max(1, min(n_samples, int(2.0 * cell / step) - 1))


def coarse_window(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    n_samples: int,
    near: float,
    far: float,
    coarse_factor: int | None = None,
    aabb_extent: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-ray conservative active sample-index window from the dilated
    coarse bit-packed grid -> (start_idx, end_idx, any_hit), each (R,).

    Every active fine sample of the exact march lies in [start, end] (the
    dilation + probe-stride guarantee documented at coarse_dilated_bits /
    window_probe_stride). The 4 KB table makes the ~n_samples/16 probe
    gathers cache-resident — this is the cheap first level of the
    window/hybrid marches."""
    res = grid.resolution
    if coarse_factor is None:
        # target a ~32^3 coarse grid (4 KB bit-packed); smaller grids keep
        # full resolution so the dilation stays one FINE cell wide and the
        # window does not balloon at test/tiny shapes
        coarse_factor = grid.coarse_factor
    if res % coarse_factor:
        raise ValueError(f"grid resolution {res} not divisible by {coarse_factor}")
    step = (far - near) / n_samples
    if grid.packed_coarse is not None and coarse_factor == grid.coarse_factor:
        packed, cres = grid.packed_coarse, res // coarse_factor
    else:
        packed, cres = coarse_dilated_bits(grid.binary, coarse_factor)
    # the probe stride must be static; take the extent from the caller, or
    # from the aabb when it is concrete, else the guaranteed-safe 1-cell
    # fallback (stride such that spacing = one fine cell per coarse cell)
    if aabb_extent is None and not isinstance(grid.aabb, jax.core.Tracer):
        aabb_extent = float(grid.aabb[3] - grid.aabb[0])
    if aabb_extent is not None:
        stride = window_probe_stride(n_samples, near, far, aabb_extent, cres)
        # a MISS at a probe proves no occupied fine cell within one coarse
        # cell of it (dilation), i.e. no active sample within cell/step
        # samples — tightens the conservative window by `slack` per side
        slack = max(int((aabb_extent / cres) / step) - 1, 0)
    else:
        stride = coarse_factor
        slack = 0
    n_probe = -(-n_samples // stride)
    probe_idx = jnp.minimum(
        jnp.arange(n_probe, dtype=jnp.int32) * stride, n_samples - 1
    )
    probe_t = near + (probe_idx.astype(jnp.float32) + 0.5) * step
    probe_pos = (
        origins[..., None, :] + directions[..., None, :] * probe_t[:, None]
    )
    hit = _query_packed_bits(packed, cres, grid.aabb, probe_pos)  # (R, n_probe)

    any_hit = jnp.any(hit, axis=-1)
    first_p = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    last_p = (n_probe - 1) - jnp.argmax(hit[..., ::-1], axis=-1).astype(jnp.int32)
    start_idx = jnp.maximum((first_p - 1) * stride + slack, 0)
    # no probe after the last one -> no miss evidence; keep the lattice end
    end_raw = (last_p + 1) * stride + (stride - 1) - slack
    end_idx = jnp.where(
        last_p >= n_probe - 1, n_samples - 1,
        jnp.minimum(end_raw, n_samples - 1),
    )
    return start_idx, end_idx, any_hit


def march_rays_window(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    n_samples: int,
    near: float,
    far: float,
    k: int,
    coarse_factor: int | None = None,
    aabb_extent: float | None = None,
) -> MarchedRays:
    """Contiguous-window grid-pruned marching: k consecutive samples of the
    reference lattice starting at each ray's first occupied region.

    TPU-first redesign of the compacted lattice march (march_rays with
    compact_k): instead of querying the fine grid at ~n_samples/stride
    probes and top-k-compacting 300 -> k per ray (gathers + one-hot
    matmuls), probe a DILATED 4x-coarser grid at ~n_samples/16 probes
    (a 32^3 grid bit-packs to 4 KB — gathers hit a cache-resident table),
    take the first..last probe hits as a conservative sample-index window,
    and emit the k-sample lattice window starting there. Positions stay an
    affine function of the window start — zero gathers end to end.

    Superset semantics: every sample the exact march keeps inside the
    window is kept here (same lattice); gap samples between occupied
    segments are ALSO kept and composited with their true (trained ~zero)
    density, which only improves the quadrature vs nerfacc's hard pruning
    (nerf_helpers_acc.py:10-31). Rays whose active span exceeds k lose the
    farthest samples — identical to the compact_k path's truncation.
    Rays with no probe hit render fully transparent (pixel = 1), matching
    an all-masked lattice.
    """
    start_idx, end_idx, any_hit = coarse_window(
        grid, origins, directions, n_samples, near, far,
        coarse_factor=coarse_factor, aabb_extent=aabb_extent,
    )
    step = (far - near) / n_samples
    w = jnp.clip(start_idx, 0, max(n_samples - k, 0))  # (R,)

    sel = w[..., None] + jnp.arange(k, dtype=jnp.int32)  # (R, k)
    sel_f = sel.astype(jnp.float32)
    t_starts = near + sel_f * step
    t_ends = t_starts + step
    t_mid = t_starts + step / 2.0
    positions = origins[..., None, :] + directions[..., None, :] * t_mid[..., None]

    t_enter, t_exit = ray_aabb_intersect(grid.aabb, origins, directions)
    in_box = (t_mid >= t_enter[..., None]) & (t_mid <= t_exit[..., None])
    mask = (
        in_box & (sel <= end_idx[..., None]) & any_hit[..., None]
    ).astype(jnp.float32)
    return MarchedRays(
        t_starts=t_starts, t_ends=t_ends, positions=positions, mask=mask,
        # pressure: the window keeps every sample it covers, so the only
        # truncation class is the conservative coarse window extending
        # past the k-window end (win_w > k)
        active_count=jnp.sum(mask, axis=-1).astype(jnp.int32),
        edge_active=any_hit & (end_idx > w + (k - 1)),
    )


def safe_occ_stride(
    stride: int,
    n_samples: int,
    near: float,
    far: float,
    aabb_extent: float,
    resolution: int,
) -> int:
    """Largest stride <= ``stride`` for which strided probing keeps the
    superset-mask guarantee, i.e. probe spacing stride*(far-near)/n_samples
    stays below the grid cell size aabb_extent/resolution.

    Strided probing (march_rays ``occ_stride``) marks a sample active if
    either bracketing probe hits an occupied cell; that is a superset of the
    exact mask only while a ray cannot cross a whole cell between probes.
    Callers that would silently break the guarantee (lower sample counts,
    wider near/far, finer grids — ADVICE.md r1 #2) get the largest still-safe
    stride (>= 1) and a warning instead of corrupted renders.
    """
    if stride <= 1:
        return max(1, stride)
    step = (far - near) / n_samples
    cell = aabb_extent / resolution
    safe = stride
    while safe > 1 and safe * step >= cell:
        safe -= 1
    if safe != stride:
        import warnings

        warnings.warn(
            f"occ_stride={stride} breaks the superset-mask guarantee "
            f"(probe spacing {stride * step:.4g} >= cell size {cell:.4g}); "
            f"falling back to occ_stride={safe}",
            stacklevel=2,
        )
    return safe


def ray_aabb_intersect(
    aabb: jnp.ndarray, origins: jnp.ndarray, directions: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-method ray/AABB intersection -> (t_enter, t_exit) per ray.
    Rays that miss get t_enter > t_exit."""
    lo, hi = aabb[:3], aabb[3:]
    inv = 1.0 / jnp.where(jnp.abs(directions) < 1e-10, 1e-10, directions)
    t0 = (lo - origins) * inv
    t1 = (hi - origins) * inv
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return t_enter, t_exit


class MarchedRays(NamedTuple):
    """Fixed-width sample lattice (the nerfacc ragged-output replacement).

    ``active_count``/``edge_active`` are truncation-PRESSURE stats the
    compacted marches attach (None on the dense path): per ray, how many
    candidate samples were active BEFORE first-k compaction, and whether
    the candidate window's far edge shows activity (the active region may
    extend past it). The training loop reads their batch reductions each
    chunk and grows k/w_cap immediately instead of waiting for the next
    cadence re-check — bounding truncation-biased training to one chunk
    (see training/loop.py; the 20k-iter forced-hybrid quality gates in
    benchmarks/quality_runs_r3.jsonl measured what un-bounded drift costs).
    """

    t_starts: jnp.ndarray  # (n_rays, n_samples)
    t_ends: jnp.ndarray  # (n_rays, n_samples)
    positions: jnp.ndarray  # (n_rays, n_samples, 3) segment midpoints
    mask: jnp.ndarray  # (n_rays, n_samples) float {0,1}: inside AABB & occupied
    active_count: jnp.ndarray | None = None  # (n_rays,) int32 pre-compaction
    edge_active: jnp.ndarray | None = None  # (n_rays,) bool window-edge hit


def march_rays(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    n_samples: int,
    near: float,
    far: float,
    compact_k: int | None = None,
    occ_stride: int = 1,
    fka: str = "xla",
) -> MarchedRays:
    """Uniform-step grid-pruned marching with fixed output shapes.

    Matches nerfacc.ray_marching's stepping (render_step_size =
    (far-near)/n_samples, nerf_helpers_acc.py:27-29) with occupancy pruning
    via gather instead of DDA; AABB clipping via slab intersection.

    ``compact_k``: emit only the first k active samples per ray (nerfacc's
    skip-empty-space). TPU-native zero-gather design: the depth lattice is
    affine in the sample index, so t/positions for the selected samples are
    RECOMPUTED from the top-k indices instead of gathered, and the 0/1 mask
    moves through a bf16-exact one-hot matmul on the MXU.
    """
    step = (far - near) / n_samples
    i = jnp.arange(n_samples, dtype=jnp.float32)
    t_starts = near + i * step  # (n_samples,)
    t_starts = jnp.broadcast_to(t_starts, origins.shape[:-1] + (n_samples,))
    t_ends = t_starts + step
    t_mid = (t_starts + t_ends) / 2.0

    positions = origins[..., None, :] + directions[..., None, :] * t_mid[..., None]

    t_enter, t_exit = ray_aabb_intersect(grid.aabb, origins, directions)
    in_box = (t_mid >= t_enter[..., None]) & (t_mid <= t_exit[..., None])
    if occ_stride > 1:
        # probe the grid every occ_stride-th sample and mark a sample active
        # if EITHER bracketing probe hits an occupied cell. The grid query is
        # the profiled top cost of a step (per-row gather, ~4ns/row on v5e);
        # with cell size > stride*step a ray cannot cross an occupied cell
        # without a probe landing in it, so the union mask is a (near-)
        # superset of the exact one — false actives only cost an MLP eval.
        probe_pos = positions[..., ::occ_stride, :]
        occ_p = query_occ(grid, probe_pos)  # (..., n_probe)
        left = jnp.repeat(occ_p, occ_stride, axis=-1)[..., :n_samples]
        occ_next = jnp.concatenate([occ_p[..., 1:], occ_p[..., -1:]], axis=-1)
        right = jnp.repeat(occ_next, occ_stride, axis=-1)[..., :n_samples]
        occupied = left | right
    else:
        occupied = query_occ(grid, positions)
    mask = (in_box & occupied).astype(jnp.float32)

    if compact_k is None or compact_k >= n_samples:
        return MarchedRays(
            t_starts=t_starts, t_ends=t_ends, positions=positions, mask=mask
        )

    k = compact_k
    sel, mask_k = _first_k_active(mask, k, fka)

    sel_f = sel.astype(jnp.float32)
    t_starts_k = near + sel_f * step
    t_ends_k = t_starts_k + step
    t_mid_k = t_starts_k + step / 2.0
    positions_k = (
        origins[..., None, :] + directions[..., None, :] * t_mid_k[..., None]
    )
    return MarchedRays(
        t_starts=t_starts_k, t_ends=t_ends_k, positions=positions_k, mask=mask_k,
        # candidate set = the full lattice, so active_count > k is EXACT
        # truncation; there is no window edge to press against
        active_count=jnp.sum(mask, axis=-1).astype(jnp.int32),
        edge_active=jnp.zeros(mask.shape[:-1], bool),
    )


def _first_k_active(
    mask: jnp.ndarray, k: int, fka: str = "xla"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sel, mask_k): indices + activity of the first k active samples.

    SORT-FREE: with rank = inclusive cumsum of the 0/1 mask, the index of
    the (j+1)-th active sample equals #{i : rank[i] <= j} — every position
    before it (active or not) has rank <= j and every position from it on
    has rank > j. So sel comes from ONE broadcast compare + reduction
    (R, w, k) -> (R, k), which XLA fuses into a VPU loop, and mask_k is
    j < rank[-1]. Measured on v5e at the flagship (5625, 160, k=80) shape
    (tools/bench_compaction.py): 0.878 ms vs 0.883 for a single int32
    keys sort and 0.976 for top_k + sort_key_val — a wash vs the sort;
    kept for the simpler dependency structure (no sorting network).
    Inactive slots (j >= #actives) count every position: sel = w, clipped
    to w-1 — harmless under mask_k = 0 (excluded from the render; every
    sample carries its own [t, t+step) interval).

    ``fka`` selects the implementation: 'xla' (this compare+count),
    'pallas' (ops/pallas/first_k.py — same math, VMEM-resident
    accumulation), 'pallas_interpret' (CPU-testable interpret mode).
    """
    if fka in ("pallas", "pallas_interpret"):
        from .pallas.first_k import first_k_active_pallas

        return first_k_active_pallas(
            mask, k, interpret=fka == "pallas_interpret"
        )
    w = mask.shape[-1]
    rank = jnp.cumsum(mask, axis=-1)  # (R, w) f32: 1-based order of actives
    j = jnp.arange(k, dtype=rank.dtype)
    sel = jnp.sum(
        (rank[..., :, None] <= j).astype(jnp.int32), axis=-2
    )  # (R, k)
    mask_k = (j < rank[..., -1:]).astype(jnp.float32)
    return jnp.minimum(sel, w - 1), mask_k


def hybrid_w_cap(k: int, n_samples: int) -> int:
    """Candidate-window width for the hybrid march: covers the measured
    multi-branch spans (the flagship bench measures span ~157 at active
    width ~70 — hence the 160 floor) with headroom once k itself grows.
    Decoupled from 2*k (round-2 formula): the fine-probe count is
    w_cap/occ_stride, so tying w_cap to k made a jitter-induced k bump
    80->88 also pay +10% fine gathers for no coverage reason."""
    return min(n_samples, max(k + 32, 160))


def march_rays_hybrid(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    n_samples: int,
    near: float,
    far: float,
    k: int,
    w_cap: int | None = None,
    occ_stride: int = 1,
    coarse_factor: int | None = None,
    aabb_extent: float | None = None,
    fka: str = "xla",
) -> MarchedRays:
    """Two-level windowed-lattice march: coarse window + fine top-k inside.

    The lattice march's profiled cost is the fine-grid occupancy query —
    XLA's serialized TPU gather at ~3.5 ns/row makes ~n_samples/occ_stride
    probes per ray the bill (2.93 of a 5.78 ms flagship step). Level 1
    locates each ray's conservative active window with ~n/16 probes of the
    4 KB coarse dilated table (coarse_window); level 2 runs the EXACT
    strided fine query + top-k compaction of march_rays, but only over the
    w_cap lattice samples starting at the window — w_cap/occ_stride fine
    probes instead of n_samples/occ_stride, and a (k, w_cap) one-hot
    instead of (k, n_samples). Candidate positions stay affine in the
    window start; only the packed-row gathers touch memory dynamically.

    Semantics: identical masking to march_rays within the window (fine
    query is authoritative — no window false-actives); active samples
    beyond start+w_cap are truncated, the same class of loss as
    compact_k's k-truncation. choose_compact_mode only engages this mode
    when the measured span fits w_cap and the active count fits k.
    """
    if w_cap is None:
        w_cap = hybrid_w_cap(k, n_samples)
    w_cap = min(w_cap, n_samples)
    start_idx, _, any_hit = coarse_window(
        grid, origins, directions, n_samples, near, far,
        coarse_factor=coarse_factor, aabb_extent=aabb_extent,
    )
    return _hybrid_fine(
        grid, origins, directions, start_idx, any_hit,
        n_samples, near, far, k, w_cap, occ_stride, fka,
    )


def _hybrid_fine(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    start_idx: jnp.ndarray,
    any_hit: jnp.ndarray,
    n_samples: int,
    near: float,
    far: float,
    k: int,
    w_cap: int,
    occ_stride: int,
    fka: str = "xla",
) -> MarchedRays:
    """Level 2 of the hybrid march: exact strided fine query + first-k
    compaction over the w_cap lattice samples starting at each ray's
    coarse-window start (see march_rays_hybrid)."""
    step = (far - near) / n_samples
    w = jnp.clip(start_idx, 0, max(n_samples - w_cap, 0))  # (R,)

    rel = jnp.arange(w_cap, dtype=jnp.int32)
    abs_idx = w[..., None] + rel  # (R, w_cap)
    t_mid = near + (abs_idx.astype(jnp.float32) + 0.5) * step
    positions = origins[..., None, :] + directions[..., None, :] * t_mid[..., None]

    t_enter, t_exit = ray_aabb_intersect(grid.aabb, origins, directions)
    in_box = (t_mid >= t_enter[..., None]) & (t_mid <= t_exit[..., None])
    if occ_stride > 1:
        # strided probe + bracketing-probe union, exactly as march_rays
        probe_pos = positions[..., ::occ_stride, :]
        occ_p = query_occ(grid, probe_pos)
        left = jnp.repeat(occ_p, occ_stride, axis=-1)[..., :w_cap]
        occ_next = jnp.concatenate([occ_p[..., 1:], occ_p[..., -1:]], axis=-1)
        right = jnp.repeat(occ_next, occ_stride, axis=-1)[..., :w_cap]
        occupied = left | right
    else:
        occupied = query_occ(grid, positions)
    mask = (in_box & occupied & any_hit[..., None]).astype(jnp.float32)

    # first-k-active over the w_cap candidates (as march_rays)
    sel, mask_k = _first_k_active(mask, k, fka)  # (R, k) relative

    abs_sel = (w[..., None] + sel).astype(jnp.float32)
    t_starts_k = near + abs_sel * step
    t_ends_k = t_starts_k + step
    t_mid_k = t_starts_k + step / 2.0
    positions_k = (
        origins[..., None, :] + directions[..., None, :] * t_mid_k[..., None]
    )
    return MarchedRays(
        t_starts=t_starts_k, t_ends=t_ends_k, positions=positions_k, mask=mask_k,
        # pressure: actives within the window (> k = exact k-truncation);
        # an active LAST window sample whose window stops short of the
        # lattice end means the active region may continue past w_cap
        # (conservative — an exactly-edge-ending region also flags)
        active_count=jnp.sum(mask, axis=-1).astype(jnp.int32),
        edge_active=(mask[..., -1] > 0) & (w + w_cap < n_samples),
    )


def march_rays_hybrid2(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    n_samples: int,
    near: float,
    far: float,
    k: int,
    w_lo: int,
    w_cap: int | None = None,
    split: float = 0.75,
    occ_stride: int = 1,
    coarse_factor: int | None = None,
    aabb_extent: float | None = None,
    fka: str = "xla",
) -> MarchedRays:
    """Two-bucket hybrid march: rays sorted by coarse-window SPAN, the
    narrow ``split`` fraction marched at w_lo, the rest at w_cap.

    The hybrid march's bill is the fine-probe count R * w_cap/occ_stride,
    but w_cap is sized by the WORST ray while the span distribution is
    heavily skewed (vessel phantoms, weighted batch: p75 span is ~2-3x
    below the max — most rays cross one branch, the max crosses several).
    Sorting rays by their conservative coarse span (one argsort of (R,)
    int32 + row gathers — microseconds) lets the narrow majority pay a
    w_lo-sized window: fine probes drop to
    split*w_lo + (1-split)*w_cap ~ 0.55-0.8x of R*w_cap.

    Semantics: each bucket runs the EXACT _hybrid_fine march at its own
    width. A lo-bucket ray whose span exceeds w_lo loses its FARTHEST
    active samples (same truncation class as k/w_cap; the training loop
    engages the split only when the measured span quantile fits w_lo and
    re-measures/grows it at check cadence). Output rows are returned in
    the INPUT ray order (inverse permutation applied) — a transparent
    drop-in for march_rays_hybrid.
    """
    n_rays = origins.shape[0]
    if w_cap is None:
        w_cap = hybrid_w_cap(k, n_samples)
    w_cap = min(w_cap, n_samples)
    w_lo = min(max(w_lo, 16), w_cap)
    cut = int(n_rays * split)
    if n_rays < 2 or cut < 1 or cut >= n_rays or w_lo >= w_cap:
        return march_rays_hybrid(
            grid, origins, directions, n_samples, near, far, k,
            w_cap=w_cap, occ_stride=occ_stride,
            coarse_factor=coarse_factor, aabb_extent=aabb_extent, fka=fka,
        )

    start_idx, end_idx, any_hit = coarse_window(
        grid, origins, directions, n_samples, near, far,
        coarse_factor=coarse_factor, aabb_extent=aabb_extent,
    )
    span = jnp.where(any_hit, end_idx - start_idx + 1, 0).astype(jnp.int32)
    perm = jnp.argsort(span)  # stable: deterministic across shardings

    o_s = jnp.take(origins, perm, axis=0)
    d_s = jnp.take(directions, perm, axis=0)
    st_s = jnp.take(start_idx, perm, axis=0)
    ah_s = jnp.take(any_hit, perm, axis=0)

    m_lo = _hybrid_fine(
        grid, o_s[:cut], d_s[:cut], st_s[:cut], ah_s[:cut],
        n_samples, near, far, k, w_lo, occ_stride, fka,
    )
    m_hi = _hybrid_fine(
        grid, o_s[cut:], d_s[cut:], st_s[cut:], ah_s[cut:],
        n_samples, near, far, k, w_cap, occ_stride, fka,
    )

    inv = jnp.argsort(perm)

    def cat(a, b):
        return jnp.take(jnp.concatenate([a, b], axis=0), inv, axis=0)

    return MarchedRays(
        t_starts=cat(m_lo.t_starts, m_hi.t_starts),
        t_ends=cat(m_lo.t_ends, m_hi.t_ends),
        positions=cat(m_lo.positions, m_hi.positions),
        mask=cat(m_lo.mask, m_hi.mask),
        active_count=cat(m_lo.active_count, m_hi.active_count),
        edge_active=cat(m_lo.edge_active, m_hi.edge_active),
    )


class BucketedRays(NamedTuple):
    """Two-bucket march output (``march_rays_hybrid2k``): the span-sorted
    ray batch split into a narrow lo bucket marched at (w_lo, k_lo) and a
    wide hi bucket at (w_cap, k). The buckets deliberately keep DIFFERENT
    per-ray sample counts — the whole point is that the narrow majority
    feeds k_lo < k samples/ray to the MLP — so they cannot be concatenated
    back into one rectangular MarchedRays. ``inv`` maps concat([lo, hi])
    ROW order back to the input ray order; apply it to per-RAY quantities
    (composited pixels) only."""

    lo: MarchedRays  # (R_lo, k_lo)
    hi: MarchedRays  # (R_hi, k)
    inv: jnp.ndarray  # (R,) int32: input ray i came from concat row inv[i]
    # the span-sort permutation (concat row j is input ray perm[j]):
    # lets callers recompute per-bucket quantities from the INPUT-order
    # origins/directions (e.g. the feature-major MLP input,
    # training/train.py::_flat_positions_fm) without re-deriving it as
    # argsort(inv)
    perm: jnp.ndarray | None = None


def march_rays_hybrid2k(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    n_samples: int,
    near: float,
    far: float,
    k: int,
    k_lo: int,
    w_lo: int,
    w_cap: int | None = None,
    split: float = 0.75,
    occ_stride: int = 1,
    coarse_factor: int | None = None,
    aabb_extent: float | None = None,
    fka: str = "xla",
) -> BucketedRays | MarchedRays:
    """Two-bucket hybrid march with PER-BUCKET compaction width.

    ``march_rays_hybrid2`` cuts the fine-probe bill by marching the narrow
    ``split`` fraction of the span-sorted batch at w_lo < w_cap, but both
    buckets still emit k samples/ray — and the MLP (the step's other half,
    benchmarks/MFU.md) prices per POINT. A lo-bucket ray's active count is
    bounded by w_lo and typically far below k, so giving the lo bucket its
    own k_lo shrinks the MLP point count to
    ``split*k_lo + (1-split)*k ~ 0.6-0.75x`` of R*k at the flagship shape.

    Semantics: each bucket runs the EXACT ``_hybrid_fine`` march at its own
    (window, k). Loss classes are exactly hybrid2's w_lo truncation plus
    k_lo-truncation WITHIN the lo bucket — the training loop sizes k_lo
    from the measured lo-bucket active-count maximum (the chooser's
    ``ac_lo`` stat) and re-grows it at check cadence, the same losslessness
    protocol as k/w_cap/w_lo. Degenerate configurations (k_lo >= k, w_lo >=
    w_cap, too few rays) fall back to the single-k marches — callers branch
    on the STATIC return type.
    """
    n_rays = origins.shape[0]
    if w_cap is None:
        w_cap = hybrid_w_cap(k, n_samples)
    w_cap = min(w_cap, n_samples)
    w_lo = min(max(w_lo, 16), w_cap)
    k_lo = min(max(k_lo, 8), k)
    cut = int(n_rays * split)
    if k_lo >= k:
        return march_rays_hybrid2(
            grid, origins, directions, n_samples, near, far, k,
            w_lo=w_lo, w_cap=w_cap, split=split, occ_stride=occ_stride,
            coarse_factor=coarse_factor, aabb_extent=aabb_extent, fka=fka,
        )
    if n_rays < 2 or cut < 1 or cut >= n_rays or w_lo >= w_cap:
        return march_rays_hybrid(
            grid, origins, directions, n_samples, near, far, k,
            w_cap=w_cap, occ_stride=occ_stride,
            coarse_factor=coarse_factor, aabb_extent=aabb_extent, fka=fka,
        )

    start_idx, end_idx, any_hit = coarse_window(
        grid, origins, directions, n_samples, near, far,
        coarse_factor=coarse_factor, aabb_extent=aabb_extent,
    )
    span = jnp.where(any_hit, end_idx - start_idx + 1, 0).astype(jnp.int32)
    perm = jnp.argsort(span)  # stable: deterministic across shardings

    o_s = jnp.take(origins, perm, axis=0)
    d_s = jnp.take(directions, perm, axis=0)
    st_s = jnp.take(start_idx, perm, axis=0)
    ah_s = jnp.take(any_hit, perm, axis=0)

    m_lo = _hybrid_fine(
        grid, o_s[:cut], d_s[:cut], st_s[:cut], ah_s[:cut],
        n_samples, near, far, k_lo, w_lo, occ_stride, fka,
    )
    m_hi = _hybrid_fine(
        grid, o_s[cut:], d_s[cut:], st_s[cut:], ah_s[cut:],
        n_samples, near, far, k, w_cap, occ_stride, fka,
    )
    return BucketedRays(lo=m_lo, hi=m_hi, inv=jnp.argsort(perm), perm=perm)


def compact_rays(m: MarchedRays, k: int) -> MarchedRays:
    """Compact the fixed lattice to the first k active samples per ray.

    This is where nerfacc's real speedup comes from once the occupancy grid
    converges: most of the (n_rays, n_samples) lattice is empty space and
    evaluating the MLP there is wasted MXU time. TPU-native version: rank
    samples by (active, earliest) with a static-k top_k, gather — output
    shapes stay fixed at (n_rays, k). Rays with more than k active samples
    lose their farthest ones (equivalent to a harder early-stop horizon);
    rays with fewer get zero-mask padding (identical render).
    """
    s = m.mask.shape[-1]
    if k >= s:
        return m
    order = jax.lax.broadcasted_iota(jnp.int32, m.mask.shape, m.mask.ndim - 1)
    score = m.mask * (2 * s - order).astype(jnp.float32)  # 0 for inactive
    _, sel = jax.lax.top_k(score, k)
    sel = jnp.sort(sel, axis=-1)  # keep along-ray ordering

    # TPU note: take_along_axis lowers to a slow per-element gather (~30ms
    # for this shape on v5e); a one-hot batched matmul rides the MXU instead
    # (f32 — values like depths at world scale are not bf16-representable)
    onehot = (
        sel[..., :, None]
        == jax.lax.broadcasted_iota(jnp.int32, sel.shape[:-1] + (k, s), sel.ndim)
    ).astype(jnp.float32)

    def take(a):
        return jnp.einsum(
            "rks,rs->rk", onehot, a, preferred_element_type=jnp.float32
        )

    positions = jnp.einsum(
        "rks,rsc->rkc", onehot, m.positions, preferred_element_type=jnp.float32
    )

    return MarchedRays(
        t_starts=take(m.t_starts),
        t_ends=take(m.t_ends),
        positions=positions,
        mask=take(m.mask),
        active_count=jnp.sum(m.mask, axis=-1).astype(jnp.int32),
        edge_active=jnp.zeros(m.mask.shape[:-1], bool),
    )


def prune_mask(
    sigma: jnp.ndarray,
    dists: jnp.ndarray,
    mask: jnp.ndarray,
    alpha_thre: float = 0.0,
    early_stop_eps: float = 0.0,
) -> jnp.ndarray:
    """Refine a marching mask with nerfacc's alpha-threshold and
    transmittance early-stop semantics (nerf_helpers_acc.py:10-31).

    * samples whose provisional alpha ``1 - exp(-sigma*dt)`` is below
      ``alpha_thre`` are dropped (treated as empty);
    * samples after accumulated transmittance falls below
      ``early_stop_eps`` are dropped (ray terminated).
    All on stop_gradient(sigma): pruning must not leak into the backward
    pass, matching the reference's no_grad marching (run_nerf_acc.py:284-287).
    """
    s = jax.lax.stop_gradient(sigma)
    keep = mask
    if alpha_thre > 0.0:
        provisional_alpha = 1.0 - jnp.exp(-s * dists)
        keep = keep * (provisional_alpha >= alpha_thre).astype(jnp.float32)
    if early_stop_eps > 0.0:
        tau = s * dists * keep
        # transmittance *before* each sample (exclusive cumsum)
        trans = jnp.exp(-(jnp.cumsum(tau, axis=-1) - tau))
        keep = keep * (trans >= early_stop_eps).astype(jnp.float32)
    return keep
