"""Training driver: the outer loop around the jitted step.

Mirrors run_nerf_acc.py's experiment behavior end-to-end: periodic eval on
the held-out view, best-checkpoint selection on vessel PSNR (plain PSNR for
binary/random runs, run_nerf_acc.py:376), early stop after
``early_stop_iters`` stale evaluations (:434-440), TensorBoard logging with
the reference's tags, grid VTK exports, readme.txt and the page_data
experiment-metadata dict (:236-251) — while keeping the hot path free of
host round trips: metrics are only fetched on logging steps.
"""

from __future__ import annotations

import dataclasses
import os
import time
from datetime import datetime
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import RayDataset
from .checkpoint import (
    CheckpointManager,
    save_grid_vtk,
    save_model,
)
from .config import TrainConfig, categories_for
from .logging import ExperimentLogger
from .pressure import PressureTuner, Tuning
from .train import (
    TestView,
    create_train_state,
    drop_test_view,
    make_eval_step,
    make_test_view,
    make_train_chunk,
    make_train_step,
)


# truncation-pressure scalars the tuner observes each chunk, in the order
# PressureTuner.observe takes them
_PRESSURE_KEYS = (
    "march/over_k", "march/over_k_lo", "march/edge_rays",
    "march/ac", "march/ac_lo",
)


@jax.jit
def _pressure_stats(sub: dict) -> jnp.ndarray:
    """Reduce a chunk's stacked pressure metrics to ONE (5,) int32 vector
    on device. The loop used to issue five jnp.max dispatches plus a stack
    per chunk — through the tunnel each small dispatch costs ~1.3 ms and
    the blocking fetch a full round-trip; one fused reduction + an async
    D2H copy makes the whole observe ~free (benchmarks/MFU.md r4q7)."""
    z = jnp.zeros((), jnp.int32)
    return jnp.stack(
        [jnp.max(sub[k]) if k in sub else z for k in _PRESSURE_KEYS]
    )


class _AsyncWriter:
    """Daemon artifact writer: latest-wins per tag, never blocks the step.

    The per-display VTK grid exports (2 x 128^3 -> ~2 MB binary files) cost
    ~0.2-0.5 s of host time each on this class of host; during TPU training
    the host is otherwise idle, so formatting + disk IO move off the hot
    loop. Thunks must close over HOST (numpy) data only — device buffers
    are donated into the next step and may be invalidated by the time the
    thread runs.
    """

    def __init__(self):
        import threading

        self._cv = threading.Condition()
        self._pending: dict[str, Any] = {}
        self._open = True
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, tag: str, thunk) -> None:
        with self._cv:
            self._pending[tag] = thunk  # newer write for a tag wins
            self._cv.notify()

    def _run(self) -> None:
        while True:
            with self._cv:
                while self._open and not self._pending:
                    self._cv.wait()
                if not self._pending:
                    return
                tag, thunk = self._pending.popitem()
            try:
                thunk()
            except Exception as e:  # noqa: BLE001 — never kill training for an export
                print(f"async write '{tag}' failed: {e}")

    def close(self) -> None:
        """Flush all pending writes and stop the thread."""
        with self._cv:
            self._open = False
            self._cv.notify()
        self._thread.join(timeout=120)


def _grid_snapshot(grid) -> Any:
    """Host copy of a grid for async VTK export (donation-safe)."""
    from ..ops.occupancy import OccupancyGrid

    b = np.asarray(grid.binary)
    return OccupancyGrid(occs=b, binary=b, aabb=np.asarray(grid.aabb))


@dataclasses.dataclass
class TrainResult:
    state: Any
    best_psnr: float
    best_iter: int
    # held-out PSNR at the best-checkpoint iteration — the quality of the
    # model the protocol actually ships (run_nerf_acc.py:376-385 keeps
    # highmodel.pth by best vessel PSNR and the evaluation pipeline loads
    # THAT model, visualization.py:179). last_psnr point-samples the final
    # eval, which swings ~±1.5 dB between adjacent evals at the near-flat
    # 20k-iter lr (r5 bench: 49.38 @19.5k best ckpt vs 47.87 @20k).
    best_heldout_psnr: float
    last_psnr: float
    iters_run: int
    rays_per_sec: float
    page_data: dict
    # wall-clock breakdown of the production loop (seconds): where the
    # 20k-iter protocol's time actually goes (steady steps vs compiles vs
    # eval/export/choose driver work) — the QUALITY.md overhead accounting
    timing: dict = dataclasses.field(default_factory=dict)


def build_page_data(cfg: TrainConfig, exp_name: str) -> dict:
    """Experiment metadata dict (run_nerf_acc.py:236-251)."""
    sampling = {
        "frangi": "Frangi sampling",
        "segmentation": "Segmentation sampling",
        "random": "Random sampling",
    }[cfg.sampling_strategy]
    return {
        "ID": exp_name,
        "Date start": datetime.now().astimezone().isoformat(),
        "Category": categories_for(cfg),
        "Sparse projections": int((cfg.number_angles + 1) ** 2),
        "Limited projections": int(cfg.limited_size),
        "Translation": "None",
        "Rotation": "None",
        "Data": cfg.data_name.upper(),
        "Binary": cfg.binary,
        "Sampling": [sampling, "AccNeRF"],
        "Model architecture": f"{cfg.num_layers}x{cfg.num_hidden_units}",
        "Positional encoding": cfg.pos_enc.capitalize(),
        "Learning rate": cfg.coarse_lr,
        "Centerpoint": f"({cfg.center_point[0]} {cfg.center_point[1]})",
    }


def train(
    cfg: TrainConfig,
    rays: RayDataset,
    src_pt_z: float,
    log_dir: str | None = None,
    test_view_index: int | None = None,
    rays_per_view: int | None = None,
    verbose: bool = True,
    checkpoint_every: int | None = None,
    mesh: jax.sharding.Mesh | None = None,
    initial_state=None,
) -> TrainResult:
    """Train one reconstruction. ``rays`` holds every view's pixels;
    the test view (default: last) is held out (run_nerf_acc.py:84-86).

    near/far = src_pt_z -+ outside (run_nerf_acc.py:131-134).
    """
    near = src_pt_z - cfg.outside
    far = src_pt_z + cfg.outside

    if rays_per_view is None:
        n_views = int(np.asarray(rays.image_ids).max()) + 1
        rays_per_view = rays.num_rays // n_views
    else:
        n_views = rays.num_rays // rays_per_view
    if test_view_index is None:
        test_view_index = n_views - 1

    test = make_test_view(rays, test_view_index, rays_per_view)
    train_rays = drop_test_view(rays, test_view_index, rays_per_view)

    # without-replacement sampling needs batch <= dataset; shrink the batch
    # for small phantoms (the reference's pandas .sample would throw here)
    if cfg.img_sample_size > train_rays.num_rays:
        new_size = int(np.sqrt(train_rays.num_rays))
        print(
            f"warning: batch {cfg.img_sample_size} > {train_rays.num_rays} "
            f"train rays; shrinking sample_size to {new_size}"
        )
        cfg = dataclasses.replace(cfg, sample_size=new_size)

    if mesh is not None:
        from ..parallel.mesh import shard_leading_axis

        train_rays = shard_leading_axis(train_rays, mesh)

    if cfg.sampling_impl == "overdraw" and cfg.sampling_strategy != "random":
        # one-time inverse-CDF table for the fast sampler (ops/sampling.py);
        # replicated — it is a global structure, not per-ray data
        from ..ops.sampling import build_sampling_table

        table = build_sampling_table(train_rays.weights)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            table = jax.device_put(table, NamedSharding(mesh, PartitionSpec()))
        train_rays = train_rays._replace(sampling_table=table)

    model, state = create_train_state(
        cfg, jax.random.PRNGKey(cfg.seed), num_views=n_views
    )
    if initial_state is not None:  # warm start / state injection
        state = initial_state
    elif cfg.carve_init and not cfg.pose_refine:
        # space-carving grid init from the TRAIN rays only (the held-out
        # view is already dropped — no test leakage): provably-empty cells
        # start and stay pruned (ops/occupancy.py::carve_feasible), so the
        # compacted stepper engages within ~1 check cadence instead of the
        # ~3-4k-iteration EMA prune time. One-time ~100 ms device pass.
        from ..ops.occupancy import carve_feasible, with_packed

        feas = carve_feasible(
            train_rays.origins, train_rays.directions,
            train_rays.pixel_values, state.grid.aabb,
            cfg.grid_resolution, near, far, thresh=cfg.carve_thresh,
        )
        if verbose:
            carved_frac = 1.0 - float(feas.mean())
            print(f"carve_init: {carved_frac:.1%} of cells carved")

        def _carve(g, f):
            return with_packed(g._replace(
                feasible=f, binary=g.binary & f
            ))

        # distinct feasible buffers per grid (one donated TrainState —
        # XLA rejects donating an aliased buffer twice)
        state = state._replace(
            grid=_carve(state.grid, feas),
            vessel_grid=_carve(state.vessel_grid, jnp.array(feas, copy=True)),
        )
    dense_cfg = dataclasses.replace(cfg, compact_samples=0)
    train_step = make_train_step(
        model, dense_cfg, near, far,
        num_images=n_views - 1, rays_per_image=rays_per_view,
    )
    eval_step = make_eval_step(model, dense_cfg, near, far)

    # adaptive empty-space skipping: once the occupancy grid has pruned far
    # enough that every test ray's active samples fit in compact_samples,
    # switch to the compacted stepper (~2x measured on v5e at the converged
    # grid; nerfacc gets its speedup from the same regime). Checked at eval
    # cadence on the held-out view's marching mask.
    # the stepper itself is built lazily at switch time with the march mode
    # choose_compact_mode selects (window when the active span fits k,
    # lattice-top-k for multi-branch rays whose spans do not).
    # Compiled steppers are CACHED by (march_mode, k): through the tunnel a
    # recompile costs ~4-12 s, and grid evolution re-tunes k a handful of
    # times per run — revisiting a (mode, k) pair must be free. The
    # single-step variant compiles only if a partial chunk actually needs
    # it (with chunking it normally never does).
    using_compact = False
    tuning = Tuning()  # the engaged compacted-stepper sizing (cache key)
    want_compact = 0 < cfg.compact_samples < cfg.depth_samples_per_ray
    _stepper_cache: dict = {}

    def _compact_entry():
        entry = _stepper_cache.get(tuning)
        if entry is None:
            entry = {
                "cfg": dataclasses.replace(
                    cfg, march_mode=tuning.mode, compact_samples=tuning.k,
                    hybrid_w_cap=tuning.w_cap, hybrid_w_lo=tuning.w_lo,
                    hybrid_k_lo=tuning.k_lo,
                ),
                "step": None,
                "chunk": None,
            }
            _stepper_cache[tuning] = entry
        return entry

    def compact_step_fn():
        entry = _compact_entry()
        if entry["step"] is None:
            entry["step"] = make_train_step(
                model, entry["cfg"], near, far,
                num_images=n_views - 1, rays_per_image=rays_per_view,
            )
        return entry["step"]

    def compact_chunk_fn():
        entry = _compact_entry()
        if entry["chunk"] is None:
            entry["chunk"] = make_train_chunk(
                model, entry["cfg"], near, far, chunk_c,
                num_images=n_views - 1, rays_per_image=rays_per_view,
            )
        return entry["chunk"]

    # scan-chunked stepping between logging/display boundaries: one device
    # dispatch per chunk_c steps instead of per step (through the tunnel a
    # dispatch costs ~1.3 ms — ~25% of a steady-state step). chunk_c divides
    # every cadence the loop observes, so behavior at boundaries is
    # unchanged.
    import math

    chunk_c = math.gcd(100, cfg.display_every)
    if checkpoint_every:
        chunk_c = math.gcd(chunk_c, checkpoint_every)
    use_chunks = chunk_c > 1
    train_chunk = (
        make_train_chunk(
            model, dense_cfg, near, far, chunk_c,
            num_images=n_views - 1, rays_per_image=rays_per_view,
        )
        if use_chunks
        else None
    )

    # compaction-readiness cadence, rounded up to a chunk boundary so the
    # check actually fires (the loop only observes boundary iterations)
    if use_chunks:
        check_every = max(
            chunk_c, -(-cfg.compact_check_every // chunk_c) * chunk_c
        )
    else:
        check_every = max(1, cfg.compact_check_every)

    writer = _AsyncWriter()
    exp_name = datetime.now().astimezone().strftime("%Y-%m-%d-%H%M")
    page_data = build_page_data(cfg, exp_name)
    logger = ExperimentLogger(log_dir) if log_dir else None
    ckpt_mgr = (
        CheckpointManager(os.path.join(log_dir, "ckpt")) if log_dir and checkpoint_every else None
    )

    # resume-on-preemption (no reference counterpart: the reference can only
    # save, SURVEY.md §5 'Checkpoint / resume')
    start_iter = 0
    if ckpt_mgr and ckpt_mgr.latest_step() is not None:
        restored = ckpt_mgr.restore(state)
        if restored is not None:
            state = restored
            start_iter = int(np.asarray(state.step))
            if verbose:
                print(f"resumed from checkpoint at step {start_iter}")

    highest_psnr = -np.inf
    highest_iter = start_iter
    best_heldout = float("nan")
    last_psnr = float("nan")
    t_start = time.perf_counter()
    rays_done = 0

    # wall-clock phase accounting. "compile" = first invocation of each
    # distinct jitted runner (one step of compute + the trace/compile —
    # through the tunnel the compile dominates at 4-12 s); "step" = all
    # later invocations, blocked to completion so host driver work is not
    # silently charged to the device.
    timing = {
        "step_dense": 0.0, "step_compact": 0.0, "compile": 0.0,
        "eval": 0.0, "choose": 0.0, "log": 0.0, "export": 0.0,
    }
    _seen_runners: set = set()
    _dense_rays = 0  # rays stepped before compaction engaged
    _compact_steady_rays = 0  # compacted rays outside first-call chunks
    # per-Tuning steady (wall, rays) so bench.py can compute a
    # TIME-WEIGHTED effective k over the run instead of flattering or
    # penalizing MFU with whatever the last retune happened to pick
    _steady_phases: dict[Tuning, list] = {}

    # truncation-pressure tuner (training/pressure.py): compacted steppers
    # report march_pressure scalars; any drift (actives outgrowing k,
    # active window edges) forces an immediate re-choose + grow at the
    # NEXT boundary instead of waiting out the re-check cadence, and
    # batch-measured growth persists as floors across probe-blind
    # re-checks. Semantics + the measured drift/thrash numbers that forced
    # each rule live in the module docstring; invariants are pinned by
    # tests/test_pressure_tuner.py. Measured effect (queue11,
    # benchmarks/quality_runs_r3.jsonl): +4.6 dB held-out on the window
    # control, forced-hybrid recovered from −2.2…−5.9 dB to parity.
    tuner = PressureTuner(display_every=cfg.display_every)

    # --- deferred chunk pipeline (benchmarks/MFU.md r4q7) ---
    # Blocking on EVERY chunk (observe fetch + block_until_ready, each a
    # full tunnel round-trip, plus five small jnp.max dispatches) measured
    # 2.3 ms/step of pure host-sync tax at 50-step chunks
    # (chunk_step_sync_ms vs chunk_step_ms, tools/profile_step.py). The
    # fast path now dispatches the NEXT chunk before draining the previous
    # one's pressure stats, so the fetch overlaps device compute and the
    # device never idles between chunks. Every boundary that reads host
    # values — logging, compaction checks/retunes, display/eval, partial
    # chunks, the first call of a new runner (compile timing), an armed
    # tuner.fire — drains first, so tuner/cadence semantics shift by at
    # most one chunk of observe latency.
    pending: list[dict] = []  # dispatched-but-unobserved chunks, FIFO
    t_mark = time.perf_counter()

    def _drain_one():
        nonlocal t_mark, _compact_steady_rays
        e = pending.pop(0)
        if e["stats"] is not None:
            tuner.observe(e["m"], *(int(v) for v in np.asarray(e["stats"])))
        jax.block_until_ready(e["pred"])
        now = time.perf_counter()
        dt = now - t_mark
        if e["new_runner"]:
            timing["compile"] += dt
        elif e["compact"]:
            timing["step_compact"] += dt
            _compact_steady_rays += e["count"] * cfg.img_sample_size
            if e["tuning"] is not None:
                ph = _steady_phases.setdefault(e["tuning"], [0.0, 0])
                ph[0] += dt
                ph[1] += e["count"] * cfg.img_sample_size
        else:
            timing["step_dense"] += dt
        t_mark = now

    n_iter = start_iter
    while n_iter <= cfg.n_iters:
        # run up to (and including) the next boundary iteration — every
        # cadence the loop observes is a multiple of chunk_c
        m = min(-(-n_iter // chunk_c) * chunk_c, cfg.n_iters)
        count = m - n_iter + 1
        full_chunk = use_chunks and count == chunk_c
        if full_chunk:
            runner = compact_chunk_fn() if using_compact else train_chunk
        else:
            runner = compact_step_fn() if using_compact else train_step
        rid = id(runner)
        new_runner = rid not in _seen_runners
        if new_runner:
            _seen_runners.add(rid)
        # isolate compiles and the single-step path from the pipeline
        if pending and (new_runner or not full_chunk):
            while pending:
                _drain_one()
        if not pending:
            t_mark = time.perf_counter()
        if full_chunk:
            state, mstack, pred_pix, target_pix = runner(state, train_rays)
            metrics = {k: v[-1] for k, v in mstack.items()}
            stats = None
            if using_compact and "march/over_k" in mstack:
                stats = _pressure_stats(
                    {k: mstack[k] for k in _PRESSURE_KEYS if k in mstack}
                )
                try:
                    stats.copy_to_host_async()
                except AttributeError:  # backend without async D2H
                    pass
            pending.append({
                "m": m, "count": count, "stats": stats, "pred": pred_pix,
                "new_runner": new_runner, "compact": using_compact,
                "tuning": tuning if using_compact else None,
            })
            # drain the PREVIOUS chunk now that this one is in flight
            while len(pending) > 1:
                _drain_one()
        else:
            for _ in range(count):
                state, metrics, pred_pix, target_pix = runner(
                    state, train_rays
                )
            if using_compact and "march/over_k" in metrics:
                tuner.observe(m, *(
                    int(v) for v in np.asarray(_pressure_stats(
                        {k: metrics[k] for k in _PRESSURE_KEYS
                         if k in metrics}
                    ))
                ))
            jax.block_until_ready(pred_pix)
            now = time.perf_counter()
            dt = now - t_mark
            if new_runner:
                timing["compile"] += dt
            elif using_compact:
                timing["step_compact"] += dt
                _compact_steady_rays += count * cfg.img_sample_size
                ph = _steady_phases.setdefault(tuning, [0.0, 0])
                ph[0] += dt
                ph[1] += count * cfg.img_sample_size
            else:
                timing["step_dense"] += dt
            t_mark = now
        rays_done += count * cfg.img_sample_size
        if not using_compact:
            _dense_rays += count * cfg.img_sample_size
        n_iter = m

        # re-tune cadence of the engaged compacted stepper (used by the
        # retune block below AND by the drain decision): the faster
        # check_every while k is on the INTERIM ladder, display_every once
        # settled. Computed from tuner/tuning state, which only changes at
        # drained boundaries — safe to read before draining.
        recheck = (
            check_every
            if tuning.k > cfg.compact_samples
            else cfg.display_every
        )

        # sync points: drain the in-flight chunk ONLY when a consumer below
        # actually reads host values or tuner state this iteration. The
        # round-4 condition drained at EVERY check_every boundary — which
        # equals the chunk size, so in the settled compact phase the
        # pipeline never overlapped: every chunk ended with a full drain +
        # a ~20-25 ms un-overlapped re-dispatch through the tunnel
        # (benchmarks/MFU.md r4q5: per-outer-dispatch round-trip). Now the
        # settled phase drains only at display/retune boundaries; pressure
        # observation still happens every chunk via the pending<=1
        # pipeline, so tuner latency stays <= two chunk boundaries.
        if pending and (
            (logger is not None and n_iter % 100 == 0)
            or (want_compact and not using_compact
                and n_iter % check_every == 0)
            or (want_compact and using_compact
                and (n_iter % recheck == 0 or tuner.fire))
            or n_iter % cfg.display_every == 0
            or n_iter >= cfg.n_iters
        ):
            while pending:
                _drain_one()

        if logger and n_iter % 100 == 0:
            t0 = time.perf_counter()
            logger.scalars({k: v for k, v in metrics.items() if k != "barf-coarse"}, n_iter)
            p = np.asarray(pred_pix).reshape(cfg.sample_size, cfg.sample_size)
            t = np.asarray(target_pix).reshape(cfg.sample_size, cfg.sample_size)
            logger.train_images(p, t, n_iter)
            timing["log"] += time.perf_counter() - t0

        # compaction-readiness check at its own (faster) cadence: the dense
        # phase runs ~4x slower than compacted, so engaging as soon as the
        # grid has pruned — instead of at display cadence — trims minutes
        # off a 20k-iter run. One jitted probe march per check (~ms).
        if want_compact and not using_compact and n_iter % check_every == 0:
            from .train import choose_compact_mode

            t0 = time.perf_counter()
            choice = choose_compact_mode(
                cfg, state.grid, test.origins, test.directions, near, far
            )
            timing["choose"] += time.perf_counter() - t0
            if choice is not None:
                tuning = tuner.engage(choice, cfg)
                using_compact = True
                if verbose:
                    print(
                        f"switching to compacted stepper at iter {n_iter} "
                        f"(march_mode={tuning.mode}, needed width/ray "
                        f"{choice.width} -> k={tuning.k}, w_cap={tuning.w_cap}"
                        + (f", w_lo={tuning.w_lo}" if tuning.w_lo else "")
                        + (f", k_lo={tuning.k_lo}" if tuning.k_lo else "")
                        + ")"
                    )

        # re-validate / re-tune the engaged compacted stepper. Cadence:
        # display_every once k has settled inside the configured budget;
        # the faster check_every while k is still on the INTERIM ladder
        # (compact_engage_max) — the grid prunes fastest early, and every
        # shrink there is a direct throughput win.
        recheck = (
            check_every
            if tuning.k > cfg.compact_samples
            else cfg.display_every
        )
        if want_compact and using_compact and (
            n_iter % recheck == 0 or tuner.fire
        ):
            # the grid keeps evolving (EMA decay + re-threshold can add
            # cells back): re-pick the mode and re-size k before truncation
            # can bias training; revert to the dense stepper if no
            # compacted mode fits any more. Sizing policy (grow/shrink
            # hysteresis, pressure growth, persistent floors): the tuner.
            from .train import choose_compact_mode

            _before = (tuning, using_compact)
            t0 = time.perf_counter()
            choice = choose_compact_mode(
                cfg, state.grid, test.origins, test.directions, near, far
            )
            timing["choose"] += time.perf_counter() - t0
            if choice is None:
                using_compact = False
                if verbose:
                    print(
                        f"reverting to dense stepper at iter {n_iter} "
                        "(no compacted mode fits the evolved grid)"
                    )
            else:
                tuning2 = tuner.retune(tuning, choice, cfg)
                if tuning2 != tuning:
                    tuning = tuning2
                    if verbose:
                        print(
                            f"retuning compacted stepper at iter {n_iter} "
                            f"(march_mode={tuning.mode}, width {choice.width} "
                            f"-> k={tuning.k}, w_cap={tuning.w_cap}"
                            + (f", w_lo={tuning.w_lo}" if tuning.w_lo else "")
                            + (f", k_lo={tuning.k_lo}" if tuning.k_lo else "")
                            + ")"
                        )
            tuner.resolve(
                n_iter, changed=(tuning, using_compact) != _before,
                recheck=recheck,
            )

        if n_iter % cfg.display_every == 0:
            if using_compact:
                tuner.decay_if_quiet(n_iter)
            t0 = time.perf_counter()
            test_metrics, test_pixels = eval_step(state, test)
            psnr = float(test_metrics["psnr/test-coarse"])
            vessel_psnr = float(test_metrics["psnr/vessel-test-coarse"])
            # first call traces+compiles eval_step (~35 s cold through the
            # tunnel) — charge it to "compile" like the step runners, so
            # "eval" is the recurring cost only
            _eval_bucket = "eval" if id(eval_step) in _seen_runners else "compile"
            _seen_runners.add(id(eval_step))
            timing[_eval_bucket] += time.perf_counter() - t0
            last_psnr = psnr

            # best-model criterion (run_nerf_acc.py:376)
            check = (
                psnr
                if cfg.binary or cfg.sampling_strategy == "random"
                else vessel_psnr
            )
            if verbose:
                it_time = (time.perf_counter() - t_start) / max(n_iter, 1)
                print(
                    f"Iteration: {n_iter}  Loss coarse: {float(test_metrics['loss/test-pixel-coarse']):.6f}  "
                    f"PSNR coarse: {psnr:.3f}  Vessel coarse: {vessel_psnr:.3f}  "
                    f"({it_time*1000:.2f} ms/iter)"
                )

            if logger and n_iter % (cfg.display_every * 2) == 0:
                t0 = time.perf_counter()
                logger.scalars(test_metrics, n_iter)
                img = _assemble_image(test, test_pixels)
                tgt = _assemble_image(test, test.pixel_values)
                logger.test_images(img, tgt, n_iter)
                timing["log"] += time.perf_counter() - t0

            t_exp = time.perf_counter()
            if log_dir and cfg.grid_export:
                g, vg = _grid_snapshot(state.grid), _grid_snapshot(state.vessel_grid)
                writer.submit(
                    "coarsegrid",
                    lambda g=g: save_grid_vtk(
                        os.path.join(log_dir, "coarsegrid.vtk"), g
                    ),
                )
                writer.submit(
                    "coarsevesselgrid",
                    lambda vg=vg: save_grid_vtk(
                        os.path.join(log_dir, "coarsevesselgrid.vtk"), vg
                    ),
                )

            if check >= highest_psnr and n_iter > 0:
                highest_psnr = check
                highest_iter = n_iter
                best_heldout = psnr
                if log_dir:
                    save_model(
                        os.path.join(log_dir, "highmodel.npz"),
                        cfg.model_config().to_model_definition(),
                        state.params,
                        {"step": n_iter, "psnr": psnr, "vessel_psnr": vessel_psnr},
                    )
                    g = _grid_snapshot(state.grid)
                    vg = _grid_snapshot(state.vessel_grid)
                    writer.submit(
                        "highgrid",
                        lambda g=g: save_grid_vtk(
                            os.path.join(log_dir, "highgrid.vtk"), g
                        ),
                    )
                    writer.submit(
                        "highvesselgrid",
                        lambda vg=vg: save_grid_vtk(
                            os.path.join(log_dir, "highvesselgrid.vtk"), vg
                        ),
                    )
                    page_data["Date end"] = datetime.now().astimezone().isoformat()
                    page_data["PSNR"] = round(psnr, 2)
                    page_data["Vessel PSNR"] = round(vessel_psnr, 2)
                    with open(os.path.join(log_dir, "readme.txt"), "w") as f:
                        for k, v in page_data.items():
                            f.write(f"{k}={v}\n")
                        f.write(f"PSNR={psnr} end={datetime.now().astimezone().strftime('%Y-%m-%d-%H%M')}")

            if n_iter % cfg.save_every == 0 and log_dir:
                save_model(
                    os.path.join(log_dir, "coarsemodel.npz"),
                    cfg.model_config().to_model_definition(),
                    state.params,
                    {"step": n_iter},
                )

            if ckpt_mgr and checkpoint_every and n_iter % checkpoint_every == 0 and n_iter > 0:
                ckpt_mgr.save(n_iter, state)
            timing["export"] += time.perf_counter() - t_exp

            # early stop (run_nerf_acc.py:434-440)
            if n_iter - highest_iter >= cfg.early_stop_iters:
                if verbose:
                    print(f"Early stop = {n_iter}")
                break

        n_iter += 1

    elapsed = time.perf_counter() - t_start
    rays_per_sec = rays_done / elapsed if elapsed > 0 else 0.0
    timing["total"] = elapsed
    timing["other"] = max(0.0, elapsed - sum(
        timing[k] for k in ("step_dense", "step_compact", "compile",
                            "eval", "choose", "log", "export")
    ))
    timing["dense_rays"] = _dense_rays
    timing["pressure_fired"] = tuner.fired
    timing["pressure_muted"] = tuner.muted
    timing["decay_bounces"] = tuner.decay_bounces
    timing["steady_rays_per_sec"] = (
        _compact_steady_rays / timing["step_compact"]
        if timing["step_compact"] > 0
        else 0.0
    )
    # the stepper sizing the run ENDED on (an approximation — the loop
    # re-tunes k over the run)...
    timing["tuning_final"] = (
        dataclasses.asdict(tuning) if using_compact else None
    )
    # ...and the full per-Tuning steady breakdown, so bench.py's MFU uses
    # the TIME-WEIGHTED k over the run (VERDICT r4 #7)
    timing["steady_phases"] = [
        {**dataclasses.asdict(t), "wall_s": float(w), "rays": int(r)}
        for t, (w, r) in _steady_phases.items()
    ]
    if verbose:
        print(
            "timing breakdown (s): "
            + "  ".join(
                f"{k}={timing[k]:.1f}"
                for k in ("total", "step_dense", "step_compact", "compile",
                          "eval", "choose", "log", "export", "other")
            )
            + f"  steady={timing['steady_rays_per_sec']:.0f} rays/s"
        )

    writer.close()  # flush pending VTK exports before reporting done
    if logger:
        logger.close()
    if ckpt_mgr:
        ckpt_mgr.close()
    return TrainResult(
        state=state,
        best_psnr=float(highest_psnr),
        best_iter=int(highest_iter),
        best_heldout_psnr=float(best_heldout),
        last_psnr=float(last_psnr),
        iters_run=int(min(n_iter, cfg.n_iters)),
        rays_per_sec=float(rays_per_sec),
        page_data=page_data,
        timing={k: (float(v) if isinstance(v, float) else v) for k, v in timing.items()},
    )


def _assemble_image(test: TestView, pixel_values) -> np.ndarray:
    """Scatter per-ray values back into the (W, H) test image layout the
    reference uses (test_img[x_positions, y_positions], run_nerf_acc.py:97-99)."""
    img = np.zeros((test.img_width, test.img_height), np.float32)
    img[np.asarray(test.x_positions), np.asarray(test.y_positions)] = np.asarray(
        pixel_values
    )
    return img
