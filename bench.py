"""Benchmark: the SHIPPED production protocol, end to end — throughput and
quality from ONE run.

Workload: the reference's flagship training problem (run_nerf_acc.py
constants, BASELINE.md) — 26-view vessel-phantom dataset at 100x100 px,
custom 135/135 view held out, 75^2 = 5,625 rays/iter, 300 samples/ray,
4x128 CPPN, 128^3 occupancy grid — trained for 20k iterations through the
production ``train()`` loop at the SHIPPED ``TrainConfig`` defaults
(carve init, interim compaction engagement, two-bucket per-k hybrid march,
pressure floors). Round 3 reported throughput from a no-carve synthetic
protocol and quality from separate runs; since round 4 both numbers come
from the same run (VERDICT r3 weak #2).

Headline value = STEADY rays/s: in-loop compacted-stepper wall time only
(excludes one-time compiles — through the axon tunnel a cold compile bill
is ~150-600 s of pure XLA latency that says nothing about the hardware —
but INCLUDES every recurring cost: grid updates, pressure observation,
sampler, host sync). ``e2e_rays_per_sec`` is the everything-included rate
and ``heldout_psnr_db`` the 135/135 view's PSNR at 20k iters — the same
protocol benchmarks/QUALITY.md tracks (50.05-50.63 dB controls at r3).

Baseline: the reference publishes no absolute throughput; its effective
rate is 5,625 rays / measured iteration time on a single GPU
(run_nerf_acc.py:335-336). BASELINE_RAYS_PER_SEC estimates that at ~60
ms/iteration (host-side pandas weighted sampling every iteration + double
MLP evaluation per sample dominate, SURVEY.md §3.1). vs_baseline =
measured / baseline, labeled "estimated".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
BENCH_ITERS overrides the 20k (smoke runs); the JSON records it.
"""

import json
import os
import signal
import sys
import time

# the fused Pallas MLP (default on TPU) compiles through the axon tunnel's
# remote-compile shim; must be set before backend init
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
# persistent XLA executable cache: identical programs (re-runs, seed
# grids, the bench) skip the 4-12 s remote compiles entirely
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax.numpy as jnp

from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

# JAX's stock gate rejects the axon platform name — force-enable (safe:
# read/write failures degrade to a warning + normal compile)
enable_persistent_cache()

# 5,625 rays / 60 ms — estimated effective single-GPU rate of the reference
# training loop (no published number exists; see module docstring).
BASELINE_RAYS_PER_SEC = 93_750.0


def _kill_stray_tpu_clients() -> None:
    """A SECOND concurrent axon client is the most common cause of a wedged
    tunnel (CLAUDE.md): a backgrounded python that touched any jnp op holds
    the tunnel until it exits. Scan /proc for python processes that are
    neither this process, nor its ancestors, nor the tunnel infrastructure
    itself, and kill them by SPECIFIC PID (never by pattern — a pattern can
    match the driver's own command line)."""
    protected = {"tpu_init", "process_api", "stdio_shim", "claude"}
    me = os.getpid()
    ancestors = set()
    pid = me
    for _ in range(32):  # walk up the parent chain
        try:
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
        ancestors.add(pid)
        if ppid <= 1:
            break
        pid = ppid
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        p = int(entry)
        if p == me or p in ancestors:
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="replace")
        except OSError:
            continue
        if "python" not in cmd:
            continue
        if any(tag in cmd for tag in protected):
            continue
        sys.stderr.write(f"bench: killing stray python client pid={p}: {cmd[:120]}\n")
        try:
            os.kill(p, signal.SIGTERM)
        except OSError:
            continue
    # give SIGTERM'd clients a moment to release the tunnel, then SIGKILL
    time.sleep(5)
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        p = int(entry)
        if p == me or p in ancestors:
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="replace")
            if "python" in cmd and not any(t in cmd for t in protected):
                os.kill(p, signal.SIGKILL)
        except OSError:
            continue


def _watchdog(seconds: int):
    """The axon TPU tunnel can wedge (every op blocks forever). Fail loudly
    instead of hanging the driver — and, since the wedge is often transient
    but latches the in-process backend, re-exec a fresh process after a
    cool-down before giving up. Wedges self-heal in 2-10 min once only one
    client remains (CLAUDE.md), so the cool-downs back off exponentially:
    60 s, 150 s, 360 s, 600 s across up to 4 retries (~20 min total) —
    the round-4 single 120 s retry was under-powered against a real wedge
    (BENCH_r04: both attempts hit the same wedge window)."""
    cooldowns = [60, 150, 360, 600]

    def onalarm(signum, frame):
        sys.stderr.write(
            "bench: TPU device did not respond within "
            f"{seconds}s (axon tunnel wedged?)\n"
        )
        attempt = int(os.environ.get("BENCH_WEDGE_RETRY", "0"))
        if attempt < len(cooldowns):
            _kill_stray_tpu_clients()
            wait = cooldowns[attempt]
            sys.stderr.write(
                f"bench: retry {attempt + 1}/{len(cooldowns)} in a fresh "
                f"process after a {wait}s cool-down...\n"
            )
            sys.stderr.flush()
            time.sleep(wait)
            env = dict(os.environ, BENCH_WEDGE_RETRY=str(attempt + 1))
            os.execve(sys.executable, [sys.executable, __file__], env)
        sys.stderr.write("bench: still wedged after all retries; aborting\n")
        os._exit(1)

    signal.signal(signal.SIGALRM, onalarm)
    signal.alarm(seconds)


def main():
    # the health check itself retries through the watchdog's fresh-process
    # backoff ladder: a wedge at THIS point costs one 240 s window + the
    # cool-down per attempt, not the whole run
    _watchdog(240)
    # health check: trivial op round-trips before committing to the run
    float(jnp.ones(4).sum())
    signal.alarm(0)

    from nerf_for_angiography_tpu.data import (
        DatagenConfig,
        generate_dataset,
        make_vessel_volume,
    )
    from nerf_for_angiography_tpu.training import TrainConfig
    from nerf_for_angiography_tpu.training.loop import train

    iters = int(os.environ.get("BENCH_ITERS", "20000"))
    # SHIPPED defaults — the whole point of the protocol. Only the
    # schedule length is pinned.
    cfg = TrainConfig(n_iters=iters)
    dcfg = DatagenConfig(
        limited_size=180.0,
        number_angles=4.0,  # (4+1)^2 + 1 views
        img_width=100,
        img_height=100,
        sample_outside=100.0,
        stratified_depths=False,
    )
    vol = make_vessel_volume(res=96)
    ds = generate_dataset(vol, dcfg)

    # generous wedge alarm for the full run: a healthy 20k protocol is
    # ~150 s stepping + up to ~600 s cold remote compiles; past 2400 s
    # something is wedged, not slow
    _watchdog(2400)
    import contextlib

    # stdout carries ONLY the one JSON line (driver contract); the loop's
    # progress/retune prints go to stderr (tools/retune_stats.py reads
    # them from the queue logs either way)
    with contextlib.redirect_stdout(sys.stderr):
        res = train(cfg, ds.rays, src_pt_z=1500.0, verbose=True)
    signal.alarm(0)

    t = res.timing
    steady = float(t.get("steady_rays_per_sec") or 0.0)
    if steady <= 0.0:  # never compacted (shouldn't happen at defaults)
        steady = res.rays_per_sec
    step_ms = 1e3 * cfg.img_sample_size / steady if steady else 0.0

    # Measured-FLOP MFU anchor (benchmarks/MFU.md accounting): per-point
    # MLP fwd = (3*128 + 4*128^2 + 128) MACs; fwd+bwd ~ 3x fwd; points/step
    # = batch * the TIME-WEIGHTED compacted width over the run's steady
    # phases (the loop re-tunes k; weighting by per-Tuning wall keeps the
    # headline MFU from being flattered or penalized by whatever the last
    # retune picked — VERDICT r4 #7). v5e bf16 peak = 197 TF/s.
    def _phase_k(ph: dict) -> float:
        k = float(ph.get("k") or cfg.compact_samples or cfg.depth_samples_per_ray)
        if ph.get("k_lo") and cfg.hybrid_split > 0:
            k = cfg.hybrid_split * ph["k_lo"] + (1 - cfg.hybrid_split) * k
        return k

    phases = t.get("steady_phases") or []
    phase_wall = sum(p["wall_s"] for p in phases)
    if phase_wall > 0:
        k_eff = sum(_phase_k(p) * p["wall_s"] for p in phases) / phase_wall
    else:  # never compacted: fall back to the final tuning / config widths
        k_eff = _phase_k(t.get("tuning_final") or {})

    # settled-phase rate: the longest-wall steady phase (the run's final
    # tuning once the grid stops pruning). The headline steady number
    # blends the interim-k engagement ladder (k 160->128->96 as the grid
    # prunes — physics, not loop overhead); this shows the rate the loop
    # actually sustains once settled (r5: 1.218M vs 1.069M blended).
    dom = max(phases, key=lambda p: p["wall_s"], default=None)
    settled = dom["rays"] / dom["wall_s"] if dom and dom["wall_s"] > 0 else 0.0
    f = cfg.num_hidden_units
    macs_fwd = 3 * f + cfg.num_layers * f * f + f
    flop_per_step = cfg.img_sample_size * k_eff * macs_fwd * 2 * 3
    mfu_pct = (
        100.0 * flop_per_step / (step_ms * 1e-3) / 197e12 if step_ms else 0.0
    )

    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(steady, 1),
        "unit": "rays/s",
        "vs_baseline": round(steady / BASELINE_RAYS_PER_SEC, 3),
        "baseline": "estimated",  # 5,625 rays / ~60 ms-iter single-GPU guess
        "protocol": f"production-{iters // 1000}k",
        # held-out PSNR of the model the protocol SHIPS — the best
        # checkpoint (run_nerf_acc.py:376-385 highmodel semantics; the
        # reference's evaluation loads that model, visualization.py:179).
        # final_psnr_db is the last eval's point sample, which swings
        # ~±1.5 dB between adjacent evals at the near-flat 20k lr.
        "heldout_psnr_db": round(res.best_heldout_psnr, 2),
        "final_psnr_db": round(res.last_psnr, 2),
        "best_vessel_psnr_db": round(res.best_psnr, 2),
        "e2e_rays_per_sec": round(res.rays_per_sec, 1),
        "step_ms": round(step_ms, 3),
        "mfu_pct": round(mfu_pct, 1),
        "settled_rays_per_sec": round(settled, 1),
        "decay_bounces": t.get("decay_bounces", 0),
        "wall_s": round(float(t.get("total", 0.0)), 1),
        "compile_s": round(float(t.get("compile", 0.0)), 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
