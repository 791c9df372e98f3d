"""Benchmark: training throughput (rays/sec/chip) at the reference's
flagship workload — 75^2 = 5,625 rays/iter, 300 samples/ray, 4x128 CPPN,
128^3 occupancy grid with EMA updates every 16 steps (run_nerf_acc.py
constants, BASELINE.md).

Baseline protocol (SURVEY.md §6): the reference publishes no absolute
throughput; its effective rate is 5,625 rays / measured iteration time on a
single GPU. BASELINE_RAYS_PER_SEC below is the estimated single-GPU
reference rate (5,625 rays / ~60 ms per iteration: pandas weighted sampling
on the host each iteration + double MLP evaluation per sample dominate,
SURVEY.md §3.1). vs_baseline = measured / baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _watchdog(seconds: int = 240):
    """The axon TPU tunnel can wedge (every op blocks forever). Fail loudly
    instead of hanging the driver."""

    def onalarm(signum, frame):
        sys.stderr.write(
            "bench: TPU device did not respond within "
            f"{seconds}s (axon tunnel wedged?); aborting\n"
        )
        os._exit(1)

    signal.signal(signal.SIGALRM, onalarm)
    signal.alarm(seconds)

# 5,625 rays / 60 ms — estimated effective single-GPU rate of the reference
# training loop (no published number exists; see module docstring).
BASELINE_RAYS_PER_SEC = 93_750.0


def main():
    _watchdog(240)
    # health check: trivial op round-trips before committing to the run
    float(jnp.ones(4).sum())
    signal.alarm(0)
    _watchdog(540)

    from nerf_for_angiography_tpu.data import (
        DatagenConfig,
        generate_dataset,
        make_vessel_volume,
    )
    from nerf_for_angiography_tpu.training import (
        TrainConfig,
        create_train_state,
    )
    from nerf_for_angiography_tpu.training.train import make_train_chunk

    # reference flagship workload (run_nerf_acc.py:129-183)
    cfg = TrainConfig()  # 75^2 rays, 300 samples, 4x128, 128^3 grid
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

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    # identical math to single stepping (bit-parity tested), with host
    # dispatch amortized over a scan of 25 steps per call
    steps_per_call = 25
    chunk = make_train_chunk(model, cfg, 1400.0, 1600.0, steps_per_call)

    # warmup + compile
    for _ in range(2):
        state, metrics, _, _ = chunk(state, ds.rays)
    float(jnp.sum(metrics["loss/train-pixel-coarse"]))  # force sync

    calls = 4
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics, _, _ = chunk(state, ds.rays)
    float(jnp.sum(metrics["loss/train-pixel-coarse"]))  # force sync
    elapsed = time.perf_counter() - t0

    iters = calls * steps_per_call
    rays_per_sec = cfg.img_sample_size * iters / elapsed
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
