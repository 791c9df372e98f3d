"""Decompose the steady-state training step cost on the real TPU.

Times each stage of the compacted step in isolation (march only, MLP
fwd, MLP fwd+bwd, composite, full step) at the flagship bench workload so
kernel work targets the measured bottleneck instead of guesses. Writes one
JSON line per stage.

Usage: python tools/profile_step.py [--mode window|lattice|dense] [--k 96]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, warmup=2, iters=20):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out,
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out,
    )
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="lattice")
    ap.add_argument("--k", type=int, default=96)
    ap.add_argument("--rays", type=int, default=5625)
    ap.add_argument("--train_iters", type=int, default=3000)
    args = ap.parse_args()

    import dataclasses

    from nerf_for_angiography_tpu.data import (
        DatagenConfig, generate_dataset, make_vessel_volume,
    )
    from nerf_for_angiography_tpu.ops.occupancy import (
        march_rays, march_rays_window, safe_occ_stride,
    )
    from nerf_for_angiography_tpu.training import TrainConfig, create_train_state
    from nerf_for_angiography_tpu.training.train import (
        density_raw, make_train_chunk, make_train_step,
    )

    cfg = TrainConfig(march_mode=args.mode, compact_samples=args.k)
    dcfg = DatagenConfig(
        limited_size=180.0, number_angles=4.0, img_width=100, img_height=100,
        sample_outside=100.0, stratified_depths=False,
    )
    vol = make_vessel_volume(res=96)
    ds = generate_dataset(vol, dcfg)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))

    # reach the pruned-grid steady state quickly with the dense chunked step
    dense_cfg = dataclasses.replace(cfg, compact_samples=0)
    chunk = make_train_chunk(model, dense_cfg, 1400.0, 1600.0, 50)
    for _ in range(args.train_iters // 50):
        state, *_ = chunk(state, ds.rays)
    jax.block_until_ready(state.params)
    print(
        f"occupancy {float(jnp.mean(state.grid.binary)):.4f}", file=sys.stderr
    )

    o = ds.rays.origins[: args.rays]
    d = ds.rays.directions[: args.rays]
    near, far = 1400.0, 1600.0
    n = cfg.depth_samples_per_ray
    results = {}

    # --- march variants ---
    if args.mode == "window":
        march = jax.jit(lambda g: march_rays_window(
            g, o, d, n, near, far, k=args.k, aabb_extent=2 * cfg.outside))
    else:
        stride = safe_occ_stride(
            cfg.occ_stride, n, near, far, 2 * cfg.outside, cfg.grid_resolution
        )
        march = jax.jit(lambda g: march_rays(
            g, o, d, n, near, far,
            compact_k=args.k if args.mode == "lattice" else None,
            occ_stride=stride))
    results["march_ms"] = timeit(march, state.grid) * 1e3
    m = march(state.grid)
    pts = m.positions.reshape(-1, 3)

    # --- MLP on the compacted points ---
    fwd = jax.jit(lambda p, x: density_raw(model, p, x, 0.0, cfg.mlp_backend))
    results["mlp_fwd_ms"] = timeit(fwd, state.params, pts) * 1e3

    def loss(p, x):
        return jnp.sum(density_raw(model, p, x, 0.0, cfg.mlp_backend))

    g = jax.jit(jax.grad(loss))
    results["mlp_fwdbwd_ms"] = timeit(g, state.params, pts) * 1e3

    fwd_x = jax.jit(lambda p, x: density_raw(model, p, x, 0.0, "xla"))
    results["mlp_fwd_xla_ms"] = timeit(fwd_x, state.params, pts) * 1e3
    gx = jax.jit(jax.grad(lambda p, x: jnp.sum(density_raw(model, p, x, 0.0, "xla"))))
    results["mlp_fwdbwd_xla_ms"] = timeit(gx, state.params, pts) * 1e3

    # --- full step ---
    use_cfg = cfg if args.mode != "dense" else dense_cfg
    step = make_train_step(model, use_cfg, near, far)
    results["full_step_ms"] = timeit(lambda s: step(s, ds.rays)[0], state) * 1e3
    results["rays_per_sec"] = cfg.img_sample_size / (results["full_step_ms"] / 1e3)

    # --- MFU accounting ---
    f = cfg.num_hidden_units
    n_hidden = cfg.num_layers
    macs_pt = 3 * f + n_hidden * f * f + f
    flop_step = cfg.img_sample_size * args.k * macs_pt * 2 * 3  # fwd+bwd~3x
    results["mlp_flop_per_step"] = flop_step
    results["mfu_vs_197tf"] = (
        flop_step / (results["full_step_ms"] / 1e3) / 197e12
    )
    results["mode"] = args.mode
    results["k"] = args.k
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
