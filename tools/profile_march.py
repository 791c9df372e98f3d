"""Hybrid-march sub-stage decomposition on the real TPU.

Times the pieces of march_rays_hybrid in isolation — coarse window, fine
strided occupancy query, top-k + sort_key_val compaction — plus the whole
march and the full training step, at the flagship bench workload. Guides
gather-count work (the march is the profiled top cost of the step,
benchmarks/MFU.md).

Usage: python tools/profile_march.py [--k 80]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()  # axon platform is off JAX's cache allowlist
import jax.numpy as jnp
import numpy as np


def timeit_on_device(body, n_inner=50, warmup=1, iters=4):
    run = jax.jit(
        lambda: jax.lax.fori_loop(
            0, n_inner, lambda i, acc: acc + body(i), jnp.float32(0.0)
        )
    )
    for _ in range(warmup):
        run().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        run().block_until_ready()
    return (time.perf_counter() - t0) / (iters * n_inner)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=80)
    ap.add_argument("--rays", type=int, default=5625)
    ap.add_argument("--train_iters", type=int, default=3000)
    args = ap.parse_args()

    import dataclasses

    from nerf_for_angiography_tpu.data import (
        DatagenConfig, generate_dataset, make_vessel_volume,
    )
    from nerf_for_angiography_tpu.ops.occupancy import (
        coarse_window, hybrid_w_cap, march_rays_hybrid, query_occ,
        safe_occ_stride,
    )
    from nerf_for_angiography_tpu.training import TrainConfig, create_train_state
    from nerf_for_angiography_tpu.training.train import make_train_chunk

    cfg = TrainConfig(march_mode="hybrid", compact_samples=args.k)
    dcfg = DatagenConfig(
        limited_size=180.0, number_angles=4.0, img_width=100, img_height=100,
        sample_outside=100.0, stratified_depths=False,
    )
    vol = make_vessel_volume(res=96)
    ds = generate_dataset(vol, dcfg)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))

    dense_cfg = dataclasses.replace(cfg, compact_samples=0)
    chunk = make_train_chunk(model, dense_cfg, 1400.0, 1600.0, 50)
    for _ in range(args.train_iters // 50):
        state, *_ = chunk(state, ds.rays)
    jax.block_until_ready(state.params)
    print(f"occupancy {float(jnp.mean(state.grid.binary)):.4f}", file=sys.stderr)

    o = ds.rays.origins[: args.rays]
    d = ds.rays.directions[: args.rays]
    near, far = 1400.0, 1600.0
    n = cfg.depth_samples_per_ray
    k = args.k
    w_cap = hybrid_w_cap(k, n)
    stride = safe_occ_stride(
        cfg.occ_stride, n, near, far, 2 * cfg.outside, cfg.grid_resolution
    )
    grid = state.grid
    step_sz = (far - near) / n
    results = {"k": k, "w_cap": w_cap, "occ_stride": stride}

    # (a) coarse window alone
    results["coarse_window_ms"] = timeit_on_device(
        lambda i: jnp.sum(coarse_window(
            grid, o + i * 1e-6, d, n, near, far, aabb_extent=200.0
        )[0].astype(jnp.float32))
    ) * 1e3

    # (b) fine strided query alone (window starts precomputed, constant)
    start, _, _ = jax.jit(lambda: coarse_window(
        grid, o, d, n, near, far, aabb_extent=200.0))()
    w0 = jnp.clip(start, 0, max(n - w_cap, 0))
    rel = jnp.arange(0, w_cap, stride, dtype=jnp.int32)

    def fine_query(i):
        t_mid = near + ((w0[..., None] + rel).astype(jnp.float32) + 0.5) * step_sz
        pos = (o + i * 1e-6)[..., None, :] + d[..., None, :] * t_mid[..., None]
        return jnp.sum(query_occ(grid, pos).astype(jnp.float32))

    results["fine_query_ms"] = timeit_on_device(fine_query) * 1e3

    # (c) top-k + sort_key_val compaction alone (fixed mask, perturbed)
    m_full = jax.jit(lambda: march_rays_hybrid(
        grid, o, d, n, near, far, k=k, occ_stride=stride, aabb_extent=200.0))()
    # rebuild a (R, w_cap) candidate mask analogous to the in-march one
    base_mask = jax.jit(lambda: (query_occ(
        grid,
        o[..., None, :] + d[..., None, :] * (
            near + ((w0[..., None] + jnp.arange(w_cap)).astype(jnp.float32) + 0.5)
            * step_sz)[..., None],
    )).astype(jnp.float32))()

    def compaction(i):
        mask = base_mask + i * 1e-9
        order = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
        score = mask * (2 * w_cap - order).astype(jnp.float32)
        vals, sel = jax.lax.top_k(score, k)
        sel, vals = jax.lax.sort_key_val(sel, vals, dimension=-1)
        return jnp.sum(sel.astype(jnp.float32)) + jnp.sum(vals)

    results["topk_sort_ms"] = timeit_on_device(compaction) * 1e3

    # (d) whole hybrid march
    results["hybrid_march_ms"] = timeit_on_device(
        lambda i: jnp.sum(march_rays_hybrid(
            grid, o + i * 1e-6, d, n, near, far, k=k,
            occ_stride=stride, aabb_extent=200.0
        ).mask)
    ) * 1e3

    # (e) full step at this (mode, k)
    step_chunk = make_train_chunk(model, cfg, near, far, 50)
    st = state
    for _ in range(2):
        st, *_ = step_chunk(st, ds.rays)
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    calls = 6
    for _ in range(calls):
        st, *_ = step_chunk(st, ds.rays)
    jax.block_until_ready(st.params)
    results["full_step_ms"] = (time.perf_counter() - t0) / (calls * 50) * 1e3
    results["rays_per_sec"] = cfg.img_sample_size / (results["full_step_ms"] / 1e3)

    print(json.dumps({k2: (round(v, 4) if isinstance(v, float) else v)
                      for k2, v in results.items()}))


if __name__ == "__main__":
    main()
