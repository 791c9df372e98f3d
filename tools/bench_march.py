"""Decompose the hybrid march cost on the TPU at the flagship shape.

Stages timed in isolation (on-device fori_loop, tools/profile_step.py
conventions): coarse window only, fine strided query only (w_cap window),
first-k-active compaction only, full hybrid march, and the w_cap
sensitivity (160 vs 192 vs 224).

Usage: python tools/bench_march.py [--rays 5625] [--k 88]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
# persistent XLA executable cache: identical programs (re-runs, seed
# grids, the bench) skip the 4-12 s remote compiles entirely
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()  # axon platform is off JAX's cache allowlist
import jax.numpy as jnp

from tools.profile_step import timeit_on_device  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=5625)
    ap.add_argument("--k", type=int, default=88)
    ap.add_argument("--train_iters", type=int, default=3000)
    args = ap.parse_args()

    import dataclasses

    from nerf_for_angiography_tpu.data import (
        DatagenConfig, generate_dataset, make_vessel_volume,
    )
    from nerf_for_angiography_tpu.ops.occupancy import (
        _first_k_active, coarse_window, march_rays_hybrid, query_occ,
        ray_aabb_intersect, safe_occ_stride,
    )
    from nerf_for_angiography_tpu.training import TrainConfig, create_train_state
    from nerf_for_angiography_tpu.training.train import make_train_chunk

    cfg = TrainConfig()
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

    grid = state.grid
    o = ds.rays.origins[: args.rays]
    d = ds.rays.directions[: args.rays]
    near, far, n = 1400.0, 1600.0, cfg.depth_samples_per_ray
    extent = 2 * cfg.outside
    stride = safe_occ_stride(cfg.occ_stride, n, near, far, extent,
                             cfg.grid_resolution)
    step = (far - near) / n
    results = {"occ_stride": stride}

    # coarse window only
    results["coarse_window_ms"] = timeit_on_device(
        lambda i: jnp.sum(coarse_window(
            grid, o + i * 1e-6, d, n, near, far, aabb_extent=extent)[0])
    ) * 1e3

    # fine strided query only, over a fixed window at w_cap candidates
    def fine_only(i, w_cap):
        w0, _, _ = coarse_window(grid, o, d, n, near, far, aabb_extent=extent)
        w = jnp.clip(w0, 0, max(n - w_cap, 0))
        rel = jnp.arange(w_cap, dtype=jnp.int32)
        t_mid = near + ((w[..., None] + rel).astype(jnp.float32) + 0.5) * step
        pos = o[..., None, :] + d[..., None, :] * t_mid[..., None] + i * 1e-6
        return jnp.sum(query_occ(grid, pos[..., ::stride, :]))

    for w_cap in (160, 192):
        results[f"coarse+fine{w_cap}_ms"] = timeit_on_device(
            lambda i, w=w_cap: fine_only(i, w)
        ) * 1e3

    # compaction only (random mask at the converged activity rate)
    mask = (
        jax.random.uniform(jax.random.PRNGKey(0), (args.rays, 160)) < 0.45
    ).astype(jnp.float32)
    results["compaction_ms"] = timeit_on_device(
        lambda i: jnp.sum(_first_k_active(jnp.roll(mask, i, 0), args.k)[1])
    ) * 1e3

    # aabb intersect only (for an analytic-window ablation)
    results["aabb_ms"] = timeit_on_device(
        lambda i: jnp.sum(ray_aabb_intersect(grid.aabb, o + i * 1e-6, d)[0])
    ) * 1e3

    # full hybrid march at w_cap 160 / 192
    for w_cap in (160, 192):
        results[f"hybrid{w_cap}_ms"] = timeit_on_device(
            lambda i, w=w_cap: jnp.sum(march_rays_hybrid(
                grid, o + i * 1e-6, d, n, near, far, k=args.k, w_cap=w,
                occ_stride=stride, aabb_extent=extent).mask)
        ) * 1e3

    # --- two-bucket hybrid (march_rays_hybrid2) on a WEIGHTED batch ---
    # the training batch is importance-sampled onto the vessel; spans and
    # the split's payoff must be measured under that distribution, not the
    # raster-order rays above
    from nerf_for_angiography_tpu.ops.occupancy import march_rays_hybrid2
    from nerf_for_angiography_tpu.ops.sampling import (
        build_sampling_table, sample_pixel_rays,
    )

    rays_t = ds.rays._replace(
        sampling_table=build_sampling_table(ds.rays.weights)
    )
    batch = sample_pixel_rays(
        jax.random.PRNGKey(7), rays_t, args.rays, weighted=True,
        impl="overdraw",
    )
    ow, dw = batch.origins, batch.directions
    c_start, c_end, c_hit = jax.jit(
        lambda o_, d_: coarse_window(grid, o_, d_, n, near, far,
                                     aabb_extent=extent)
    )(ow, dw)
    import numpy as _np
    span = _np.asarray(
        jnp.where(c_hit, c_end - c_start + 1, 0).astype(jnp.int32)
    )
    results["span_pct_weighted"] = {
        f"p{p}": int(_np.percentile(span, p)) for p in (50, 75, 90, 100)
    }
    results["span_hit_frac"] = round(float(_np.asarray(c_hit).mean()), 4)

    for w_lo in (64, 96, 128):
        results[f"hybrid2_{w_lo}_160_ms"] = timeit_on_device(
            lambda i, w=w_lo: jnp.sum(march_rays_hybrid2(
                grid, ow + i * 1e-6, dw, n, near, far, k=args.k,
                w_lo=w, w_cap=160, split=0.75,
                occ_stride=stride, aabb_extent=extent).mask)
        ) * 1e3
    # single-bucket on the same weighted batch (the fair baseline)
    results["hybrid160_weighted_ms"] = timeit_on_device(
        lambda i: jnp.sum(march_rays_hybrid(
            grid, ow + i * 1e-6, dw, n, near, far, k=args.k, w_cap=160,
            occ_stride=stride, aabb_extent=extent).mask)
    ) * 1e3

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
