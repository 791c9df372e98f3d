"""Per-op wall-clock profile of the flagship compacted training step.

Synthesizes a converged-looking state instantly instead of training 3k
iterations: the occupancy grid is built from the analytic vessel phantom's
density through the CT transfer function (same occupied topology as a
trained grid), and params are random (throughput is data-independent).

Timings use the float() fetch-sync pattern (block_until_ready is unreliable
through the axon tunnel, CLAUDE.md). One TPU process at a time.

Usage: python tools/profile_step.py [--dense]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def _sync(out):
    leaves = jax.tree.leaves(out)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dense", action="store_true", help="profile dense (uncompacted) step")
    args = ap.parse_args()

    from nerf_for_angiography_tpu.data import (
        DatagenConfig, generate_dataset, make_vessel_volume,
    )
    from nerf_for_angiography_tpu.ops import occupancy as occ
    from nerf_for_angiography_tpu.ops.sampling import sample_pixel_rays
    from nerf_for_angiography_tpu.training import TrainConfig, create_train_state
    from nerf_for_angiography_tpu.training.train import (
        make_train_chunk, make_train_step, render_rays, _sigma_fn,
    )

    cfg = TrainConfig()
    if args.dense:
        import dataclasses
        cfg = dataclasses.replace(cfg, compact_samples=0)
    dcfg = DatagenConfig(
        limited_size=180.0, number_angles=4.0, img_width=100, img_height=100,
        sample_outside=100.0, stratified_depths=False,
    )
    vol = make_vessel_volume(res=96)
    ds = generate_dataset(vol, dcfg)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))

    # synthetic converged grid: occupied where the phantom volume attenuates
    res = cfg.grid_resolution
    lin = (np.arange(res) + 0.5) / res * 200.0 - 100.0
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3), jnp.float32)
    from nerf_for_angiography_tpu.ops.interpolation import trilinear

    # the phantom volume stores attenuation directly (make_vessel_volume),
    # no HU transfer needed — thresholding it gives the converged topology
    dens = trilinear(vol, pts).reshape(res, res, res)
    binary = np.asarray(dens) > 1e-4
    frac = binary.mean()
    occs = jnp.asarray(binary, jnp.float32) * 0.5
    grid = occ.OccupancyGrid(occs=occs, binary=jnp.asarray(binary), aabb=state.grid.aabb)
    state = state._replace(grid=grid, vessel_grid=jax.tree.map(jnp.copy, grid))
    print(f"grid occupancy fraction: {frac:.4f}", file=sys.stderr)

    n = cfg.img_sample_size
    key = jax.random.PRNGKey(1)
    batch = sample_pixel_rays(key, ds.rays, n)
    _sync(batch)
    near, far = 1400.0, 1600.0
    k = cfg.compact_samples if cfg.compact_samples > 0 else None

    rows = {}

    # 1. full step (chunked scan of 50, per-step)
    chunk = make_train_chunk(model, cfg, near, far, 50)
    st2 = jax.tree.map(jnp.copy, state)
    def run_chunk():
        nonlocal st2
        st2, m, _, _ = chunk(st2, ds.rays)
        return m
    rows["full step (chunk/50, incl grid updates)"] = timeit(run_chunk, n=5, warmup=2) / 50

    # single jitted step, no scan
    step1 = make_train_step(model, cfg, near, far)
    st3 = jax.tree.map(jnp.copy, state)
    def run_step():
        nonlocal st3
        st3, m, _, _ = step1(st3, ds.rays)
        return m
    rows["full step (single dispatch)"] = timeit(run_step, n=20, warmup=3)

    # 2. sampling
    f_sample = jax.jit(lambda key: sample_pixel_rays(key, ds.rays, n))
    rows["sampling (gumbel top-k over dataset)"] = timeit(f_sample, key)

    # 3. march (incl. occupancy query + compaction)
    f_march = jax.jit(lambda o, d: occ.march_rays(
        grid, o, d, cfg.depth_samples_per_ray, near, far,
        compact_k=k, occ_stride=cfg.occ_stride))
    rows["march_rays (query+compact)"] = timeit(f_march, batch.origins, batch.directions)

    # 3b. occupancy query alone at the probe shape
    m = f_march(batch.origins, batch.directions)
    n_probe = cfg.depth_samples_per_ray // cfg.occ_stride
    probe_pos = jnp.broadcast_to(
        batch.origins[:, None, :], (n, n_probe, 3)
    ) + jnp.linspace(near, far, n_probe)[None, :, None] * batch.directions[:, None, :]
    f_query = jax.jit(lambda p: occ.query_occ(grid, p))
    rows[f"query_occ ({n}x{n_probe} probes)"] = timeit(f_query, probe_pos)

    # 4. MLP fwd at compacted shape
    P = m.positions.reshape(-1, 3)
    f_fwd = jax.jit(lambda p, x: model.apply(p, x))
    rows[f"MLP fwd ({P.shape[0]} pts)"] = timeit(f_fwd, state.params, P)

    # 5. MLP fwd+bwd (sum-of-output grad)
    def loss_mlp(p, x):
        return jnp.sum(jax.nn.sigmoid(model.apply(p, x)[..., -1]))
    f_fb = jax.jit(jax.grad(loss_mlp))
    rows[f"MLP fwd+bwd ({P.shape[0]} pts)"] = timeit(f_fb, state.params, P)

    # 6. render_rays full (march + MLP + composite) fwd only
    f_render = jax.jit(lambda p, o, d: render_rays(
        model, p, grid, o, d, cfg, near, far)[0])
    rows["render_rays fwd"] = timeit(f_render, state.params, batch.origins, batch.directions)

    # 7. render + loss grad (the differentiable core of the step)
    def loss_render(p, o, d, tgt):
        px, _, _ = render_rays(model, p, grid, o, d, cfg, near, far)
        return jnp.mean((px - tgt) ** 2)
    f_rg = jax.jit(jax.grad(loss_render))
    rows["render loss grad (march+mlp fwd+bwd+composite)"] = timeit(
        f_rg, state.params, batch.origins, batch.directions, batch.pixel_values)

    # 8. grid EMA update (dense cell eval), amortized /16
    sig = _sigma_fn(model, state.params, 0.0)
    f_upd = jax.jit(lambda g: occ.update_grid(g, sig, cfg.alpha_thre))
    t_upd = timeit(f_upd, grid, n=5)
    rows["grid EMA update (x2 grids, full)"] = 2 * t_upd
    rows["grid EMA update amortized/step"] = 2 * t_upd / cfg.grid_update_every

    # 9. adam update alone
    import optax
    from nerf_for_angiography_tpu.training.train import make_optimizer
    tx = make_optimizer(cfg)
    g0 = jax.tree.map(jnp.ones_like, state.params)
    f_adam = jax.jit(lambda g, o, p: tx.update(g, o, p))
    rows["adam update"] = timeit(f_adam, g0, state.opt_state, state.params)

    width = max(len(k) for k in rows)
    for name, ms in rows.items():
        print(f"{name:<{width}}  {ms:8.3f} ms")


if __name__ == "__main__":
    main()
