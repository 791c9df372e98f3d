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
# persistent XLA executable cache: identical programs (re-runs, seed
# grids, the bench) skip the 4-12 s remote compiles entirely
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()  # axon platform is off JAX's cache allowlist
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


def timeit_on_device(body, n_inner=50, warmup=1, iters=8):
    """Time ``body(i) -> scalar`` by scanning n_inner iterations inside ONE
    jitted dispatch — per-call tunnel latency would otherwise swamp any
    stage under ~10ms. ``body`` must consume ``i`` (e.g. perturb an input)
    so XLA cannot hoist it out of the loop.

    The outer iters are PIPELINED (all dispatched async, one sync at the
    end): blocking per run pays a full tunnel round-trip (~20-25 ms)
    per dispatch, which at iters=4 x n_inner=30 silently added ~0.8 ms
    to every per-call figure — the r4 "per-pallas_call fixed cost" was
    exactly this artifact (benchmarks/MFU.md r4q5 overhead verdict)."""
    run = jax.jit(
        lambda: jax.lax.fori_loop(
            0, n_inner, lambda i, acc: acc + body(i), jnp.float32(0.0)
        )
    )
    for _ in range(warmup):
        run().block_until_ready()
    t0 = time.perf_counter()
    outs = [run() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (iters * n_inner)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="lattice")
    ap.add_argument("--k", type=int, default=96)
    # two-bucket (hybrid2k) knobs; defaults = the r4q2 bench run's steady
    # tuning (retune log: k=96, w_cap=176, w_lo=112, k_lo=80 after the
    # grid prunes)
    ap.add_argument("--k_lo", type=int, default=80)
    ap.add_argument("--w_lo", type=int, default=112)
    ap.add_argument("--w_cap", type=int, default=176)
    ap.add_argument("--split", type=float, default=0.75)
    ap.add_argument("--rays", type=int, default=5625)
    ap.add_argument("--train_iters", type=int, default=3000)
    ap.add_argument(
        "--feature_major", action="store_true",
        help="A/B: feed the MLP feature-major positions (cfg.feature_major_mlp)",
    )
    ap.add_argument(
        "--glue", action="store_true",
        help="decompose the composite+glue residual (march-with-positions, "
        "forward render, no-early-stop loss grad, composite-only grad)",
    )
    ap.add_argument(
        "--fused_step", action="store_true",
        help="A/B: whole-train-step fused kernel (cfg.fused_train_step="
        "'auto'; ops/pallas/fused_step.py) — adds a fused_grads stage "
        "(march+fwd+composite+bwd in one pallas_call) and runs full_step "
        "through it",
    )
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

    # 'hybrid2k' is spelled march_mode='hybrid' + hybrid_k_lo>0 in the
    # loop's stepper cfg (training/loop.py::_compact_entry)
    cfg = TrainConfig(
        march_mode="hybrid" if args.mode == "hybrid2k" else args.mode,
        compact_samples=args.k,
        **(
            {
                "hybrid_w_cap": args.w_cap,
                "hybrid_w_lo": args.w_lo,
                "hybrid_k_lo": args.k_lo,
                "hybrid_split": args.split,
            }
            if args.mode == "hybrid2k"
            else {}
        ),
        feature_major_mlp=args.feature_major,
        fused_train_step="auto" if args.fused_step else "off",
    )
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
    stride = safe_occ_stride(
        cfg.occ_stride, n, near, far, 2 * cfg.outside, cfg.grid_resolution
    )
    if args.mode == "window":
        march = lambda g, oo: march_rays_window(
            g, oo, d, n, near, far, k=args.k, aabb_extent=2 * cfg.outside)
    elif args.mode == "hybrid":
        from nerf_for_angiography_tpu.ops.occupancy import march_rays_hybrid

        march = lambda g, oo: march_rays_hybrid(
            g, oo, d, n, near, far, k=args.k, occ_stride=stride,
            aabb_extent=2 * cfg.outside)
    elif args.mode == "hybrid2k":
        from nerf_for_angiography_tpu.ops.occupancy import march_rays_hybrid2k

        march = lambda g, oo: march_rays_hybrid2k(
            g, oo, d, n, near, far, k=args.k, k_lo=args.k_lo,
            w_lo=args.w_lo, w_cap=args.w_cap, split=args.split,
            occ_stride=stride, aabb_extent=2 * cfg.outside)
    else:
        march = lambda g, oo: march_rays(
            g, oo, d, n, near, far,
            compact_k=args.k if args.mode == "lattice" else None,
            occ_stride=stride)
    print("stage: march", file=sys.stderr)
    grid = state.grid
    if args.mode == "hybrid2k":
        march_i = lambda i: (
            lambda m: jnp.sum(m.lo.mask) + jnp.sum(m.hi.mask)
        )(march(grid, o + i * 1e-6))
    else:
        march_i = lambda i: jnp.sum(march(grid, o + i * 1e-6).mask)
    results["march_ms"] = timeit_on_device(march_i) * 1e3
    from nerf_for_angiography_tpu.training.train import (
        _flat_positions, _flat_positions_fm, density_raw_fm,
    )

    m = jax.jit(march)(state.grid, o)
    pts = _flat_positions(m)
    if args.feature_major:
        pts_fm = jax.jit(
            lambda mm: _flat_positions_fm(mm, o, d)
        )(m)
        results["mlp_fwd_fm_ms"] = timeit_on_device(
            lambda i: jnp.sum(density_raw_fm(model, state.params,
                                             pts_fm + i * 1e-6, 0.0,
                                             cfg.mlp_backend)),
            n_inner=30) * 1e3

    # --- MLP on the compacted points ---
    fwd = jax.jit(lambda p, x: density_raw(model, p, x, 0.0, cfg.mlp_backend))
    print("stage: mlp_fwd", file=sys.stderr)
    params = state.params
    results["mlp_fwd_ms"] = timeit_on_device(
        lambda i: jnp.sum(density_raw(model, params, pts + i * 1e-6, 0.0,
                                      cfg.mlp_backend)), n_inner=30) * 1e3

    def loss(p, x):
        return jnp.sum(density_raw(model, p, x, 0.0, cfg.mlp_backend))

    g = jax.jit(jax.grad(loss))
    print("stage: mlp_fwdbwd", file=sys.stderr)
    grad_sum = lambda be: lambda i: jax.tree.reduce(
        lambda a, x: a + jnp.sum(x),
        jax.grad(lambda p: jnp.sum(density_raw(model, p, pts + i * 1e-6,
                                               0.0, be)))(params),
        jnp.float32(0.0))
    results["mlp_fwdbwd_ms"] = timeit_on_device(grad_sum(cfg.mlp_backend), n_inner=30) * 1e3

    fwd_x = jax.jit(lambda p, x: density_raw(model, p, x, 0.0, "xla"))
    print("stage: mlp_fwd_xla", file=sys.stderr)
    results["mlp_fwd_xla_ms"] = timeit_on_device(
        lambda i: jnp.sum(density_raw(model, params, pts + i * 1e-6, 0.0,
                                      "xla")), n_inner=30) * 1e3
    gx = jax.jit(jax.grad(lambda p, x: jnp.sum(density_raw(model, p, x, 0.0, "xla"))))
    print("stage: mlp_fwdbwd_xla", file=sys.stderr)
    results["mlp_fwdbwd_xla_ms"] = timeit_on_device(grad_sum("xla"), n_inner=30) * 1e3

    if args.fused_step:
        # march + MLP fwd + composite + loss grad + MLP bwd, one call —
        # the section the split path spells march_ms + mlp_fwdbwd_ms +
        # XLA composite glue
        from nerf_for_angiography_tpu.training.train import (
            _fused_loss_and_grads,
        )

        tgt = ds.rays.pixel_values[: args.rays]
        print("stage: fused_grads", file=sys.stderr)

        def fused_i(i):
            loss, px, _, grads = _fused_loss_and_grads(
                model, params, grid, o + i * 1e-6, d, tgt, cfg, near, far
            )
            return loss + jax.tree.reduce(
                lambda a, x: a + jnp.sum(x), grads, jnp.float32(0.0)
            )

        results["fused_grads_ms"] = timeit_on_device(fused_i, n_inner=30) * 1e3

    # --- the non-kernel remainder (the ~3 ms target: MFU.md r4q5) ---
    use_cfg = cfg if args.mode != "dense" else dense_cfg
    import optax

    from nerf_for_angiography_tpu.ops.occupancy import every_n_step_pair
    from nerf_for_angiography_tpu.ops.sampling import sample_pixel_rays
    from nerf_for_angiography_tpu.training.train import (
        _sigma_fn, make_optimizer, render_rays,
    )

    tgt = ds.rays.pixel_values[: args.rays]
    rays_all = ds.rays
    key0 = jax.random.PRNGKey(1)

    print("stage: sampling", file=sys.stderr)
    samp_i = lambda i: jnp.sum(
        sample_pixel_rays(
            jax.random.fold_in(key0, i), rays_all, cfg.img_sample_size,
            weighted=cfg.sampling_strategy != "random", impl=cfg.sampling_impl,
        ).origins
    )
    results["sampling_ms"] = timeit_on_device(samp_i, n_inner=30) * 1e3

    # march + MLP fwd + composite + MSE + backward, exactly the step's
    # value_and_grad section (train.py loss_fn) — minus sampling/grid/Adam
    print("stage: loss_grad", file=sys.stderr)

    def loss_grad_i(i):
        def loss_fn(p):
            out = render_rays(
                model, p, grid, o + i * 1e-6, d, use_cfg, near, far, 0.0,
                return_march=True,
            )
            return jnp.mean((out[0] - tgt) ** 2)

        l, gr = jax.value_and_grad(loss_fn)(params)
        return l + jax.tree.reduce(
            lambda a, x: a + jnp.sum(x), gr, jnp.float32(0.0)
        )

    results["loss_grad_ms"] = timeit_on_device(loss_grad_i, n_inner=30) * 1e3

    if args.glue:
        # Decompose the loss_grad residual ("composite + glue") further:
        # where do the ~0.8 ms between loss_grad and march+mlp_fwdbwd go?
        from nerf_for_angiography_tpu.training.train import (
            BucketedRays, _bucket_sigmas, _flat_positions, _keep_mask,
        )

        # (a) march with its POSITIONS consumed — march_ms sums only the
        # mask, letting XLA dead-code-eliminate the (R,k,3) positions
        # materialization the real step needs (unless feature_major
        # recomputes them from t). The delta re-attributes glue to march.
        if args.mode == "hybrid2k":
            pos_i = lambda i: jnp.sum(_flat_positions(march(grid, o + i * 1e-6)))
        else:
            pos_i = lambda i: jnp.sum(march(grid, o + i * 1e-6).positions)
        results["march_pos_ms"] = timeit_on_device(pos_i) * 1e3

        # (b) forward-only render: march + MLP fwd + composite fwd
        def render_fwd_i(i):
            out = render_rays(
                model, params, grid, o + i * 1e-6, d, use_cfg, near, far, 0.0
            )
            return jnp.sum(out[0])

        results["render_fwd_ms"] = timeit_on_device(render_fwd_i, n_inner=30) * 1e3

        # (c) loss_grad with early_stop_eps=0 (drops prune_mask's cumsum
        # + transmittance chain; keep == march mask)
        noes_cfg = dataclasses.replace(use_cfg, early_stop_eps=0.0)

        def loss_grad_noes_i(i):
            def loss_fn(p):
                out = render_rays(
                    model, p, grid, o + i * 1e-6, d, noes_cfg, near, far, 0.0
                )
                return jnp.mean((out[0] - tgt) ** 2)

            l, gr = jax.value_and_grad(loss_fn)(params)
            return l + jax.tree.reduce(
                lambda a, x: a + jnp.sum(x), gr, jnp.float32(0.0)
            )

        results["loss_grad_noes_ms"] = timeit_on_device(
            loss_grad_noes_i, n_inner=30
        ) * 1e3

        # (d) composite chain alone, fwd+bwd wrt the raw MLP output:
        # sigmoid + keep + Beer-Lambert + MSE + unpermute (the exact
        # post-MLP section of render_rays, with the march/MLP constant)
        m0 = jax.jit(march)(grid, o)
        raw0 = jnp.zeros((_flat_positions(m0).shape[0],), jnp.float32)

        def comp_loss(raw, i):
            mm = m0
            parts = []
            for mb, sb in _bucket_sigmas(mm, raw + i * 1e-9):
                dists, keep = _keep_mask(mb, sb, use_cfg)
                parts.append(jnp.exp(-jnp.sum(sb * keep * dists, axis=-1)))
            px = jnp.concatenate(parts)
            if isinstance(mm, BucketedRays):
                px = jnp.take(px, mm.inv, axis=0)
            return jnp.mean((px - tgt) ** 2)

        comp_i = lambda i: jnp.sum(jax.grad(comp_loss)(raw0, i))
        results["composite_grad_ms"] = timeit_on_device(comp_i, n_inner=30) * 1e3

    print("stage: adam", file=sys.stderr)
    tx = make_optimizer(use_cfg)
    opt_state0 = jax.jit(tx.init)(params)
    grads0 = jax.tree.map(lambda x: x * 1e-3, params)

    def adam_i(i):
        gr = jax.tree.map(lambda x: x * (1.0 + i * 1e-6), grads0)
        upd, _ = tx.update(gr, opt_state0, params)
        p2 = optax.apply_updates(params, upd)
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(x), p2, jnp.float32(0.0)
        )

    results["adam_ms"] = timeit_on_device(adam_i, n_inner=30) * 1e3

    # occupancy-pair EMA update, forced to FIRE every iteration (the real
    # step gates it on step % grid_update_every via lax.cond — divide by
    # grid_update_every for the amortized per-step cost)
    print("stage: grid_update", file=sys.stderr)
    sig0 = _sigma_fn(model, params, 0.0, cfg.mlp_backend)
    n_upd = use_cfg.grid_update_every
    step_fire = jnp.int32(((512 // n_upd) + 1) * n_upd)  # past warmup, fires

    def grid_i(i):
        sfn = lambda x: sig0(x + i * 1e-9)
        g2, v2 = every_n_step_pair(
            grid, state.vessel_grid, step_fire, sfn, use_cfg.alpha_thre,
            use_cfg.vessel_alpha_thre, n_upd, use_cfg.grid_ema_decay,
            key=None, slabs=use_cfg.grid_update_slabs,
        )
        return jnp.sum(g2.occs) + jnp.sum(v2.occs)

    results["grid_update_ms"] = timeit_on_device(grid_i, n_inner=10) * 1e3
    results["grid_update_amortized_ms"] = results["grid_update_ms"] / n_upd

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}), file=sys.stderr)

    # --- full step ---
    step = make_train_step(model, use_cfg, near, far)
    print("stage: full_step", file=sys.stderr)
    # the jitted step donates its state — thread it instead of reusing
    st = state
    for _ in range(3):  # compile + warm
        st, *_ = step(st, ds.rays)
    jax.block_until_ready(st.params)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        st, *_ = step(st, ds.rays)
    jax.block_until_ready(st.params)
    results["full_step_ms"] = (time.perf_counter() - t0) / iters * 1e3
    results["rays_per_sec"] = cfg.img_sample_size / (results["full_step_ms"] / 1e3)

    # --- the loop's real regime: lax.scan of 50 steps per dispatch ---
    # (training/loop.py uses make_train_chunk; per-step dispatch overhead
    # and host glue amortize across the chunk — this is the number the
    # quality runs' steady_rays_per_sec reflects)
    print("stage: chunk50", file=sys.stderr)
    chunk_c = make_train_chunk(model, use_cfg, near, far, 50)
    st, *_ = chunk_c(st, ds.rays)  # compile + warm (donates st)
    jax.block_until_ready(st.params)
    nrep = 4
    t0 = time.perf_counter()
    for _ in range(nrep):
        st, *_ = chunk_c(st, ds.rays)
    jax.block_until_ready(st.params)
    results["chunk_step_ms"] = (time.perf_counter() - t0) / (nrep * 50) * 1e3
    results["chunk_rays_per_sec"] = cfg.img_sample_size / (
        results["chunk_step_ms"] / 1e3
    )

    # --- the loop's ACTUAL per-chunk pattern: one blocking stacked-max
    # fetch (tuner.observe) + block_until_ready per chunk
    # (training/loop.py:373-405) — the delta vs chunk_step_ms is the
    # per-chunk host-sync tax the loop pays through the tunnel
    print("stage: chunk50_sync", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(nrep):
        st, mstack, pred_pix, _tgt = chunk_c(st, ds.rays)
        if "march/over_k" in mstack:
            _ = [
                int(v) for v in np.asarray(jnp.stack([
                    jnp.max(mstack["march/over_k"]),
                    jnp.max(mstack["march/over_k_lo"]),
                    jnp.max(mstack["march/edge_rays"]),
                    jnp.max(mstack.get("march/ac", jnp.zeros(1, jnp.int32))),
                    jnp.max(mstack.get("march/ac_lo", jnp.zeros(1, jnp.int32))),
                ]))
            ]
        jax.block_until_ready(pred_pix)
    results["chunk_step_sync_ms"] = (time.perf_counter() - t0) / (nrep * 50) * 1e3

    # --- MFU accounting ---
    f = cfg.num_hidden_units
    n_hidden = cfg.num_layers
    macs_pt = 3 * f + n_hidden * f * f + f
    eff_k = (
        args.split * args.k_lo + (1 - args.split) * args.k
        if args.mode == "hybrid2k"
        else args.k
    )
    flop_step = cfg.img_sample_size * eff_k * macs_pt * 2 * 3  # fwd+bwd~3x
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
