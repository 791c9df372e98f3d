"""Sweep the fused-MLP kernel point-tile size on the real TPU.

Times fwd and fwd+bwd at the flagship point count (5,625 rays x k samples)
for each candidate TILE, plus the encoded (fourier/barf) kernel variants at
the default tile. Run in a fresh process (module global TILE is patched).

Usage: python tools/bench_mlp_tile.py [--points 450000] [--tiles 4096,5120,6144]
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


def timeit_on_device(body, n_inner=30, warmup=1, iters=4):
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
    ap.add_argument(
        "--points", default="450000",
        help="comma list of point counts (multi-count fits fixed-vs-marginal "
        "cost: fwd time at r4q2 was 1.21 ms @450k but 1.65 ms @900k — "
        "~0.76 ms/call does NOT scale with P)",
    )
    ap.add_argument(
        "--raw", action="store_true",
        help="also time _run_fwd on PRE-padded feature-major input (no "
        "_pad_points transpose, no _prep_params, no output slice) — "
        "isolates the kernel from its layout wrapper",
    )
    ap.add_argument("--tiles", default="4096,5120,6144", help="FWD tile sweep")
    ap.add_argument("--chains", default="1,2", help="FWD chains sweep")
    ap.add_argument("--heads", default="reduce", help="e.g. reduce,dot")
    ap.add_argument(
        "--epilogues", default="f32",
        help="inter-layer epilogue sweep, e.g. f32,bf16 (fused_mlp.EPILOGUE)",
    )
    ap.add_argument("--bwd_tile", type=int, default=6144)
    ap.add_argument("--bwd_chains", type=int, default=2)
    ap.add_argument("--enc", action="store_true", help="also bench enc kernels")
    args = ap.parse_args()

    from nerf_for_angiography_tpu.models import (
        CPPNConfig, barf_k_values, barf_weights, init_cppn,
    )
    from nerf_for_angiography_tpu.ops.pallas import fused_mlp as fm

    cfg = CPPNConfig(num_early_layers=4, num_filters=128)
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    plist = fm.cppn_params_to_list(params, 4)
    macs = 3 * 128 + 4 * 128 * 128 + 128
    out = {}

    import itertools

    point_counts = [int(p) for p in str(args.points).split(",")]
    fm.BWD_TILE = args.bwd_tile
    fm.BWD_CHAINS = args.bwd_chains
    for n_pts, tile, ch, head, epi in itertools.product(
        point_counts,
        [int(t) for t in args.tiles.split(",")],
        [int(c) for c in args.chains.split(",")],
        args.heads.split(","),
        args.epilogues.split(","),
    ):
        if tile % (128 * ch):
            continue
        fm.FWD_TILE = tile
        fm.FWD_CHAINS = ch
        fm.HEAD = head
        fm.EPILOGUE = epi
        x = jax.random.uniform(
            jax.random.PRNGKey(1), (n_pts, 3), minval=-100.0, maxval=100.0
        )
        flop_fwd = n_pts * macs * 2
        key = f"tile{tile}c{ch}{head}" + ("" if epi == "f32" else f"-{epi}")
        if len(point_counts) > 1:
            key = f"p{n_pts}-{key}"
        try:
            t_f = timeit_on_device(
                lambda i: jnp.sum(fm.fused_mlp_raw(plist, x + i * 1e-6))
            )
            t_fb = timeit_on_device(
                lambda i: jax.tree.reduce(
                    lambda a, v: a + jnp.sum(v),
                    jax.grad(lambda p: jnp.sum(fm.fused_mlp_raw(p, x + i * 1e-6)))(
                        plist
                    ),
                    jnp.float32(0.0),
                )
            )
            out[key] = {
                "fwd_ms": round(t_f * 1e3, 4),
                "fwdbwd_ms": round(t_fb * 1e3, 4),
                "fwd_tfs": round(flop_fwd / t_f / 1e12, 1),
                "fwdbwd_tfs": round(3 * flop_fwd / t_fb / 1e12, 1),
            }
            if args.raw:
                # kernel-only: pre-padded (8, P_pad) feature-major input,
                # pre-transposed params; per-iter work = one lane-friendly
                # elementwise add + the pallas_call + the (1, P_pad) sum
                flat, n_hidden, f = fm._prep_params(plist)
                x_pad, _ = fm._pad_points(x, tile)
                t_r = timeit_on_device(
                    lambda i: jnp.sum(
                        fm._run_fwd(flat, n_hidden, f, x_pad + i * 1e-6, False)
                    )
                )
                out[key]["raw_fwd_ms"] = round(t_r * 1e3, 4)
                out[key]["raw_fwd_tfs"] = round(flop_fwd / t_r / 1e12, 1)
        except Exception as e:  # noqa: BLE001 — report failed tiles
            out[key] = {"error": str(e)[:200]}
        print(json.dumps({key: out[key]}), file=sys.stderr)

    if args.enc:
        fm.FWD_TILE = fm.BWD_TILE = 4096
        x = jax.random.uniform(
            jax.random.PRNGKey(1), (point_counts[0], 3), minval=-100.0,
            maxval=100.0,
        )
        L = 5
        ecfg = CPPNConfig(
            num_early_layers=4, num_filters=128, pos_enc="fourier",
            pos_enc_basis=L,
        )
        emodel, eparams = init_cppn(ecfg, jax.random.PRNGKey(2))
        eplist = fm.cppn_params_to_list(eparams, 4)
        enc_f = {"coeff": eparams["params"]["fourier_coefficients_pts"]}
        enc_b = {"w": barf_weights(2.7, barf_k_values(L, 3))}
        for kind, enc in (("fourier", enc_f), ("barf", enc_b)):
            t_fb = timeit_on_device(
                lambda i: jax.tree.reduce(
                    lambda a, v: a + jnp.sum(v),
                    jax.grad(
                        lambda p: jnp.sum(
                            fm.fused_mlp_enc_raw((kind, L), p, enc, x + i * 1e-6)
                        )
                    )(eplist),
                    jnp.float32(0.0),
                )
            )
            # XLA fallback comparison
            t_xla = timeit_on_device(
                lambda i: jax.tree.reduce(
                    lambda a, v: a + jnp.sum(v),
                    jax.grad(
                        lambda p: jnp.sum(
                            emodel.apply(p, x + i * 1e-6, barf_alpha=2.7)[:, 0]
                        )
                    )(eparams),
                    jnp.float32(0.0),
                )
            )
            out[kind] = {
                "fwdbwd_ms": round(t_fb * 1e3, 4),
                "fwdbwd_xla_ms": round(t_xla * 1e3, 4),
            }
            print(json.dumps({kind: out[kind]}), file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
