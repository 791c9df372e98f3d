"""Isolate the per-pallas_call fixed cost the r4q3 sweep exposed.

The fused-MLP forward times fit t(P) = 0.7-0.8 ms + P/135TFs on the v5e
(tools/bench_mlp_tile.py --raw, 4 point counts, two tile sizes — the
intercept is independent of BOTH), i.e. every pallas_call pays ~0.75 ms
somewhere before marginal compute. This tool separates the hypotheses:

  * trivial   — a do-nothing Pallas copy kernel at the same block shapes:
                intercept here = pure per-invocation overhead (axon
                custom-call dispatch?), independent of our kernel.
  * xla       — the same-shape pure-XLA elementwise chain: intercept
                control for the fori_loop timing harness itself.
  * xla_mlp   — the flax XLA MLP forward at the same point counts: does
                the non-Pallas path carry a fixed cost too?
  * inner     — the real fused forward at n_inner 15/30/60: a per-outer-
                dispatch artifact would shrink with n_inner; a true
                per-call cost is n_inner-invariant.

Usage: python tools/bench_overhead.py
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()  # axon platform is off JAX's cache allowlist
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

POINTS = [225_280, 450_560, 901_120, 1_802_240]
TILE = 6144


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


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def trivial_pallas(x_pad):
    n_tiles = x_pad.shape[1] // TILE
    return pl.pallas_call(
        _copy_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda m: (0, m), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((8, TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x_pad.shape, jnp.float32),
    )(x_pad)


def main():
    out = {}
    from nerf_for_angiography_tpu.models import CPPNConfig, init_cppn
    from nerf_for_angiography_tpu.ops.pallas import fused_mlp as fm

    cfg = CPPNConfig(num_early_layers=4, num_filters=128)
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    plist = fm.cppn_params_to_list(params, 4)
    flat, n_hidden, f = fm._prep_params(plist)

    for p in POINTS:
        x_pad = jnp.zeros((8, p), jnp.float32) + 0.1
        key = f"p{p}"
        out[key] = {}

        t = timeit_on_device(lambda i: jnp.sum(trivial_pallas(x_pad + i * 1e-6)))
        out[key]["trivial_pallas_ms"] = round(t * 1e3, 4)

        t = timeit_on_device(
            lambda i: jnp.sum(jnp.tanh(x_pad + i * 1e-6) * 1.5 + 0.25)
        )
        out[key]["xla_elementwise_ms"] = round(t * 1e3, 4)

        xpm = jnp.zeros((p, 3), jnp.float32) + 0.1
        t = timeit_on_device(
            lambda i: jnp.sum(model.apply(params, xpm + i * 1e-6)[:, 0]),
            n_inner=15,
        )
        out[key]["xla_mlp_fwd_ms"] = round(t * 1e3, 4)
        print(json.dumps({key: out[key]}), file=sys.stderr)

    # n_inner sensitivity of the real forward at one size
    x_pad = jnp.zeros((8, 450_560), jnp.float32) + 0.1
    body = lambda i: jnp.sum(fm._run_fwd(flat, n_hidden, f, x_pad + i * 1e-6, False))
    for n in (15, 30, 60):
        t = timeit_on_device(body, n_inner=n)
        out[f"fused_fwd_inner{n}_ms"] = round(t * 1e3, 4)
        print(
            json.dumps({f"fused_fwd_inner{n}_ms": out[f"fused_fwd_inner{n}_ms"]}),
            file=sys.stderr,
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
