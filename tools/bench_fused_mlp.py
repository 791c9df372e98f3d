"""Standalone TPU benchmark: fused Pallas MLP vs XLA flax CPPN.

Measures fwd and fwd+bwd wall time at the flagship hot-path shape
(compacted step: 5625 rays x 96 samples = 540k points, 4x128 relu CPPN).
Needs PALLAS_AXON_REMOTE_COMPILE=1 (set below) — all compiles go remote.
"""

import os

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()  # axon platform is off JAX's cache allowlist
import jax.numpy as jnp


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from nerf_for_angiography_tpu.models import CPPNConfig, init_cppn
    from nerf_for_angiography_tpu.ops.pallas.fused_mlp import (
        cppn_params_to_list, fused_mlp_raw,
    )

    P = 5625 * 96
    n_hidden = 4
    cfg = CPPNConfig(num_early_layers=n_hidden, num_filters=128, dtype=jnp.bfloat16)
    model, params = init_cppn(cfg, jax.random.PRNGKey(0))
    plist = cppn_params_to_list(params, n_hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (P, 3), jnp.float32)

    f_xla = jax.jit(lambda p, x: model.apply(p, x)[:, 0])
    f_pal = jax.jit(lambda p, x: fused_mlp_raw(p, x))

    a = f_xla(params, x)
    b = f_pal(plist, x)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"max fwd |diff| = {err:.4g}")

    t_xla = timeit(f_xla, params, x)
    t_pal = timeit(f_pal, plist, x)
    print(f"fwd   XLA {t_xla:7.3f} ms   pallas {t_pal:7.3f} ms   ({t_xla/t_pal:.2f}x)")

    def loss_xla(p, x):
        return jnp.mean(jax.nn.sigmoid(model.apply(p, x)[:, 0]) ** 2)

    def loss_pal(p, x):
        return jnp.mean(jax.nn.sigmoid(fused_mlp_raw(p, x)) ** 2)

    g_xla = jax.jit(jax.grad(loss_xla))
    g_pal = jax.jit(jax.grad(loss_pal))
    g_pal(plist, x)  # compile
    t_xla_b = timeit(g_xla, params, x, n=20)
    t_pal_b = timeit(g_pal, plist, x, n=20)
    print(f"f+bwd XLA {t_xla_b:7.3f} ms   pallas {t_pal_b:7.3f} ms   ({t_xla_b/t_pal_b:.2f}x)")

    # FLOP accounting: fwd = 2*P*(8*F + nh*F^2 + F); bwd ~ 3x (recompute + 2 matmul chains)
    F = 128
    flops_fwd = 2 * P * (8 * F + n_hidden * F * F + F)
    print(f"fwd  pallas {flops_fwd / (t_pal * 1e-3) / 1e12:.1f} TF/s "
          f"(XLA {flops_fwd / (t_xla * 1e-3) / 1e12:.1f})")


if __name__ == "__main__":
    main()
