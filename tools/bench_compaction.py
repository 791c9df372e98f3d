"""Micro-bench the first-k-active compaction variants on the TPU.

Compares (flagship shape R=5625, w=160, k=80):
  * cumsum: broadcast compare+count (ops/occupancy.py::_first_k_active)
  * sort:   single int32 sort of index|index+w keys
  * topk:   top_k score + sort_key_val (round-2 implementation)
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


def cumsum_impl(mask, k):
    w = mask.shape[-1]
    rank = jnp.cumsum(mask, axis=-1)
    j = jnp.arange(k, dtype=rank.dtype)
    sel = jnp.sum((rank[..., :, None] <= j).astype(jnp.int32), axis=-2)
    mask_k = (j < rank[..., -1:]).astype(jnp.float32)
    return jnp.minimum(sel, w - 1), mask_k


def cumsum_bf16_impl(mask, k):
    # rank/j <= 320 are exactly representable in bf16 (8 mantissa bits
    # cover integers to 256; w=160 and k=88 stay below) — the (R, w, k)
    # compare runs at 2x VPU width
    w = mask.shape[-1]
    rank = jnp.cumsum(mask, axis=-1).astype(jnp.bfloat16)
    j = jnp.arange(k, dtype=jnp.bfloat16)
    sel = jnp.sum(
        (rank[..., :, None] <= j).astype(jnp.int32), axis=-2
    )
    mask_k = (j.astype(jnp.float32) < rank[..., -1:].astype(jnp.float32))
    return jnp.minimum(sel, w - 1), mask_k.astype(jnp.float32)


def cumsum_i16_impl(mask, k):
    # int16 compare keys: rank and j are both <= w (160-300 at the
    # flagship shapes), exactly representable — 2x VPU width on the
    # (R, w, k) compare with exact semantics.
    w = mask.shape[-1]
    rank = jnp.cumsum(mask, axis=-1).astype(jnp.int16)
    j = jnp.arange(k, dtype=jnp.int16)
    sel = jnp.sum((rank[..., :, None] <= j).astype(jnp.int32), axis=-2)
    mask_k = (j.astype(jnp.float32) < rank[..., -1:].astype(jnp.float32))
    return jnp.minimum(sel, w - 1), mask_k.astype(jnp.float32)


def sort_impl(mask, k):
    w = mask.shape[-1]
    order = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    keys = jnp.where(mask > 0.5, order, order + w)
    skeys = jax.lax.sort(keys, dimension=-1)[..., :k]
    return skeys % w, (skeys < w).astype(jnp.float32)


def sort16_impl(mask, k):
    # int16 keys (values < 2w = 320 fit): half the sort-network register
    # width
    w = mask.shape[-1]
    order = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    keys = jnp.where(mask > 0.5, order, order + w).astype(jnp.int16)
    skeys = jax.lax.sort(keys, dimension=-1)[..., :k].astype(jnp.int32)
    return skeys % w, (skeys < w).astype(jnp.float32)


def pallas_impl(mask, k):
    # VMEM-resident compare+count kernel (ops/pallas/first_k.py): rank in,
    # (sel, mask_k) out — no (R, w, k) HBM intermediate
    from nerf_for_angiography_tpu.ops.pallas.first_k import (
        first_k_active_pallas,
    )

    return first_k_active_pallas(mask, k)


def topk_impl(mask, k):
    w = mask.shape[-1]
    order = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    score = mask * (2 * w - order).astype(jnp.float32)
    vals, sel = jax.lax.top_k(score, k)
    sel, vals = jax.lax.sort_key_val(sel, vals, dimension=-1)
    return sel, (vals > 0.0).astype(jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=5625)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--k", type=int, default=80)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    mask = (
        jax.random.uniform(key, (args.rays, args.width)) < 0.45
    ).astype(jnp.float32)

    out = {}
    for name, fn in [
        ("cumsum", cumsum_impl), ("cumsum_bf16", cumsum_bf16_impl),
        ("cumsum_i16", cumsum_i16_impl),
        ("sort", sort_impl), ("sort16", sort16_impl), ("topk", topk_impl),
        ("pallas", pallas_impl),
    ]:
        t = timeit_on_device(
            lambda i, fn=fn: (
                lambda sm: sm[0].astype(jnp.float32).sum() + sm[1].sum()
            )(fn(jnp.roll(mask, i, axis=0), args.k))
        )
        out[name] = round(t * 1e3, 4)
        print(json.dumps({name + "_ms": out[name]}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
