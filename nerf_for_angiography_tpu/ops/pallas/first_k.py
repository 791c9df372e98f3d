"""First-k-active compaction as a Pallas kernel.

The compacted march (ops/occupancy.py::march_rays ``compact_k``,
nerfacc's skip-empty-space — nerf_helpers_acc.py:27-29 semantics) needs,
per ray, the indices of the first k active samples of a (R, w) 0/1 mask.
The XLA formulation (ops/occupancy.py::_first_k_active) is ONE broadcast
compare + count:

    rank = cumsum(mask, -1); sel[r, j] = sum_s (rank[r, s] <= j)

but profiles at 0.56 ms on v5e for the flagship (5625, 160, k=88) shape
(tools/bench_compaction.py) — XLA materializes/re-streams the (R, w, k)
intermediate instead of accumulating in registers.

Kernel design (layout matters more than the math):

  * RAYS IN LANES, SAMPLES IN SUBLANES: the kernel takes rank TRANSPOSED
    as (w, R) tiles. The inner loop broadcasts one sample row rank[s, :]
    across the k accumulator sublanes — a native sublane broadcast. The
    first attempt used (R, w) row-major tiles, where the same broadcast
    is a cross-lane shuffle of column s: it measured 0.73 ms, SLOWER
    than XLA (kept honest in benchmarks/MFU.md).
  * f32 COMPARES: rank and j are small integers, exactly representable
    in bf16 too — but v5e Mosaic rejects bf16 vector compares ("Target
    does not support this comparison"), so the 2x-VPU-width variant is
    unavailable and the kernel stays f32.
  * the only HBM traffic is rank in and (sel, mask_k) out; the O(R*w)
    cumsum and the two (w, R) transposes stay in XLA (a few MB, ~us).

Semantics match _first_k_active exactly (same clip-to-w-1 padding rule);
parity is pinned in tests/test_pallas_first_k.py and the backend toggle
is the ``fka`` argument of the march family.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rays (lanes) per kernel tile: (w<=256 sublanes, 512 lanes) bf16 in plus
# two (k, 512) outs stay well under VMEM; wide tiles amortize Mosaic's
# fixed per-tile cost across more lanes.
TILE_C = 512


def _fka_kernel_t(w: int, k: int, rank_ref, sel_ref, maskk_ref):
    # f32 compares: v5e Mosaic rejects bf16 vector cmpf ("Target does not
    # support this comparison"), so the 2x-width variant is unavailable
    rank = rank_ref[:]  # (w, TILE_C) f32 inclusive cumsum of the 0/1 mask
    # Mosaic's tpu.iota is integer-only; cast for the f32 compare
    j = jax.lax.broadcasted_iota(jnp.int32, (k, rank.shape[1]), 0).astype(
        jnp.float32
    )
    acc = jnp.zeros((k, rank.shape[1]), jnp.float32)
    # sel[j, r] = sum_s (rank[s, r] <= j): each iteration is one sublane
    # broadcast of sample row s + a (k, TILE_C) compare+add
    for s in range(w):
        row = jnp.broadcast_to(rank[s : s + 1, :], (k, rank.shape[1]))
        acc = acc + (row <= j).astype(jnp.float32)
    sel_ref[:] = jnp.minimum(acc, float(w - 1)).astype(jnp.int32)
    maskk_ref[:] = (
        j < jnp.broadcast_to(rank[w - 1 : w, :], (k, rank.shape[1]))
    ).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def first_k_active_pallas(
    mask: jnp.ndarray, k: int, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sel, mask_k) of the first k active samples per row.

    mask: (..., w) 0/1 float; returns sel (..., k) int32 clipped to w-1
    and mask_k (..., k) f32 — identical semantics to
    ops/occupancy.py::_first_k_active.
    """
    # the march is off the differentiation path (mask comes from the
    # non-differentiable occupancy query); make that explicit so AD never
    # tries to transpose the pallas_call
    mask = jax.lax.stop_gradient(mask)
    batch = mask.shape[:-1]
    w = mask.shape[-1]
    rank = jnp.cumsum(mask.reshape(-1, w).astype(jnp.float32), axis=-1)
    r = rank.shape[0]
    r_pad = ((r + TILE_C - 1) // TILE_C) * TILE_C
    # rays in lanes: transpose to (w, R)
    rank_t = jnp.pad(rank, ((0, r_pad - r), (0, 0))).T
    n_tiles = r_pad // TILE_C
    sel_t, mask_k_t = pl.pallas_call(
        functools.partial(_fka_kernel_t, w, k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((w, TILE_C), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((k, TILE_C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE_C), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, r_pad), jnp.int32),
            jax.ShapeDtypeStruct((k, r_pad), jnp.float32),
        ],
        interpret=interpret,
    )(rank_t)
    return (
        sel_t.T[:r].reshape(*batch, k),
        mask_k_t.T[:r].reshape(*batch, k),
    )
