"""Fused CPPN-MLP Pallas kernel (the framework's hot op).

The training hot path evaluates a small MLP (3 -> F -> ... -> F -> 1) at
~0.5-1.7M ray-sample points per iteration (SURVEY.md §3.1:
run_nerf_acc.py:294 via nerf_helpers.py:31-45 + CPPN.forward). As plain
XLA, every layer's (P, F) activation tensor round-trips HBM in forward AND
backward — ~1-4 GB/step of pure bandwidth at the reference workload, which
makes the step bandwidth-bound (measured arithmetic intensity ~43 FLOP/B vs
the v5e ridge at ~480). This kernel keeps all activations in VMEM.

Layout is FEATURE-MAJOR — the TPU-native choice for a small MLP over many
points: activations are (features, points) so the huge axis (points) rides
the 128-wide lanes and every matmul is (F, F) @ (F, TILE):

  * forward: one grid pass over point tiles; per tile all layers run
    back-to-back on the MXU (bf16 inputs, f32 accumulation); only the final
    1-channel raw density row is written to HBM.
  * backward (custom VJP): recomputes the tile's activations in VMEM
    (rematerialization — FLOPs are cheap, HBM is not), then runs the
    backward matmuls (dW contractions have K = TILE, ideal MXU shapes) and
    accumulates dW/db across sequential grid steps in revisited output
    blocks.

The round-1 version of this kernel was POINT-major ((TILE, 3) inputs,
(TILE, 1) outputs) and lost to XLA: 3-of-128 / 1-of-128 lane occupancy on
input DMA, first matmul, and output writes. Feature-major fixes all three.

Supports the CPPN shapes with pos_enc='none', relu activations, arbitrary
static depth/width (width a multiple of 8 recommended; flagship 4x128 and
the 2x128 / 4x64 reference variants all qualify). Other configs fall back
to the XLA path (models/cppn.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per kernel tile (the lane axis); activations per layer are
# (F, TILE) bf16 in VMEM: 1 MB at F=128 — backward keeps n_layers+1 of them.
TILE = 4096
_IN_PAD = 8  # input features (3 coords) padded to one f32 sublane tile


def _pad_points(x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """(P, 3) f32 -> (8, P_pad) f32 feature-major, P_pad multiple of TILE."""
    p = x.shape[0]
    p_pad = ((p + TILE - 1) // TILE) * TILE
    out = jnp.zeros((_IN_PAD, p_pad), jnp.float32)
    return out.at[:3, :p].set(x.T.astype(jnp.float32)), p


def _prep_params(params: Sequence[tuple[jnp.ndarray, jnp.ndarray]]):
    """[(W_in, b_in), hidden..., (w_out, b_out)] -> feature-major arrays.

    Flax Dense computes y = x @ W + b with W (in, out); feature-major
    computes y^T = W^T @ x^T, so weights are passed TRANSPOSED:
    W_in (3,F) -> (F,8) bf16; W (F,F) -> W^T bf16; biases (F,1) f32;
    w_out (F,1) f32 column (VPU reduce, never a matmul); b_out (1,1) f32.
    """
    (w_in, b_in), *hidden, (w_out, b_out) = params
    f = w_in.shape[1]
    w_in_t = jnp.zeros((f, _IN_PAD), jnp.float32).at[:, :3].set(w_in.T)
    flat = [w_in_t.astype(jnp.bfloat16), b_in.reshape(f, 1).astype(jnp.float32)]
    for w, b in hidden:
        flat += [w.T.astype(jnp.bfloat16), b.reshape(f, 1).astype(jnp.float32)]
    flat += [
        w_out.reshape(f, 1).astype(jnp.float32),
        b_out.reshape(1, 1).astype(jnp.float32),
    ]
    return flat, len(hidden), f


def _fwd_kernel(n_hidden, x_ref, *refs):
    out_ref = refs[-1]
    w_in, b_in = refs[0], refs[1]
    x_bf = x_ref[:].astype(jnp.bfloat16)  # (8, TILE)
    h = jnp.dot(w_in[:], x_bf, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b_in[:], 0.0).astype(jnp.bfloat16)  # (F, TILE)
    for li in range(n_hidden):
        w, b = refs[2 + 2 * li], refs[3 + 2 * li]
        h = jnp.dot(w[:], h, preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b[:], 0.0).astype(jnp.bfloat16)
    w_out, b_out = refs[2 + 2 * n_hidden], refs[3 + 2 * n_hidden]
    # output head as a sublane reduce: (F, TILE) * (F, 1) summed over F
    raw = jnp.sum(h.astype(jnp.float32) * w_out[:], axis=0, keepdims=True)
    out_ref[:] = raw + b_out[0, 0]


def _bwd_kernel(n_hidden, x_ref, g_ref, *refs):
    """Recompute activations, backprop, accumulate dW/db across grid steps.

    All gradients are produced in the TRANSPOSED (feature-major) orientation
    and un-transposed once at repack time (cheap F x F XLA transposes).
    """
    n_params = 2 * (n_hidden + 2)
    param_refs = refs[:n_params]
    grad_refs = refs[n_params:]
    w_in, b_in = param_refs[0], param_refs[1]
    w_out = param_refs[2 + 2 * n_hidden]

    # --- recompute forward, activations held as (F, TILE) bf16 in VMEM ---
    x_bf = x_ref[:].astype(jnp.bfloat16)
    acts = []
    h = jnp.dot(w_in[:], x_bf, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b_in[:], 0.0).astype(jnp.bfloat16)
    acts.append(h)
    for li in range(n_hidden):
        w, b = param_refs[2 + 2 * li], param_refs[3 + 2 * li]
        h = jnp.dot(w[:], h, preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b[:], 0.0).astype(jnp.bfloat16)
        acts.append(h)

    g = g_ref[:]  # (1, TILE) dL/draw

    is_first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(is_first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _():
            ref[:] = ref[:] + val

    # output head: raw = sum_F(h_L * w_out) + b_out
    h_last = acts[-1]
    acc(
        grad_refs[2 + 2 * n_hidden],
        jnp.sum(h_last.astype(jnp.float32) * g, axis=1, keepdims=True),  # (F,1)
    )
    acc(grad_refs[3 + 2 * n_hidden], jnp.sum(g, keepdims=True).reshape(1, 1))
    dh = (w_out[:] * g).astype(jnp.bfloat16)  # (F, TILE) broadcast outer product

    # hidden layers, reversed (dz/dh stay bf16; accumulators f32)
    for li in range(n_hidden - 1, -1, -1):
        # compare in f32 — Mosaic rejects bf16 cmpf on this target
        z_mask = (acts[li + 1].astype(jnp.float32) > 0).astype(jnp.bfloat16)
        dz = dh * z_mask  # (F, TILE)
        a_prev = acts[li]
        # dWt = dz @ a_prev^T : contract the TILE axis (K = TILE, ideal MXU)
        dwt = jax.lax.dot_general(
            dz, a_prev,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc(grad_refs[2 + 2 * li], dwt)
        acc(
            grad_refs[3 + 2 * li],
            jnp.sum(dz.astype(jnp.float32), axis=1, keepdims=True),
        )
        wt = param_refs[2 + 2 * li]
        # dh_prev = Wt^T @ dz : contract the F-out axis (sublanes)
        dh = jax.lax.dot_general(
            wt[:], dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    # input layer
    z_mask = (acts[0].astype(jnp.float32) > 0).astype(jnp.bfloat16)
    dz = dh * z_mask
    dw_in_t = jax.lax.dot_general(
        dz, x_bf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (F, 8)
    acc(grad_refs[0], dw_in_t)
    acc(grad_refs[1], jnp.sum(dz.astype(jnp.float32), axis=1, keepdims=True))

    # input gradient dx = W_in @ dz — needed when positions are themselves
    # differentiable (pose refinement: origins carry learnable shifts)
    dx_ref = grad_refs[-1]
    dx_ref[:] = jax.lax.dot_general(
        w_in[:], dz,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, TILE)


def _run_fwd(flat_params, n_hidden, f, x_pad, interpret):
    n_tiles = x_pad.shape[1] // TILE
    param_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_hidden),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_IN_PAD, TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, x_pad.shape[1]), jnp.float32),
        interpret=interpret,
    )(x_pad, *flat_params)


def _run_bwd(flat_params, n_hidden, f, x_pad, g_pad, interpret):
    n_tiles = x_pad.shape[1] // TILE
    param_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat_params]
    grad_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    # last output: per-tile input gradient (8, P_pad)
    grad_shapes.append(jax.ShapeDtypeStruct(x_pad.shape, jnp.float32))
    grad_specs.append(
        pl.BlockSpec((_IN_PAD, TILE), lambda m: (0, m), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_hidden),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_IN_PAD, TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=grad_specs,
        out_shape=grad_shapes,
        interpret=interpret,
    )(x_pad, g_pad, *flat_params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_mlp_raw(params, x, interpret=False):
    """Fused MLP: x (P, 3) f32 -> raw density (P,) f32.

    ``params`` = [(W_in (3,F), b_in (F,)), (W (F,F), b (F,))..., (w_out
    (F,1), b_out (1,))] — the CPPN 'none'-encoding relu stack
    (model/CPPN.py:96-131 shapes).
    """
    out, _ = _fused_fwd(params, x, interpret)
    return out


def _fused_fwd(params, x, interpret):
    flat, n_hidden, f = _prep_params(params)
    x_pad, p = _pad_points(x)
    raw = _run_fwd(flat, n_hidden, f, x_pad, interpret)
    return raw[0, :p], (params, x)


def _fused_bwd(interpret, res, g):
    params, x = res
    flat, n_hidden, f = _prep_params(params)
    x_pad, p = _pad_points(x)
    g_pad = jnp.zeros((1, x_pad.shape[1]), jnp.float32).at[0, :p].set(g)
    *grads_flat, dx_t = _run_bwd(flat, n_hidden, f, x_pad, g_pad, interpret)

    # repack into the params pytree structure, un-transposing / un-padding
    (w_in, b_in), *hidden, (w_out, b_out) = params
    gi = iter(grads_flat)
    dw_in_t = next(gi)  # (F, 8)
    db_in = next(gi).reshape(b_in.shape)
    out = [(dw_in_t[:, :3].T, db_in)]
    for w, b in hidden:
        out.append((next(gi).T, next(gi).reshape(b.shape)))
    dw_out = next(gi).reshape(w_out.shape)
    db_out = next(gi).reshape(b_out.shape)
    out.append((dw_out, db_out))
    dx = dx_t[:3, : x.shape[0]].T.astype(x.dtype)
    return (out, dx)


fused_mlp_raw.defvjp(lambda p, x, i: _fused_fwd(p, x, i), _fused_bwd)


def cppn_params_to_list(flax_params: dict, n_hidden: int):
    """Extract the fused-kernel param list from a CPPN flax params dict
    (layer names from models/cppn.py: input_layer, early_i, output_linear)."""
    p = flax_params["params"]
    out = [(p["input_layer"]["kernel"], p["input_layer"]["bias"])]
    for li in range(n_hidden):
        lp = p[f"early_{li}"]
        out.append((lp["kernel"], lp["bias"]))
    out.append((p["output_linear"]["kernel"], p["output_linear"]["bias"]))
    return out


def list_grads_to_cppn(grads_list, flax_params: dict, n_hidden: int):
    """Inverse of cppn_params_to_list for gradient pytrees."""
    zeros = jax.tree.map(jnp.zeros_like, flax_params)
    p = zeros["params"]
    (dw_in, db_in), *hidden, (dw_out, db_out) = grads_list
    p["input_layer"] = {"kernel": dw_in, "bias": db_in}
    for li, (dw, db) in enumerate(hidden):
        p[f"early_{li}"] = {"kernel": dw, "bias": db}
    p["output_linear"] = {"kernel": dw_out, "bias": db_out}
    return zeros
