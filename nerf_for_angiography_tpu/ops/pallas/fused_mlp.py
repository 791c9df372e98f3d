"""Fused CPPN-MLP Pallas kernel (the framework's hot op).

The training hot path evaluates a small MLP (3 -> F -> ... -> F -> 1) at
~1.7M ray-sample points per iteration (SURVEY.md §3.1: run_nerf_acc.py:294
via nerf_helpers.py:31-45 + CPPN.forward). As plain XLA, every layer's
(P, F) activation tensor round-trips HBM in forward AND backward —
~4 GB/step of pure bandwidth at the reference workload. This kernel keeps
all activations in VMEM:

  * forward: one grid pass over point tiles; per tile all layers run
    back-to-back on the MXU (bf16 inputs, f32 accumulation); only the final
    1-channel raw density is written to HBM.
  * backward (custom VJP): recomputes the tile's activations in VMEM
    (rematerialization — FLOPs are cheap, HBM is not), then runs the
    backward matmuls and accumulates dW/db across sequential grid steps in
    revisited output blocks.

Supports the flagship CPPN shape: pos_enc='none', relu activations,
arbitrary static depth/width (multiples of 128 recommended). Other configs
fall back to the XLA path (models/cppn.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per kernel tile; activations per layer are (TILE, F) bf16 in VMEM.
TILE = 4096
_IN_PAD = 8  # input features (3 coords) padded to one sublane


def _pad_points(x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """(P, 3) -> (P_pad, 8) bf16, P_pad multiple of TILE. bf16 input rows
    keep the gather/DMA lanes dense and the first matmul on the native MXU
    path (f32 inputs measured ~35% slower end to end)."""
    p = x.shape[0]
    p_pad = ((p + TILE - 1) // TILE) * TILE
    out = jnp.zeros((p_pad, _IN_PAD), jnp.bfloat16)
    return out.at[:p, :3].set(x.astype(jnp.bfloat16)), p


def _prep_params(params: Sequence[tuple[jnp.ndarray, jnp.ndarray]]):
    """[(W_in, b_in), hidden..., (w_out, b_out)] -> padded bf16/f32 arrays.

    W_in (3,F) -> (8,F); w_out (F,1) -> row (1,F); biases (1,F)/(1,1).
    """
    (w_in, b_in), *hidden, (w_out, b_out) = params
    f = w_in.shape[1]
    w_in_p = jnp.zeros((_IN_PAD, f), jnp.float32).at[:3, :].set(w_in)
    flat = [w_in_p.astype(jnp.bfloat16), b_in.reshape(1, f).astype(jnp.float32)]
    for w, b in hidden:
        flat += [w.astype(jnp.bfloat16), b.reshape(1, f).astype(jnp.float32)]
    flat += [
        w_out.reshape(1, f).astype(jnp.float32),
        b_out.reshape(1, 1).astype(jnp.float32),
    ]
    return flat, len(hidden), f


def _fwd_kernel(n_hidden, x_ref, *refs):
    out_ref = refs[-1]
    w_in, b_in = refs[0], refs[1]
    h = jnp.dot(x_ref[:], w_in[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b_in[:], 0.0).astype(jnp.bfloat16)
    for li in range(n_hidden):
        w, b = refs[2 + 2 * li], refs[3 + 2 * li]
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b[:], 0.0).astype(jnp.bfloat16)
    w_out, b_out = refs[2 + 2 * n_hidden], refs[3 + 2 * n_hidden]
    raw = jnp.sum(h * w_out[:], axis=1, keepdims=True) + b_out[0, 0]
    out_ref[:] = raw


def _bwd_kernel(n_hidden, x_ref, g_ref, *refs):
    """Recompute activations, backprop, accumulate dW/db across grid steps."""
    n_params = 2 * (n_hidden + 2)
    param_refs = refs[:n_params]
    grad_refs = refs[n_params:]
    w_in, b_in = param_refs[0], param_refs[1]
    w_out = param_refs[2 + 2 * n_hidden]

    # --- recompute forward, activations held as bf16 in VMEM ---
    x_bf = x_ref[:]
    acts = []
    h = jnp.dot(x_bf, w_in[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b_in[:], 0.0).astype(jnp.bfloat16)
    acts.append(h)
    for li in range(n_hidden):
        w, b = param_refs[2 + 2 * li], param_refs[3 + 2 * li]
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b[:], 0.0).astype(jnp.bfloat16)
        acts.append(h)

    g = g_ref[:]  # (TILE, 1) dL/draw

    is_first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(is_first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _():
            ref[:] = ref[:] + val

    # output head: raw = sum(h_L * w_out) + b_out
    h_last = acts[-1]
    acc(
        grad_refs[2 + 2 * n_hidden],
        jnp.sum(h_last.astype(jnp.float32) * g, axis=0, keepdims=True),
    )
    acc(grad_refs[3 + 2 * n_hidden], jnp.sum(g, keepdims=True).reshape(1, 1))
    dh = (g * w_out[:]).astype(jnp.bfloat16)  # (TILE, F)

    # hidden layers, reversed (dz/dh stay bf16; accumulators f32)
    for li in range(n_hidden - 1, -1, -1):
        z_mask = (acts[li + 1].astype(jnp.float32) > 0).astype(jnp.bfloat16)
        dz = dh * z_mask
        a_prev = acts[li]
        dw = jax.lax.dot_general(
            a_prev, dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc(grad_refs[2 + 2 * li], dw)
        acc(
            grad_refs[3 + 2 * li],
            jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True),
        )
        w = param_refs[2 + 2 * li]
        dh = jax.lax.dot_general(
            dz, w[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    # input layer
    z_mask = (acts[0].astype(jnp.float32) > 0).astype(jnp.bfloat16)
    dz = dh * z_mask
    dw_in = jax.lax.dot_general(
        x_bf, dz,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc(grad_refs[0], dw_in)
    acc(grad_refs[1], jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True))


def _run_fwd(flat_params, n_hidden, f, x_pad, interpret):
    n_tiles = x_pad.shape[0] // TILE
    param_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_hidden),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, _IN_PAD), lambda m: (m, 0), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda m: (m, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x_pad.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(x_pad, *flat_params)


def _run_bwd(flat_params, n_hidden, f, x_pad, g_pad, interpret):
    n_tiles = x_pad.shape[0] // TILE
    param_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat_params]
    grad_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_hidden),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, _IN_PAD), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda m: (m, 0), memory_space=pltpu.VMEM),
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
    return raw[:p, 0], (params, x)


def _fused_bwd(interpret, res, g):
    params, x = res
    flat, n_hidden, f = _prep_params(params)
    x_pad, p = _pad_points(x)
    g_pad = jnp.zeros((x_pad.shape[0], 1), jnp.float32).at[:p, 0].set(g)
    grads_flat = _run_bwd(flat, n_hidden, f, x_pad, g_pad, interpret)

    # repack into the params pytree structure, un-padding W_in
    (w_in, b_in), *hidden, (w_out, b_out) = params
    gi = iter(grads_flat)
    dw_in_p = next(gi)
    db_in = next(gi).reshape(b_in.shape)
    out = [(dw_in_p[:3, :], db_in)]
    for w, b in hidden:
        out.append((next(gi), next(gi).reshape(b.shape)))
    dw_out = next(gi).reshape(w_out.shape)
    db_out = next(gi).reshape(b_out.shape)
    out.append((dw_out, db_out))
    return (out, jnp.zeros_like(x))


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
