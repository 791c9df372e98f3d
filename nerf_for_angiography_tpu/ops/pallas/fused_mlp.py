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

# points per kernel tile (the lane axis), set independently for the two
# directions — their VMEM envelopes differ by ~n_layers x:
#   * backward holds n_layers+1 (F, TILE) bf16 activations per chain
#     (rematerialized forward) plus the dW accumulators: 6144 is the
#     measured best on v5e; 8192 fails to compile (VMEM).
#   * forward only ever holds TWO live activations per chain, so it can
#     run much larger tiles — the fwd's profiled soft spot is Mosaic's
#     fixed per-tile cost (~12 us/tile on ~4 us of MXU work at 6144;
#     chains 1->2 bought only +3%, ruling out dependency latency), and
#     bigger tiles amortize exactly that fixed cost.
FWD_TILE = 6144
BWD_TILE = 6144
# independent point-chains evaluated interleaved within one kernel tile:
# the forward is partially VPU-bound (bias+relu+casts between matmuls —
# measured 47 TF/s vs 197 peak), and two dependency chains let the
# scheduler hide one chain's VPU work under the other's MXU matmuls.
FWD_CHAINS = 2
BWD_CHAINS = 2
# output-head implementation: 'reduce' = f32 elementwise product + sublane
# (axis-0) VPU reduction; 'dot' = one (8, F) bf16 MXU matmul whose row 0 is
# w_out (sublane reductions are the forward kernel's profiled soft spot —
# the backward, which has none, runs ~126 TF/s vs the forward's ~46).
HEAD = "reduce"
# inter-layer epilogue precision. The forward kernel is VPU-bound between
# matmuls (bias add + relu + downcast on a (F, TILE) f32 block per layer —
# the backward, whose VPU fraction is ~1/3, runs ~126 TF/s vs the
# forward's ~46). 'bf16' downcasts the f32 MXU accumulator ONCE and runs
# bias+relu in bf16, halving the VPU register/lane traffic for the
# epilogue. (Asking the MXU for a bf16 result directly is NOT possible:
# Mosaic rejects `preferred_element_type=bfloat16` with "'tpu.matmul' op
# Expected matmul acc to be 32-bit" — measured r4q2 mlp_epi.)
# Numerics: activations were rounded to bf16 immediately after the f32
# epilogue anyway, so the only delta is the bias add + relu rounding in
# bf16 — measured on the TPU before any default flip (tools/
# bench_mlp_tile.py --epilogues; quality gate in the r4 queue).
# PALLAS_EPILOGUE=bf16 overrides for measurement/quality runs.
EPILOGUE = __import__("os").environ.get("PALLAS_EPILOGUE", "f32")
_IN_PAD = 8  # input features (3 coords) padded to one f32 sublane tile


def _layer(w_ref, b_ref, h):
    """One hidden layer: MXU matmul (f32 accumulate) + bias + relu, output
    bf16. Shared by forward AND backward-recompute so activation bits (and
    the relu masks derived from them) are identical by construction."""
    if EPILOGUE == "bf16":
        z = jnp.dot(w_ref[:], h, preferred_element_type=jnp.float32)
        return jnp.maximum(
            z.astype(jnp.bfloat16) + b_ref[:].astype(jnp.bfloat16),
            jnp.bfloat16(0),
        )
    z = jnp.dot(w_ref[:], h, preferred_element_type=jnp.float32)
    return jnp.maximum(z + b_ref[:], 0.0).astype(jnp.bfloat16)


def _head(w_out_ref, b_out_ref, h):
    """Output head: raw = sum_F(h * w_out) + b_out -> (1, t) f32."""
    if HEAD == "dot":
        # w_out packed as (8, F) bf16, row 0 live, rows 1-7 zero; h is
        # already bf16 — one tiny MXU matmul replaces the sublane reduce
        raw = jnp.dot(
            w_out_ref[:], h, preferred_element_type=jnp.float32
        )[0:1]
    else:
        raw = jnp.sum(
            h.astype(jnp.float32) * w_out_ref[:], axis=0, keepdims=True
        )
    return raw + b_out_ref[0, 0]


def _pad_points(x: jnp.ndarray, tile: int) -> tuple[jnp.ndarray, int]:
    """(P, 3) f32 -> (8, P_pad) f32 feature-major, P_pad multiple of tile."""
    p = x.shape[0]
    p_pad = ((p + tile - 1) // tile) * tile
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


def _fwd_kernel(n_hidden, chains, x_ref, *refs):
    out_ref = refs[-1]
    w_in, b_in = refs[0], refs[1]
    t = x_ref.shape[1] // chains
    xs = [
        x_ref[:, c * t : (c + 1) * t].astype(jnp.bfloat16) for c in range(chains)
    ]
    hs = [_layer(w_in, b_in, x) for x in xs]
    for li in range(n_hidden):
        w, b = refs[2 + 2 * li], refs[3 + 2 * li]
        hs = [_layer(w, b, h) for h in hs]
    # head params sit after the hidden stack: (w_out, b_out) — in 'dot'
    # mode w_out arrives pre-packed as (8, F) bf16 (see _run_fwd)
    w_out, b_out = refs[2 + 2 * n_hidden], refs[3 + 2 * n_hidden]
    for c in range(chains):
        out_ref[:, c * t : (c + 1) * t] = _head(w_out, b_out, hs[c])


def _bwd_kernel(n_hidden, chains, x_ref, g_ref, *refs):
    """Recompute activations, backprop, accumulate dW/db across grid steps.

    All gradients are produced in the TRANSPOSED (feature-major) orientation
    and un-transposed once at repack time (cheap F x F XLA transposes).
    ``chains`` independent point-chains run interleaved (see CHAINS); their
    dW/db contributions sum in-kernel before the cross-tile accumulate.
    """
    n_params = 2 * (n_hidden + 2)
    param_refs = refs[:n_params]
    grad_refs = refs[n_params:]
    w_in, b_in = param_refs[0], param_refs[1]
    w_out = param_refs[2 + 2 * n_hidden]
    t = x_ref.shape[1] // chains
    cs = range(chains)

    # --- recompute forward, activations held as (F, t) bf16 per chain ---
    # (_layer shared with the forward kernel: identical activation bits,
    # hence identical relu masks in the backprop below)
    xs = [x_ref[:, c * t : (c + 1) * t].astype(jnp.bfloat16) for c in cs]
    acts = [[] for _ in cs]
    hs = [_layer(w_in, b_in, x) for x in xs]
    for c in cs:
        acts[c].append(hs[c])
    for li in range(n_hidden):
        w, b = param_refs[2 + 2 * li], param_refs[3 + 2 * li]
        hs = [_layer(w, b, h) for h in hs]
        for c in cs:
            acts[c].append(hs[c])

    gs = [g_ref[:, c * t : (c + 1) * t] for c in cs]  # (1, t) dL/draw

    is_first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(is_first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _():
            ref[:] = ref[:] + val

    def chain_sum(vals):
        out = vals[0]
        for v in vals[1:]:
            out = out + v
        return out

    # output head: raw = sum_F(h_L * w_out) + b_out
    acc(
        grad_refs[2 + 2 * n_hidden],
        chain_sum([
            jnp.sum(acts[c][-1].astype(jnp.float32) * gs[c], axis=1, keepdims=True)
            for c in cs
        ]),  # (F, 1)
    )
    acc(
        grad_refs[3 + 2 * n_hidden],
        chain_sum([jnp.sum(gs[c], keepdims=True).reshape(1, 1) for c in cs]),
    )
    dhs = [(w_out[:] * gs[c]).astype(jnp.bfloat16) for c in cs]  # (F, t)

    # hidden layers, reversed (dz/dh stay bf16; accumulators f32)
    for li in range(n_hidden - 1, -1, -1):
        # compare in f32 — Mosaic rejects bf16 cmpf on this target
        dzs = [
            dhs[c]
            * (acts[c][li + 1].astype(jnp.float32) > 0).astype(jnp.bfloat16)
            for c in cs
        ]
        # dWt = dz @ a_prev^T : contract the point axis (K = t, ideal MXU)
        acc(
            grad_refs[2 + 2 * li],
            chain_sum([
                jax.lax.dot_general(
                    dzs[c], acts[c][li],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for c in cs
            ]),
        )
        acc(
            grad_refs[3 + 2 * li],
            chain_sum([
                jnp.sum(dzs[c].astype(jnp.float32), axis=1, keepdims=True)
                for c in cs
            ]),
        )
        wt = param_refs[2 + 2 * li]
        # dh_prev = Wt^T @ dz : contract the F-out axis (sublanes)
        dhs = [
            jax.lax.dot_general(
                wt[:], dzs[c],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            for c in cs
        ]

    # input layer
    dzs = [
        dhs[c] * (acts[c][0].astype(jnp.float32) > 0).astype(jnp.bfloat16)
        for c in cs
    ]
    acc(
        grad_refs[0],
        chain_sum([
            jax.lax.dot_general(
                dzs[c], xs[c],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for c in cs
        ]),  # (F, 8)
    )
    acc(
        grad_refs[1],
        chain_sum([
            jnp.sum(dzs[c].astype(jnp.float32), axis=1, keepdims=True)
            for c in cs
        ]),
    )

    # input gradient dx = W_in @ dz — needed when positions are themselves
    # differentiable (pose refinement: origins carry learnable shifts)
    dx_ref = grad_refs[-1]
    for c in cs:
        dx_ref[:, c * t : (c + 1) * t] = jax.lax.dot_general(
            w_in[:], dzs[c],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, t)


def _run_fwd(flat_params, n_hidden, f, x_pad, interpret):
    n_tiles = x_pad.shape[1] // FWD_TILE
    if HEAD == "dot":
        # repack the (F, 1) f32 w_out column as an (8, F) bf16 matrix with
        # row 0 live — the head becomes one tiny MXU matmul in-kernel
        w_out = flat_params[2 + 2 * n_hidden]
        packed = jnp.zeros((_IN_PAD, f), jnp.bfloat16).at[0, :].set(
            w_out[:, 0].astype(jnp.bfloat16)
        )
        flat_params = [*flat_params]
        flat_params[2 + 2 * n_hidden] = packed
    param_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_hidden, FWD_CHAINS),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_IN_PAD, FWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((1, FWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, x_pad.shape[1]), jnp.float32),
        interpret=interpret,
    )(x_pad, *flat_params)


def _run_bwd(flat_params, n_hidden, f, x_pad, g_pad, interpret):
    n_tiles = x_pad.shape[1] // BWD_TILE
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
        pl.BlockSpec((_IN_PAD, BWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_hidden, BWD_CHAINS),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_IN_PAD, BWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
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
    x_pad, p = _pad_points(x, FWD_TILE)
    raw = _run_fwd(flat, n_hidden, f, x_pad, interpret)
    return raw[0, :p], (params, x)


def _fused_bwd(interpret, res, g):
    params, x = res
    flat, n_hidden, f = _prep_params(params)
    x_pad, p = _pad_points(x, BWD_TILE)
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


# ---------------------------------------------------------------------------
# Feature-major entry: skips the (P, 3) -> (8, P) relayout entirely.
#
# fused_mlp_raw's wrapper transposes every point batch before the kernel
# (_pad_points) and transposes dx back after it — layout work XLA executes
# at 3-of-128 lane occupancy. When the CALLER can build its points
# feature-major in the first place (the training hot path recomputes
# positions affinely from compacted t values, training/train.py — emitting
# (3, R, k) instead of (R, k, 3) is the same broadcast with axes swapped),
# this entry takes the (8, P) block directly: rows 0-2 are the coords,
# rows 3-7 are DON'T-CARE (W_in columns 3-7 are zero by construction in
# _prep_params, so any finite values contribute nothing). The gradient is
# returned in the same (8, P) orientation; rows 3-7 of dx are zero for the
# same reason.
# ---------------------------------------------------------------------------


def _pad_lanes(x_fm: jnp.ndarray, tile: int) -> tuple[jnp.ndarray, int]:
    """(8, P) f32 -> (8, P_pad), P_pad a multiple of tile (lane-axis pad —
    no relayout, unlike _pad_points' transpose)."""
    p = x_fm.shape[1]
    p_pad = ((p + tile - 1) // tile) * tile
    if p_pad == p:
        return x_fm, p
    return jnp.pad(x_fm, ((0, 0), (0, p_pad - p))), p


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_mlp_raw_fm(params, x_fm, interpret=False):
    """Feature-major fused MLP: x_fm (8, P) f32 -> raw density (P,) f32.

    Rows 0-2 of ``x_fm`` are the point coordinates; rows 3-7 are ignored
    (finite values required). Same params layout as fused_mlp_raw."""
    out, _ = _fused_fwd_fm(params, x_fm, interpret)
    return out


def _fused_fwd_fm(params, x_fm, interpret):
    flat, n_hidden, f = _prep_params(params)
    x_pad, p = _pad_lanes(x_fm, FWD_TILE)
    raw = _run_fwd(flat, n_hidden, f, x_pad, interpret)
    return raw[0, :p], (params, x_fm)


def _fused_bwd_fm(interpret, res, g):
    params, x_fm = res
    flat, n_hidden, f = _prep_params(params)
    x_pad, p = _pad_lanes(x_fm, BWD_TILE)
    g_pad = jnp.zeros((1, x_pad.shape[1]), jnp.float32).at[0, :p].set(g)
    *grads_flat, dx_fm = _run_bwd(flat, n_hidden, f, x_pad, g_pad, interpret)

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
    return (out, dx_fm[:, : x_fm.shape[1]].astype(x_fm.dtype))


fused_mlp_raw_fm.defvjp(lambda p, x, i: _fused_fwd_fm(p, x, i), _fused_bwd_fm)


# ---------------------------------------------------------------------------
# Encoded variants: fourier / BARF positional encodings fused in-kernel.
#
# The flax encode (models/cppn.py::_pos_enc, ref CPPN.py:207-234) maps
# x (3,) -> [x, w*sin(v), w*cos(v)] with v = a_j * x_{j%3}:
#   fourier: a_j = 2*pi*coeff_j (LEARNABLE), w_j = 1
#   barf:    a_j = 2^{j//3}*pi (fixed),      w_j = coarse-to-fine window(alpha)
#
# TPU-native formulation: the tiling+scaling is ONE tiny matmul V = A @ x
# with A (E_pad, 8) holding identity rows for the raw coords and a_j at
# column j%3 for the encoded rows; sin/cos apply row-selectively on the VPU;
# the per-row window w multiplies in. The encode therefore never touches
# HBM (the kernel input stays the (8, TILE) coords), and backward gets
# dA = dV @ x^T per tile — a K=TILE MXU contraction — from which dcoeff is
# extracted outside (2 rows of dA per coefficient).
# ---------------------------------------------------------------------------


def _enc_arrays(spec: tuple, enc_params: dict):
    """Build (A, w_rows, n_sin, E, E_pad) for an encoding spec.

    spec = (kind, L); enc_params = {'coeff': (3L,)} for fourier,
    {'w': (3L,)} (the barf_weights window at the current alpha) for barf.
    """
    kind, L = spec
    n_sin = 3 * L
    e = 3 + 2 * n_sin
    e_pad = ((e + 7) // 8) * 8
    cols = jnp.tile(jnp.arange(3), L)  # channel j encodes coordinate j % 3
    if kind == "fourier":
        a = 2.0 * jnp.pi * enc_params["coeff"].astype(jnp.float32)
        w_enc = jnp.ones((n_sin,), jnp.float32)
    elif kind == "barf":
        k = jnp.repeat(jnp.arange(L, dtype=jnp.float32), 3)  # j // 3
        a = (2.0**k) * jnp.pi
        w_enc = enc_params["w"].astype(jnp.float32)
    else:  # pragma: no cover
        raise ValueError(f"unknown encoding kind {kind!r}")
    mat = jnp.zeros((e_pad, _IN_PAD), jnp.float32)
    mat = mat.at[jnp.arange(3), jnp.arange(3)].set(1.0)
    mat = mat.at[3 + jnp.arange(n_sin), cols].set(a)
    mat = mat.at[3 + n_sin + jnp.arange(n_sin), cols].set(a)
    w_rows = jnp.ones((e_pad, 1), jnp.float32)
    w_rows = w_rows.at[3 + jnp.arange(n_sin), 0].set(w_enc)
    w_rows = w_rows.at[3 + n_sin + jnp.arange(n_sin), 0].set(w_enc)
    return mat, w_rows, n_sin, e, e_pad


def _prep_params_enc(params, e: int, e_pad: int):
    """Like _prep_params but with an (E, F) encoded input layer."""
    (w_in, b_in), *hidden, (w_out, b_out) = params
    f = w_in.shape[1]
    w_in_t = jnp.zeros((f, e_pad), jnp.float32).at[:, :e].set(w_in.T)
    flat = [w_in_t.astype(jnp.bfloat16), b_in.reshape(f, 1).astype(jnp.float32)]
    for w, b in hidden:
        flat += [w.T.astype(jnp.bfloat16), b.reshape(f, 1).astype(jnp.float32)]
    flat += [
        w_out.reshape(f, 1).astype(jnp.float32),
        b_out.reshape(1, 1).astype(jnp.float32),
    ]
    return flat, len(hidden), f


def _encode_tile(x_ref, a_ref, w_ref, n_sin: int):
    """(8, TILE) coords -> (E_pad, TILE) bf16 encoded block, plus the f32
    pre-activation V (needed again in backward)."""
    v = jnp.dot(a_ref[:], x_ref[:], preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    sel_sin = (row >= 3) & (row < 3 + n_sin)
    sel_cos = (row >= 3 + n_sin) & (row < 3 + 2 * n_sin)
    enc = jnp.where(sel_sin, jnp.sin(v), jnp.where(sel_cos, jnp.cos(v), v))
    return (enc * w_ref[:]).astype(jnp.bfloat16), v


def _fwd_kernel_enc(n_hidden, n_sin, x_ref, a_ref, w_ref, *refs):
    out_ref = refs[-1]
    w_in, b_in = refs[0], refs[1]
    enc, _ = _encode_tile(x_ref, a_ref, w_ref, n_sin)
    h = _layer(w_in, b_in, enc)
    for li in range(n_hidden):
        h = _layer(refs[2 + 2 * li], refs[3 + 2 * li], h)
    w_out, b_out = refs[2 + 2 * n_hidden], refs[3 + 2 * n_hidden]
    raw = jnp.sum(h.astype(jnp.float32) * w_out[:], axis=0, keepdims=True)
    out_ref[:] = raw + b_out[0, 0]


def _bwd_kernel_enc(n_hidden, n_sin, x_ref, g_ref, a_ref, w_ref, *refs):
    """Backward with in-kernel encode recompute; extra dA accumulator."""
    n_params = 2 * (n_hidden + 2)
    param_refs = refs[:n_params]
    grad_refs = refs[n_params:]
    w_in, b_in = param_refs[0], param_refs[1]
    w_out = param_refs[2 + 2 * n_hidden]

    enc, v = _encode_tile(x_ref, a_ref, w_ref, n_sin)
    acts = []
    h = _layer(w_in, b_in, enc)
    acts.append(h)
    for li in range(n_hidden):
        h = _layer(param_refs[2 + 2 * li], param_refs[3 + 2 * li], h)
        acts.append(h)

    g = g_ref[:]
    is_first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(is_first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _():
            ref[:] = ref[:] + val

    h_last = acts[-1]
    acc(
        grad_refs[2 + 2 * n_hidden],
        jnp.sum(h_last.astype(jnp.float32) * g, axis=1, keepdims=True),
    )
    acc(grad_refs[3 + 2 * n_hidden], jnp.sum(g, keepdims=True).reshape(1, 1))
    dh = (w_out[:] * g).astype(jnp.bfloat16)

    for li in range(n_hidden - 1, -1, -1):
        z_mask = (acts[li + 1].astype(jnp.float32) > 0).astype(jnp.bfloat16)
        dz = dh * z_mask
        a_prev = acts[li]
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
        dh = jax.lax.dot_general(
            wt[:], dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    # input layer: its input is the ENCODED block
    z_mask = (acts[0].astype(jnp.float32) > 0).astype(jnp.bfloat16)
    dz = dh * z_mask
    dw_in_t = jax.lax.dot_general(
        dz, enc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (F, E_pad)
    acc(grad_refs[0], dw_in_t)
    acc(grad_refs[1], jnp.sum(dz.astype(jnp.float32), axis=1, keepdims=True))

    # back through the encode: dencw -> dv -> (dA, dx)
    dencw = jax.lax.dot_general(
        w_in[:], dz,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (E_pad, TILE)
    denc = dencw * w_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    sel_sin = (row >= 3) & (row < 3 + n_sin)
    sel_cos = (row >= 3 + n_sin) & (row < 3 + 2 * n_sin)
    dv = jnp.where(
        sel_sin, jnp.cos(v), jnp.where(sel_cos, -jnp.sin(v), 1.0)
    ) * denc
    da = jax.lax.dot_general(
        dv, x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (E_pad, 8)
    acc(grad_refs[-2], da)
    # dx = A^T @ dv (pose refinement path)
    grad_refs[-1][:] = jax.lax.dot_general(
        a_ref[:], dv,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, TILE)


def _run_fwd_enc(flat_params, n_hidden, n_sin, mat, w_rows, x_pad, interpret):
    n_tiles = x_pad.shape[1] // FWD_TILE
    fixed_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in (mat, w_rows, *flat_params)
    ]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_enc, n_hidden, n_sin),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_IN_PAD, FWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
            *fixed_specs,
        ],
        out_specs=pl.BlockSpec((1, FWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, x_pad.shape[1]), jnp.float32),
        interpret=interpret,
    )(x_pad, mat, w_rows, *flat_params)


def _run_bwd_enc(flat_params, n_hidden, n_sin, mat, w_rows, x_pad, g_pad, interpret):
    n_tiles = x_pad.shape[1] // BWD_TILE
    fixed_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in (mat, w_rows, *flat_params)
    ]
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat_params]
    grad_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    grad_shapes.append(jax.ShapeDtypeStruct(mat.shape, jnp.float32))  # dA
    grad_specs.append(
        pl.BlockSpec(mat.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
    )
    grad_shapes.append(jax.ShapeDtypeStruct(x_pad.shape, jnp.float32))  # dx
    grad_specs.append(
        pl.BlockSpec((_IN_PAD, BWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel_enc, n_hidden, n_sin),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_IN_PAD, BWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BWD_TILE), lambda m: (0, m), memory_space=pltpu.VMEM),
            *fixed_specs,
        ],
        out_specs=grad_specs,
        out_shape=grad_shapes,
        interpret=interpret,
    )(x_pad, g_pad, mat, w_rows, *flat_params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def fused_mlp_enc_raw(spec, params, enc_params, x, interpret=False):
    """Fused encoded MLP: x (P, 3) -> raw density (P,) with the fourier or
    BARF positional encoding computed in-kernel.

    spec = ('fourier'|'barf', pos_enc_basis); ``params`` as fused_mlp_raw
    but with W_in of shape (3 + 6L, F) (the encoded width, CPPN.py:207-214);
    ``enc_params`` = {'coeff': (3L,)} learnable Gaussian coefficients
    (fourier, CPPN.py:70-80) or {'w': (3L,)} the barf_weights window at the
    current alpha (barf, CPPN.py:244-259 — not differentiated; the anneal
    is a schedule).
    """
    out, _ = _fused_enc_fwd(spec, params, enc_params, x, interpret)
    return out


def _fused_enc_fwd(spec, params, enc_params, x, interpret):
    mat, w_rows, n_sin, e, e_pad = _enc_arrays(spec, enc_params)
    flat, n_hidden, f = _prep_params_enc(params, e, e_pad)
    x_pad, p = _pad_points(x, FWD_TILE)
    raw = _run_fwd_enc(flat, n_hidden, n_sin, mat, w_rows, x_pad, interpret)
    return raw[0, :p], (params, enc_params, x)


def _fused_enc_bwd(spec, interpret, res, g):
    params, enc_params, x = res
    mat, w_rows, n_sin, e, e_pad = _enc_arrays(spec, enc_params)
    flat, n_hidden, f = _prep_params_enc(params, e, e_pad)
    x_pad, p = _pad_points(x, BWD_TILE)
    g_pad = jnp.zeros((1, x_pad.shape[1]), jnp.float32).at[0, :p].set(g)
    *grads_flat, da, dx_t = _run_bwd_enc(
        flat, n_hidden, n_sin, mat, w_rows, x_pad, g_pad, interpret
    )

    (w_in, b_in), *hidden, (w_out, b_out) = params
    gi = iter(grads_flat)
    dw_in_t = next(gi)  # (F, E_pad)
    db_in = next(gi).reshape(b_in.shape)
    out = [(dw_in_t[:, :e].T, db_in)]
    for w, b in hidden:
        out.append((next(gi).T, next(gi).reshape(b.shape)))
    dw_out = next(gi).reshape(w_out.shape)
    db_out = next(gi).reshape(b_out.shape)
    out.append((dw_out, db_out))
    dx = dx_t[:3, : x.shape[0]].T.astype(x.dtype)

    kind, L = spec
    n_sin_i = 3 * L
    cols = jnp.tile(jnp.arange(3), L)
    if kind == "fourier":
        rows_sin = 3 + jnp.arange(n_sin_i)
        rows_cos = 3 + n_sin_i + jnp.arange(n_sin_i)
        dcoeff = 2.0 * jnp.pi * (da[rows_sin, cols] + da[rows_cos, cols])
        denc_params = {"coeff": dcoeff.astype(enc_params["coeff"].dtype)}
    else:
        denc_params = {"w": jnp.zeros_like(enc_params["w"])}
    return (out, denc_params, dx)


fused_mlp_enc_raw.defvjp(
    lambda s, p, e, x, i: _fused_enc_fwd(s, p, e, x, i), _fused_enc_bwd
)


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
