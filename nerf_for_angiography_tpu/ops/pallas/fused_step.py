"""Whole-train-step fused Pallas kernel: MLP forward + Beer-Lambert
composite + MSE loss gradient + MLP backward in ONE pallas_call.

Why (historical): the r4q3/r4q4 overhead isolation initially measured a
~0.75 ms per-pallas_call fixed cost, which this kernel was built to pay
once instead of twice. The r4q5 isolation (benchmarks/MFU.md "Overhead
isolation verdict") RETRACTED that number — it was a timing-harness
artifact (blocking per outer dispatch through the tunnel) — and the
r4q6 A/B measured this kernel SLOWER end-to-end than the split
fused_mlp forward + custom-VJP backward (7.03 vs 6.03 ms full_step;
863k vs 1.024M rays/s steady at quality parity). It is kept, off by
default, as a measured negative result with gradient-exactness tests.
It folds the entire differentiable section of the train step
(run_nerf_acc.py:287-307 equivalents: get_predictions ->
acc_render_volume_density -> mse_loss -> backward) into one
invocation: no (1, P) raw/σ HBM round trips, no XLA glue between
forward and backward.

Total matmul FLOPs are UNCHANGED vs the split kernels: the split
backward already rematerializes the forward in-kernel, so both designs
run 4 forward-equivalents (here: composite pass + remat pass + two
gradient contractions per layer).

Layout (rays in lanes, samples in sublanes — the repo's measured-fast
orientation, see ops/pallas/first_k.py):

  * grid over RAY tiles of FS_TILE lanes; per-ray inputs o/d/target are
    (8|1, FS_TILE) blocks, per-sample inputs t_mid/mask are (k, FS_TILE).
  * pass 1 (composite): fori over the k samples IN DEPTH ORDER. Per
    sample: x = o + d*t (VPU) -> MLP chain (MXU, weights VMEM-stationary)
    -> sigma -> the two running exponents (S_prune drives nerfacc's
    early_stop_eps transmittance mask exactly as ops/occupancy.py::
    prune_mask computes it; S_comp is the pixel's exponent). Nothing per
    sample is stored — pass 2 replays it bit-identically.
  * between passes: pixel = exp(-S_comp); the MSE loss gradient
    g = (2/N)*(pixel - target) and the shared coefficient
    coef = -g*pixel*step are one VPU row each.
  * pass 2 (backward): fori over samples again; recompute the forward
    (keeping the (F, T) activations of the chain), replay S_prune for
    the keep mask, form draw = coef*keep*sigma*(1-sigma), then the
    standard feature-major backward (same contractions and precisions as
    fused_mlp._bwd_kernel), accumulating dW/db into revisited output
    blocks across both the sample loop and the ray-tile grid.

Semantics matched (and pinned by tests/test_fused_step.py parity vs the
autodiff path): density = sigmoid(raw) (nerf_helpers_acc.py:22-24),
pixel = exp(-sum sigma*keep*dists) (acc_render_volume_density,
nerf_helpers_acc.py:45-63), keep = mask * [exclusive-transmittance >=
early_stop_eps] on stop_gradient(sigma) (prune_mask; train_alpha_prune
is the non-default alpha_thre branch and falls back to the split path),
loss = mean((pixel - target)^2) (run_nerf_acc.py:298-303). dists ==
(far-near)/n_samples is a compile-time scalar on every march lattice.

Supported: the pallas-eligible relu/'none'-encoding CPPN stack on
rectangular marches (window/hybrid/lattice). The two-bucket march runs
this kernel once per bucket — each bucket is a rectangular (R_b, k_b)
lattice and parameter grads sum (train.py::_fused_loss_and_grads;
tests/test_fused_step.py::test_train_wiring_two_bucket_march). Pose
refinement falls back to the split kernels (training/train.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _IN_PAD, _layer, _prep_params

# rays per kernel tile (lane axis). VMEM at k=192: t_mid+mask blocks
# 2*(192, 512) f32 = 786 KB (x2 double-buffered), pass-2 activations
# 5 x (128, 512) bf16 = 640 KB, dW accumulators ~130 KB f32 — ~2.5 MB.
FS_TILE = 512


def _fs_kernel(
    n_hidden: int,
    k: int,
    step: float,
    eps: float,
    g_scale: float,
    o_ref,
    d_ref,
    tmid_ref,
    mask_ref,
    tgt_ref,
    *refs,
):
    n_params = 2 * (n_hidden + 2)
    param_refs = refs[:n_params]
    pixel_ref = refs[n_params]
    grad_refs = refs[n_params + 1 :]
    w_in, b_in = param_refs[0], param_refs[1]
    w_out, b_out = param_refs[2 + 2 * n_hidden], param_refs[3 + 2 * n_hidden]
    t = o_ref.shape[1]

    o = o_ref[:]  # (8, T) rows 0-2 = origins * input_scale, rows 3-7 zero
    d = d_ref[:]

    def fwd_sigma(s):
        """Recompute-exact forward at sample s -> (sigma, mask_s, acts).

        Shared by both passes so the transmittance replay in pass 2 sees
        bit-identical sigmas (same _layer ops in the same order)."""
        tm = tmid_ref[pl.ds(s, 1), :]  # (1, T)
        ms = mask_ref[pl.ds(s, 1), :]  # (1, T)
        x = (o + d * tm).astype(jnp.bfloat16)
        acts = []
        h = _layer(w_in, b_in, x)
        acts.append(h)
        for li in range(n_hidden):
            h = _layer(param_refs[2 + 2 * li], param_refs[3 + 2 * li], h)
            acts.append(h)
        raw = (
            jnp.sum(h.astype(jnp.float32) * w_out[:], axis=0, keepdims=True)
            + b_out[0, 0]
        )
        sigma = jax.nn.sigmoid(raw)  # (1, T) f32
        return x, sigma, ms, acts

    # ---- pass 1: composite (depth order matters for the transmittance) ---
    def body1(s, carry):
        s_prune, s_comp = carry
        _, sigma, ms, _ = fwd_sigma(s)
        tau = sigma * (step * ms)
        keep = ms * (jnp.exp(-s_prune) >= eps).astype(jnp.float32)
        return s_prune + tau, s_comp + sigma * (step * keep)

    zero_row = jnp.zeros((1, t), jnp.float32)
    s_prune, s_comp = jax.lax.fori_loop(0, k, body1, (zero_row, zero_row))

    pixel = jnp.exp(-s_comp)  # (1, T)
    pixel_ref[:] = pixel
    # dL/draw_s = g * dpixel/draw_s = g * pixel * (-keep*step*sigma') with
    # g = g_scale*(pixel - target); fold the per-ray factors once
    coef = -(g_scale * (pixel - tgt_ref[:])) * pixel * step

    # ---- pass 2: rematerialized backward over the same sample order -----
    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        for gref in grad_refs:
            gref[:] = jnp.zeros_like(gref)

    def body2(s, s_prune):
        x, sigma, ms, acts = fwd_sigma(s)
        tau = sigma * (step * ms)
        keep = ms * (jnp.exp(-s_prune) >= eps).astype(jnp.float32)
        draw = coef * keep * sigma * (1.0 - sigma)  # (1, T) f32

        # output head: raw = sum_F(h_last * w_out) + b_out
        h_last = acts[-1]
        grad_refs[2 + 2 * n_hidden][:] += jnp.sum(
            h_last.astype(jnp.float32) * draw, axis=1, keepdims=True
        )
        grad_refs[3 + 2 * n_hidden][:] += jnp.sum(draw, keepdims=True).reshape(
            1, 1
        )
        dh = (w_out[:] * draw).astype(jnp.bfloat16)  # (F, T)

        for li in range(n_hidden - 1, -1, -1):
            # f32 compare: Mosaic rejects bf16 cmpf on this target
            dz = dh * (acts[li + 1].astype(jnp.float32) > 0).astype(
                jnp.bfloat16
            )
            grad_refs[2 + 2 * li][:] += jax.lax.dot_general(
                dz,
                acts[li],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            grad_refs[3 + 2 * li][:] += jnp.sum(
                dz.astype(jnp.float32), axis=1, keepdims=True
            )
            wt = param_refs[2 + 2 * li]
            dh = jax.lax.dot_general(
                wt[:],
                dz,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        dz = dh * (acts[0].astype(jnp.float32) > 0).astype(jnp.bfloat16)
        grad_refs[0][:] += jax.lax.dot_general(
            dz,
            x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grad_refs[1][:] += jnp.sum(
            dz.astype(jnp.float32), axis=1, keepdims=True
        )
        return s_prune + tau

    jax.lax.fori_loop(0, k, body2, zero_row)


def fused_step_grads(
    params,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_mid: jnp.ndarray,
    mask: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    step: float,
    early_stop_eps: float,
    n_rays_loss: int,
    input_scale: float = 1.0,
    interpret: bool = False,
):
    """One-pallas_call train-step gradient for a rectangular march.

    params: fused_mlp param list [(W_in (3,F), b_in), (W, b)..., (w_out,
    b_out)]. origins/directions (R, 3) f32 WORLD units; t_mid/mask (R, k)
    f32 (march midpoints + activity, depth-ascending); targets (R,) f32.
    step = (far - near)/n_samples (== every march dist); n_rays_loss = the
    loss mean's divisor N (the GLOBAL batch size under sharding).

    Returns (pixels (R,) f32, grads) with grads in the params structure —
    exactly jax.grad(mean((render - targets)^2))(params) of the split
    path (parity pinned in tests/test_fused_step.py).
    """
    r, k = t_mid.shape
    r_pad = ((r + FS_TILE - 1) // FS_TILE) * FS_TILE
    flat, n_hidden, f = _prep_params(params)

    def fm(a, rows, fill=0.0):
        """(R, c) point-major -> (rows, R_pad) feature-major padded."""
        out = jnp.full((rows, r_pad), fill, jnp.float32)
        return out.at[: a.shape[1], :r].set(a.T.astype(jnp.float32))

    o8 = fm(origins * input_scale, _IN_PAD)
    d8 = fm(directions * input_scale, _IN_PAD)
    tm = fm(t_mid, k)
    mk = fm(mask, k)
    tg = fm(targets[:, None], 1, fill=1.0)  # pad rays render empty: pixel=1

    n_tiles = r_pad // FS_TILE
    param_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat
    ]
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    grad_specs = [
        pl.BlockSpec(p.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for p in flat
    ]

    def row_spec(rows):
        return pl.BlockSpec(
            (rows, FS_TILE), lambda m: (0, m), memory_space=pltpu.VMEM
        )

    pixel_pad, *grads_flat = pl.pallas_call(
        functools.partial(
            _fs_kernel,
            n_hidden,
            k,
            float(step),
            float(early_stop_eps),
            2.0 / float(n_rays_loss),
        ),
        grid=(n_tiles,),
        in_specs=[
            row_spec(_IN_PAD),
            row_spec(_IN_PAD),
            row_spec(k),
            row_spec(k),
            row_spec(1),
            *param_specs,
        ],
        out_specs=[row_spec(1), *grad_specs],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            *grad_shapes,
        ],
        interpret=interpret,
    )(o8, d8, tm, mk, tg, *flat)

    # repack gradients into the params structure (un-transpose / un-pad)
    (w_in, b_in), *hidden, (w_out, b_out) = params
    gi = iter(grads_flat)
    dw_in_t = next(gi)  # (F, 8)
    db_in = next(gi).reshape(b_in.shape)
    out = [(dw_in_t[:, :3].T, db_in)]
    for w, b in hidden:
        out.append((next(gi).T, next(gi).reshape(b.shape)))
    out.append((next(gi).reshape(w_out.shape), next(gi).reshape(b_out.shape)))
    return pixel_pad[0, :r], out
