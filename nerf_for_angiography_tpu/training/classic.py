"""Classic (non-accelerated) NeRF training: stratified coarse sampling +
hierarchical inverse-CDF fine resampling, no occupancy grid.

Covers the reference's un-accelerated capability set (BASELINE.json configs
1-2): ``render_volume_density`` with stratified depths (nerf_helpers.py:
13-22,59-123,245-257) and the coarse->fine pipeline (``fine_sampling`` /
``sample_pdf``, nerf_helpers.py:178-222 — whose reference implementation is
bit-rotted, SURVEY.md §2.9-bis; fixed here). One jitted step: both passes,
both losses, one Adam update. Supports a separate fine model or shared
weights (the reference passes fine_model=None to share,
nerf_helpers.py:190).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..geometry import linspace_depths, query_points, stratify_depths
from ..models import CPPN, barf_alpha_schedule
from ..ops.occupancy import prune_mask
from ..ops.rendering import fine_sampling, psnr_from_mse, render_xray
from ..ops.sampling import RayDataset, sample_pixel_rays
from .config import TrainConfig
from .train import make_optimizer


class ClassicState(NamedTuple):
    params: Any  # coarse model params
    fine_params: Any  # fine model params (may be None -> shared)
    opt_state: Any
    step: jnp.ndarray
    key: jax.Array


def make_classic_train_step(
    model: CPPN,
    cfg: TrainConfig,
    near: float,
    far: float,
    n_fine: int = 64,
    fine_model: CPPN | None = None,
    entropy_weight: float = 0.0,
):
    """Jitted coarse(+fine) X-ray NeRF step.

    Per iteration: weighted ray sampling -> stratified coarse depths ->
    coarse render -> inverse-CDF fine depths from coarse weights -> fine
    render -> MSE(coarse) + MSE(fine) [+ entropy regularizer] -> Adam.
    """
    tx = make_optimizer(cfg)
    shared = fine_model is None
    fine = model if shared else fine_model
    base_depths = linspace_depths(near, far, cfg.depth_samples_per_ray)
    use_views = model.config.use_viewdirs
    use_barf = cfg.pos_enc == "barf"

    def train_step(state: ClassicState, rays: RayDataset):
        # both BARF windows anneal on the same start/stop schedule
        # (CPPN.py:236-242 exposes the views alpha; the reference driver
        # only ever steps 'pts', run_nerf_acc.py:268-272 — views fixed here)
        alpha_pts = (
            barf_alpha_schedule(
                state.step, cfg.pos_enc_basis, cfg.barf_start, cfg.barf_stop
            )
            if use_barf
            else 0.0
        )
        alpha_views = (
            barf_alpha_schedule(
                state.step, cfg.pos_enc_basis_views, cfg.barf_start, cfg.barf_stop
            )
            if (use_barf and use_views)
            else 0.0
        )
        key, k_sample, k_strat, k_fine = jax.random.split(state.key, 4)
        batch = sample_pixel_rays(
            k_sample, rays, cfg.img_sample_size,
            weighted=cfg.sampling_strategy != "random",
        )
        n_rays = cfg.img_sample_size
        depths = stratify_depths(
            jnp.broadcast_to(base_depths, (n_rays, cfg.depth_samples_per_ray)),
            k_strat,
        )

        def render(params_all, depths_r, which):
            p = params_all[0] if which == "coarse" or shared else params_all[1]
            m = model if which == "coarse" or shared else fine
            pts = query_points(batch.origins, batch.directions, depths_r)
            if use_views:
                # per-ray unit view direction, broadcast along samples
                # (run_nerf.py viewdirs contract; the density head still
                # drives the X-ray compositing via [..., -1])
                vd = batch.directions / jnp.linalg.norm(
                    batch.directions, axis=-1, keepdims=True
                )
                inp = jnp.concatenate(
                    [pts, jnp.broadcast_to(vd[:, None, :], pts.shape)], axis=-1
                )
            else:
                inp = pts
            raw = m.apply(
                p,
                inp.reshape(-1, inp.shape[-1]),
                barf_alpha=alpha_pts,
                barf_alpha_views=alpha_views,
            )
            sigma = jax.nn.sigmoid(raw[..., -1]).reshape(depths_r.shape)
            # finite last segment: the reference's 1e10 tail
            # (nerf_helpers.py:60-61) multiplied by a sigmoid density makes
            # every pixel identically 0 and kills all gradients — one of the
            # reasons its classic path is bit-rotted (SURVEY.md §2.9-bis).
            d = depths_r[..., 1:] - depths_r[..., :-1]
            dists = jnp.concatenate([d, d[..., -1:]], axis=-1)
            dists = dists * jnp.linalg.norm(
                batch.directions, axis=-1, keepdims=True
            )
            # transmittance early stop (stop-grad), as in the accelerated
            # path: with a sigmoid density at init every ray saturates
            # opaque (pixel = exp(-~100) = 0) and gradients vanish; pruning
            # samples past the early-stop horizon keeps them alive — the
            # same ignition nerfacc's early_stop_eps provides the reference.
            keep = jax.lax.stop_gradient(
                prune_mask(sigma, dists, jnp.ones_like(sigma),
                           early_stop_eps=cfg.early_stop_eps)
            )
            return render_xray(sigma, depths_r, None, dists=dists, mask=keep)

        def loss_fn(params_all):
            coarse = render(params_all, depths, "coarse")
            loss_c = jnp.mean((coarse.pixels - batch.pixel_values) ** 2)

            fine_depths = fine_sampling(depths, coarse.weights, n_fine, k_fine)
            fine_out = render(params_all, fine_depths, "fine")
            loss_f = jnp.mean((fine_out.pixels - batch.pixel_values) ** 2)

            loss = loss_c + loss_f
            if entropy_weight > 0:
                loss = loss + entropy_weight * jnp.mean(fine_out.entropy)
            return loss, (loss_c, loss_f, fine_out.pixels)

        params_all = (state.params, state.fine_params)
        (loss, (loss_c, loss_f, pix)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params_all)
        updates, opt_state = tx.update(grads, state.opt_state, params_all)
        new_params = optax.apply_updates(params_all, updates)

        metrics = {
            "loss/train-pixel-coarse": loss_c,
            "loss/train-pixel-fine": loss_f,
            "psnr/train-coarse": psnr_from_mse(loss_c),
            "psnr/train-fine": psnr_from_mse(loss_f),
            # reference TB tag (run_nerf_acc.py:409) + the views alpha
            "barf-coarse": jnp.asarray(alpha_pts, jnp.float32),
            "barf-views-coarse": jnp.asarray(alpha_views, jnp.float32),
        }
        return (
            ClassicState(
                params=new_params[0],
                fine_params=new_params[1],
                opt_state=opt_state,
                step=state.step + 1,
                key=key,
            ),
            metrics,
        )

    return jax.jit(train_step, donate_argnums=(0,))


def create_classic_state(
    model: CPPN, params, cfg: TrainConfig, key: jax.Array,
    fine_params=None,
) -> ClassicState:
    tx = make_optimizer(cfg)
    pall = (params, fine_params)
    return ClassicState(
        params=params,
        fine_params=fine_params,
        opt_state=tx.init(pall),
        step=jnp.zeros((), jnp.int32),
        key=key,
    )
