"""CPPN coordinate field as a flax module (TPU-native re-design of
``model/CPPN.py`` in the reference).

Capability parity with the reference model (ref lines cited inline):
  * configurable depth/width MLP with early/late blocks and a skip
    connection after the early block                    (CPPN.py:96-131,166-205)
  * positional encodings: 'none', 'fourier' (learnable Gaussian
    coefficients), 'barf' (coarse-to-fine annealed)     (CPPN.py:62-94,207-259)
  * activations: relu / sine (SIREN, first-layer w0) / tanh (CPPN.py:52-60,278-300)
  * optional view-direction branch producing rgb+sigma  (CPPN.py:120-127,192-201)
  * per-image learnable 2D translation parameters       (CPPN.py:133-135)
  * activation capture for model-understanding          (CPPN.py:153-164) via
    flax ``sow`` intermediates instead of a mutable dict.

TPU-first departures from the reference:
  * BARF annealing weights are a **pure function of alpha** passed into
    ``__call__`` each step, instead of mutated ``nn.Parameter`` state
    (CPPN.py:236-259 rebuilds a Parameter per update — XLA-hostile).
  * Everything is jit/vmap-safe with static shapes; dtype is configurable so
    the hot path can run bfloat16 on the MXU with float32 params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# The reference's BARF window uses the literal 3.1415 (CPPN.py:252), not pi.
# Kept verbatim for numerical parity of the annealing schedule.
_BARF_PI = 3.1415


@dataclasses.dataclass(frozen=True)
class CPPNConfig:
    """Model definition. Field names mirror the reference's model_definition
    dict (run_nerf_acc.py:168-183) so configs translate one-to-one."""

    num_early_layers: int = 4
    num_late_layers: int = 0
    num_filters: int = 128
    num_input_channels: int = 3
    num_input_channels_views: int = 0
    num_output_channels: int = 1
    use_bias: bool = True
    pos_enc: str = "none"  # 'none' | 'fourier' | 'barf'
    pos_enc_basis: int = 5
    pos_enc_basis_views: int = 4
    act_func: str = "relu"  # 'relu' | 'sine' | 'tanh'
    sine_w0: float = 30.0  # first-layer w0 ('sine_weights' in the reference)
    fourier_sigma: float = 5.0
    num_img: int = 1
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32  # compute dtype (set bfloat16 for MXU speed)
    # TPU-first reparam: scale raw world coords (e.g. +-100mm) into ~[-1,1]
    # before the MLP so bfloat16 activations keep sub-voxel spatial
    # resolution. Pure reparametrization of the first layer — same function
    # class as the reference's raw-coordinate input (CPPN.py:166-182).
    input_scale: float = 1.0

    @property
    def use_viewdirs(self) -> bool:
        return self.num_input_channels_views > 0

    @property
    def encoded_pts_features(self) -> int:
        c = self.num_input_channels
        if self.pos_enc != "none" and self.pos_enc_basis > 0:
            return c + c * 2 * self.pos_enc_basis
        return c

    @property
    def encoded_views_features(self) -> int:
        c = self.num_input_channels_views
        if self.pos_enc != "none" and self.pos_enc_basis_views > 0:
            return c + c * 2 * self.pos_enc_basis_views
        return c

    def to_model_definition(self) -> dict:
        """Export as the reference's model_definition dict shape
        (for checkpoint metadata parity, CPPN.py:261-276)."""
        return {
            "num_early_layers": self.num_early_layers,
            "num_late_layers": self.num_late_layers,
            "num_filters": self.num_filters,
            "num_input_channels": self.num_input_channels,
            "num_input_channels_views": self.num_input_channels_views,
            "num_output_channels": self.num_output_channels,
            "use_bias": self.use_bias,
            "pos_enc": self.pos_enc,
            "pos_enc_basis": self.pos_enc_basis,
            "pos_enc_basis_views": self.pos_enc_basis_views,
            "act_func": self.act_func,
            "sine_weights": self.sine_w0,
            "fourier_sigma": self.fourier_sigma,
            "num_img": self.num_img,
        }


def barf_k_values(pos_enc_basis: int, num_channels: int) -> jnp.ndarray:
    """k index per encoded channel: repeat_interleave(arange(L), C).
    Ref: CPPN.py:84."""
    return jnp.repeat(jnp.arange(pos_enc_basis, dtype=jnp.float32), num_channels)


def barf_weights(alpha, k_values: jnp.ndarray) -> jnp.ndarray:
    """Coarse-to-fine BARF frequency window, pure function of alpha.

    Ref semantics (CPPN.py:244-259): with barf_k = alpha - (k+1),
      w = 0                                   if barf_k < 0
      w = (1 - cos((alpha - k + 1)*3.1415))/2 if 0 <= barf_k < 1
      w = 1                                   if barf_k >= 1
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    barf_k = alpha - (k_values + 1.0)
    mid = (1.0 - jnp.cos((alpha - k_values + 1.0) * _BARF_PI)) / 2.0
    return jnp.where(barf_k < 0.0, 0.0, jnp.where(barf_k < 1.0, mid, 1.0))


def sine(w0: float = 1.0) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """SIREN activation act(x) = sin(w0 * x). Ref: CPPN.py:278-294."""

    def act(x):
        return jnp.sin(w0 * x)

    return act


def _activation(name: str, first: bool, w0: float):
    if name == "sine":
        return sine(w0 if first else 1.0)
    if name == "tanh":
        return jnp.tanh
    return jax.nn.relu


class CPPN(nn.Module):
    """Coordinate MLP: (x,y,z)[+viewdir] -> density (1ch) or rgb+sigma."""

    config: CPPNConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        barf_alpha: jnp.ndarray | float = 0.0,
        barf_alpha_views: jnp.ndarray | float = 0.0,
        capture: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats,
            use_bias=cfg.use_bias,
            name=name,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )
        act = _activation(cfg.act_func, first=False, w0=cfg.sine_w0)
        first_act = _activation(cfg.act_func, first=True, w0=cfg.sine_w0)

        input_pts = x[..., : cfg.num_input_channels] * cfg.input_scale
        input_views = x[..., cfg.num_input_channels :]

        # --- positional encoding (CPPN.py:173-181, 207-234) ---
        pts_encoded = self._pos_enc(
            input_pts, cfg.pos_enc_basis, "pts", barf_alpha
        )
        if cfg.use_viewdirs:
            views_encoded = self._pos_enc(
                input_views, cfg.pos_enc_basis_views, "views", barf_alpha_views
            )

        # --- early block: input layer + num_early_layers hidden (CPPN.py:97-106) ---
        values = first_act(dense(cfg.num_filters, "input_layer")(pts_encoded))
        if capture:
            self.sow("intermediates", "act_input_layer", values)
        for li in range(cfg.num_early_layers):
            values = act(dense(cfg.num_filters, f"early_{li}")(values))
            if capture:
                self.sow("intermediates", f"act_early_{li}", values)

        # --- skip connection + late block (CPPN.py:109-118, 186-190) ---
        if cfg.num_late_layers > 0:
            values = act(
                dense(cfg.num_filters, "skip_connection")(
                    jnp.concatenate([pts_encoded, values], axis=-1)
                )
            )
            if capture:
                self.sow("intermediates", "act_skip_connection", values)
            for li in range(cfg.num_late_layers - 1):
                values = act(dense(cfg.num_filters, f"late_{li}")(values))
                if capture:
                    self.sow("intermediates", f"act_late_{li}", values)

        # --- heads (CPPN.py:120-131, 192-203) ---
        if cfg.use_viewdirs:
            alpha_out = dense(cfg.num_output_channels - 1, "alpha_linear")(values)
            feature = nn.Dense(
                cfg.num_filters,
                name="feature_linear",
                dtype=cfg.dtype,
                param_dtype=cfg.param_dtype,
            )(values)
            v = jnp.concatenate([feature, views_encoded], axis=-1)
            v = act(dense(cfg.num_filters // 2, "views_layer")(v))
            rgb = dense(cfg.num_output_channels - 1, "rgb_linear")(v)
            outputs = jnp.concatenate([rgb, alpha_out], axis=-1)
        else:
            outputs = dense(cfg.num_output_channels, "output_linear")(values)

        # per-image learnable translations, parity with CPPN.py:133-135
        # (declared parameters; consumed by pose-refinement workflows)
        self.param("img1", nn.initializers.zeros, (2,), cfg.param_dtype)
        self.param("img2", nn.initializers.zeros, (2,), cfg.param_dtype)

        return outputs.astype(jnp.float32)

    def _pos_enc(self, values, basis, kind, alpha):
        """concat([x, enc(tile(x, L))]) — ref CPPN.py:207-214."""
        cfg = self.config
        if cfg.pos_enc == "none" or basis <= 0:
            return values
        tiled = jnp.concatenate([values] * basis, axis=-1)
        if cfg.pos_enc == "fourier":
            # learnable Gaussian coefficients ~ N(0, sigma^2) (CPPN.py:70-80)
            coeff = self.param(
                f"fourier_coefficients_{kind}",
                lambda key, shape, dtype: (
                    jax.random.normal(key, shape, dtype) * cfg.fourier_sigma
                ),
                (tiled.shape[-1],),
                cfg.param_dtype,
            )
            v = 2.0 * jnp.pi * tiled * coeff
            enc = jnp.concatenate([jnp.sin(v), jnp.cos(v)], axis=-1)
        elif cfg.pos_enc == "barf":
            # fixed 2^k * pi frequencies, annealed window (CPPN.py:82-94,224-234)
            nch = values.shape[-1]
            k = barf_k_values(basis, nch)
            freq = (2.0**k) * jnp.pi
            w = barf_weights(alpha, k)
            v = freq * tiled
            enc = jnp.concatenate([w * jnp.sin(v), w * jnp.cos(v)], axis=-1)
        else:
            raise ValueError(f"unknown pos_enc: {cfg.pos_enc!r}")
        return jnp.concatenate([values, enc], axis=-1)


def init_cppn(
    config: CPPNConfig, key: jax.Array
) -> tuple[CPPN, Any]:
    """Create the module and initialize parameters."""
    model = CPPN(config)
    dummy = jnp.zeros(
        (1, config.num_input_channels + config.num_input_channels_views),
        jnp.float32,
    )
    params = model.init(key, dummy)
    return model, params


def barf_alpha_schedule(
    step: jnp.ndarray | int,
    pos_enc_basis: int,
    barf_start: int = 8000,
    barf_stop: int = 250000,
) -> jnp.ndarray:
    """Linear BARF alpha annealing: 0 until barf_start, then ramps to
    pos_enc_basis at barf_stop. Ref: run_nerf_acc.py:165-167,268-272."""
    step = jnp.asarray(step, jnp.float32)
    slope = pos_enc_basis / float(barf_stop - barf_start)
    return jnp.clip((step - barf_start) * slope, 0.0, float(pos_enc_basis))
