"""X-ray transfer functions mapping volume scalars to attenuation.

Semantics of phantomdata/helpers.py:17-18 (rev_sigmoid) and 33-70
(transfer_func_ct): a piecewise-linear HU->attenuation curve with 'binary'
(vessels only) and 'background' variants. The reference builds it from a
chain of in-place masked assignments; here it is a single ``jnp.interp``
over the same breakpoints — identical values, one fused op.
"""

from __future__ import annotations

import jax.numpy as jnp

# breakpoints from helpers.py:36-41
_XS = (0.0, 753.0, 1585.85, 2332.9, 3306.18, 4000.0)
# 'disappearing vessels' curve, used for ALL experiments (helpers.py:52-59)
_YS_BACKGROUND = (0.0, 0.0, 0.05, 0.0, 0.2, 0.4)
# binary curve (helpers.py:44-50)
_YS_BINARY = (0.0, 0.0, 0.0, 0.0, 0.2, 0.4)


def transfer_func_ct(vals: jnp.ndarray, binary: bool = False) -> jnp.ndarray:
    """Piecewise-linear CT transfer function. Ref: helpers.py:33-70.

    Values below x1 map to y1 and above x6 to y6 (jnp.interp clamps the
    same way the reference's boundary assignments do).
    """
    xs = jnp.asarray(_XS, jnp.float32)
    ys = jnp.asarray(_YS_BINARY if binary else _YS_BACKGROUND, jnp.float32)
    return jnp.interp(jnp.asarray(vals, jnp.float32), xs, ys)


def rev_sigmoid(x: jnp.ndarray, c1: float = 1.0, c2: float = 0.0) -> jnp.ndarray:
    """Reverse sigmoid SDF->attenuation transfer: 1/(1+exp(c1*(x-c2))).
    Ref: helpers.py:17-18 (used with c1=2 for the LCA SDF, helpers.py:93)."""
    return 1.0 / (1.0 + jnp.exp(c1 * (jnp.asarray(x, jnp.float32) - c2)))
