"""C-arm pose math (pure jnp, differentiable, jit-safe).

Reproduces the coordinate conventions of the reference's
``phantomdata/proj_helpers.py:34-76`` (axis rotation matrices, roadmap-run
geometry rotation ``R = inv(Rz(larm) @ Rx(theta) @ Ry(phi))`` and the
world-to-camera ``source_matrix``). Everything downstream (ray generation,
DRR datagen, evaluation sweeps) depends on these conventions, so they are
matched exactly and property-tested in ``tests/test_geometry.py``.

Angles are in degrees at the public API boundary (as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 4x4 pose matmuls are tiny but feed world-scale coordinates (~1500mm);
# TPU default bf16 matmul precision loses whole millimetres, so force f32.
_HI = jax.lax.Precision.HIGHEST


def _matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HI)


def x_rotation_matrix(angle_rad: jnp.ndarray) -> jnp.ndarray:
    """4x4 rotation about the x axis. Ref: proj_helpers.py:34-40."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z, z], -1),
            jnp.stack([z, c, -s, z], -1),
            jnp.stack([z, s, c, z], -1),
            jnp.stack([z, z, z, o], -1),
        ],
        -2,
    )


def y_rotation_matrix(angle_rad: jnp.ndarray) -> jnp.ndarray:
    """4x4 rotation about the y axis. Ref: proj_helpers.py:42-48."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s, z], -1),
            jnp.stack([z, o, z, z], -1),
            jnp.stack([-s, z, c, z], -1),
            jnp.stack([z, z, z, o], -1),
        ],
        -2,
    )


def z_rotation_matrix(angle_rad: jnp.ndarray) -> jnp.ndarray:
    """4x4 rotation about the z axis. Ref: proj_helpers.py:50-56."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z, z], -1),
            jnp.stack([s, c, z, z], -1),
            jnp.stack([z, z, o, z], -1),
            jnp.stack([z, z, z, o], -1),
        ],
        -2,
    )


def translation_matrix(vec: jnp.ndarray) -> jnp.ndarray:
    """4x4 translation by ``vec[:3]``. Ref: proj_helpers.py:58-61."""
    vec = jnp.asarray(vec, dtype=jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(vec[:3])


def get_rotation(theta_deg, phi_deg, larm_deg) -> jnp.ndarray:
    """Roadmap-run C-arm rotation.

    ``R = inv(Rz(larm) @ Rx(theta) @ Ry(phi))`` with angles in degrees,
    matching proj_helpers.py:63-66. Because each factor is orthonormal the
    inverse is implemented as the transpose of the product (cheaper and
    exactly orthonormal, unlike a generic matrix inverse).
    """
    th = jnp.deg2rad(jnp.asarray(theta_deg, jnp.float32))
    ph = jnp.deg2rad(jnp.asarray(phi_deg, jnp.float32))
    la = jnp.deg2rad(jnp.asarray(larm_deg, jnp.float32))
    fwd = _matmul(z_rotation_matrix(la), _matmul(x_rotation_matrix(th), y_rotation_matrix(ph)))
    # orthonormal => inverse == transpose
    return jnp.swapaxes(fwd, -1, -2)


def source_matrix(
    source_pt,
    theta_deg,
    phi_deg,
    larm_deg=0.0,
    translation=(0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """Camera-to-world matrix of the X-ray source.

    ``T(table_translation) @ R(theta, phi, larm) @ T(source_pt)``,
    matching proj_helpers.py:68-76 (there called ``worldtocam`` although it
    is used as cam2world throughout the reference).
    """
    m2 = get_rotation(theta_deg, phi_deg, larm_deg)
    m3 = translation_matrix(jnp.asarray(source_pt, jnp.float32))
    m4 = translation_matrix(jnp.asarray(translation, jnp.float32))
    return _matmul(m4, _matmul(m2, m3))
