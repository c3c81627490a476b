"""SE(3) exponential map and left-composed pose updates.

Matches the reference update semantics exactly (reference:
src/cuda_block_solver.cu:551-579 updateExp with the theta<1e-5 small-angle
branch, :581-592 updatePose left-composition), including the layout of the
6-vector increment: ``delta = [omega (rotation), upsilon (translation)]``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cuba_tpu.ops import quaternion as quat

SMALL_ANGLE = 1e-5


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) cross-product matrix [v]x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([zero, -z, y], axis=-1)
    row1 = jnp.stack([z, zero, -x], axis=-1)
    row2 = jnp.stack([-y, x, zero], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def skew_sq(v: jnp.ndarray) -> jnp.ndarray:
    """[v]x^2 in closed form (cu:461-474)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, zx = x * y, y * z, z * x
    row0 = jnp.stack([-yy - zz, xy, zx], axis=-1)
    row1 = jnp.stack([xy, -zz - xx, yz], axis=-1)
    row2 = jnp.stack([zx, yz, -xx - yy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def exp(delta: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SE(3) exp-map: (...,6) -> (q (...,4), t (...,3)).

    R = I + a1 [w]x + a2 [w]x^2,  V = I + b1 [w]x + b2 [w]x^2,  t = V @ upsilon
    with (a1,a2,b1,b2) = (sin/th, (1-cos)/th^2, (1-cos)/th^2, (th-sin)/th^3)
    and the series limits (1, 1/2, 1/2, 1/6) for th < 1e-5.
    """
    omega = delta[..., :3]
    upsilon = delta[..., 3:6]
    theta = jnp.linalg.norm(omega, axis=-1)
    small = theta < SMALL_ANGLE
    th = jnp.where(small, jnp.ones_like(theta), theta)
    s, c = jnp.sin(th), jnp.cos(th)
    a1 = jnp.where(small, jnp.ones_like(th), s / th)
    a2 = jnp.where(small, jnp.full_like(th, 0.5), (1 - c) / (th * th))
    a3 = jnp.where(small, jnp.full_like(th, 1.0 / 6.0), (th - s) / (th * th * th))

    O1 = skew(omega)
    O2 = skew_sq(omega)
    eye = jnp.eye(3, dtype=delta.dtype)
    R = eye + a1[..., None, None] * O1 + a2[..., None, None] * O2
    V = eye + a2[..., None, None] * O1 + a3[..., None, None] * O2

    q = quat.from_rotation_matrix(R)
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    return q, t


def update_pose(delta: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray):
    """Left-compose exp(delta) onto pose (q, t):  T_new = exp(delta) * T_old.

    t' = t_exp + R_exp t;  q' = normalize(q_exp * q) with w>=0 (cu:581-592).
    """
    eq, et = exp(delta)
    t_new = et + quat.rotate(eq, t)
    q_new = quat.normalize(quat.multiply(eq, q))
    return q_new, t_new
