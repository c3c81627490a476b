"""Analytic Jacobians of the reprojection residual.

Signs and ordering follow the reference (reference:
src/cuda_block_solver.cu:329-366 mono, :368-415 stereo): the pose block JP is
(mdim x 6) with rotation (omega) in columns 0..2 and translation (upsilon) in
columns 3..5; the landmark block JL is (mdim x 3).  The signs are folded so
that solving ``H d = b`` with ``b = J^T Omega e`` and ``e = proj - meas``,
then applying ``exp(d)`` on the left, descends the objective (g2o
VertexSE3Expmap convention).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cuba_tpu.ops import quaternion as quat


def mono(Xc: jnp.ndarray, q: jnp.ndarray, cam: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (JP (...,2,6), JL (...,2,3))."""
    X, Y, Z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    inv_z = 1.0 / Z
    x = inv_z * X
    y = inv_z * Y
    fu, fv = cam[..., 0], cam[..., 1]
    fu_iz = fu * inv_z
    fv_iz = fv * inv_z
    R = quat.to_rotation_matrix(q)
    r = lambda i, j: R[..., i, j]

    jl0 = jnp.stack([-fu_iz * (r(0, k) - x * r(2, k)) for k in range(3)], axis=-1)
    jl1 = jnp.stack([-fv_iz * (r(1, k) - y * r(2, k)) for k in range(3)], axis=-1)
    JL = jnp.stack([jl0, jl1], axis=-2)

    zero = jnp.zeros_like(fu)
    jp0 = jnp.stack([fu * x * y, -fu * (1 + x * x), fu * y, -fu_iz, zero, fu_iz * x], axis=-1)
    jp1 = jnp.stack([fv * (1 + y * y), -fv * x * y, -fv * x, zero, -fv_iz, fv_iz * y], axis=-1)
    JP = jnp.stack([jp0, jp1], axis=-2)
    return JP, JL


def stereo(Xc: jnp.ndarray, q: jnp.ndarray, cam: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (JP (...,3,6), JL (...,3,3))."""
    X, Y, Z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    inv_z = 1.0 / Z
    inv_zz = inv_z * inv_z
    fu, fv, bf = cam[..., 0], cam[..., 1], cam[..., 4]
    R = quat.to_rotation_matrix(q)
    r = lambda i, j: R[..., i, j]

    jl0 = jnp.stack([-fu * r(0, k) * inv_z + fu * X * r(2, k) * inv_zz for k in range(3)], axis=-1)
    jl1 = jnp.stack([-fv * r(1, k) * inv_z + fv * Y * r(2, k) * inv_zz for k in range(3)], axis=-1)
    jl2 = jl0 - bf[..., None] * jnp.stack([r(2, k) for k in range(3)], axis=-1) * inv_zz[..., None]
    JL = jnp.stack([jl0, jl1, jl2], axis=-2)

    zero = jnp.zeros_like(fu)
    jp0 = jnp.stack(
        [
            X * Y * inv_zz * fu,
            -(1 + X * X * inv_zz) * fu,
            Y * inv_z * fu,
            -inv_z * fu,
            zero,
            X * inv_zz * fu,
        ],
        axis=-1,
    )
    jp1 = jnp.stack(
        [
            (1 + Y * Y * inv_zz) * fv,
            -X * Y * inv_zz * fv,
            -X * inv_z * fv,
            zero,
            -inv_z * fv,
            Y * inv_zz * fv,
        ],
        axis=-1,
    )
    jp2 = jnp.stack(
        [
            jp0[..., 0] - bf * Y * inv_zz,
            jp0[..., 1] + bf * X * inv_zz,
            jp0[..., 2],
            jp0[..., 3],
            zero,
            jp0[..., 5] - bf * inv_zz,
        ],
        axis=-1,
    )
    JP = jnp.stack([jp0, jp1, jp2], axis=-2)
    return JP, JL


def compute(Xc, q, cam, mdim: int):
    if mdim == 2:
        return mono(Xc, q, cam)
    if mdim == 3:
        return stereo(Xc, q, cam)
    raise ValueError(f"measurement dim must be 2 or 3, got {mdim}")
