"""Quaternion math, layout ``(..., 4) = (x, y, z, w)``.

Semantics follow the reference device math (reference:
src/cuda_block_solver.cu:238-260 rotate, :292-321 quaternionToRotationMatrix,
:492-521 rotationMatrixToQuaternion, :523-529 multiplyQuaternion, :531-539
normalizeQuaternion with the w>=0 convention) so that optimized estimates are
bit-comparable trajectory-wise.  All functions broadcast over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v`` (...,3) by unit quaternions ``q`` (...,4).

    Uses the two-cross-product form: t = 2 (q_v x v); v' = v + w t + q_v x t.
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both (...,4) in (x,y,z,w) layout."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize with the w>=0 sign convention (cu:531-539)."""
    invn = 1.0 / jnp.linalg.norm(q, axis=-1, keepdims=True)
    invn = jnp.where(q[..., 3:4] < 0, -invn, invn)
    return q * invn


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (...,4) -> rotation matrix (...,3,3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2 * x, 2 * y, 2 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    r00 = 1 - (tyy + tzz)
    r01 = txy - twz
    r02 = txz + twy
    r10 = txy + twz
    r11 = 1 - (txx + tzz)
    r12 = tyz - twx
    r20 = txz - twy
    r21 = tyz + twx
    r22 = 1 - (txx + tyy)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_rotation_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> quaternion (...,4), Shepperd's method.

    Vectorized (branch-free) version of the reference's branchy conversion
    (cu:492-521): all four candidate extractions are evaluated with guarded
    square roots and the reference's case-selection rule picks one.
    """
    r = lambda i, j: R[..., i, j]
    trace = r(0, 0) + r(1, 1) + r(2, 2)

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, jnp.asarray(1e-30, R.dtype)))

    # Case W: trace > 0
    tw = safe_sqrt(trace + 1)
    sw = 0.5 / tw
    qw_case = jnp.stack(
        [(r(2, 1) - r(1, 2)) * sw, (r(0, 2) - r(2, 0)) * sw, (r(1, 0) - r(0, 1)) * sw, 0.5 * tw],
        axis=-1,
    )

    def axis_case(i):
        j, k = (i + 1) % 3, (i + 2) % 3
        t = safe_sqrt(r(i, i) - r(j, j) - r(k, k) + 1)
        s = 0.5 / t
        comp = [None, None, None, None]
        comp[i] = 0.5 * t
        comp[3] = (r(k, j) - r(j, k)) * s
        comp[j] = (r(j, i) + r(i, j)) * s
        comp[k] = (r(k, i) + r(i, k)) * s
        return jnp.stack(comp, axis=-1)

    q0, q1, q2 = axis_case(0), axis_case(1), axis_case(2)

    # Reference's index rule: i=0; if R11>R00 i=1; if R(2,2)>R(i,i) i=2.
    use1 = r(1, 1) > r(0, 0)
    qi = jnp.where(use1[..., None], q1, q0)
    rii = jnp.where(use1, r(1, 1), r(0, 0))
    qi = jnp.where((r(2, 2) > rii)[..., None], q2, qi)

    return jnp.where((trace > 0)[..., None], qw_case, qi)
