"""Fixed-size symmetric solves: closed-form 3x3 inverse, 3x3 solve, and the
6x6 solve via an internal 3x3 Schur complement.

These mirror the reference device routines (reference:
src/cuda_block_solver.cu:417-452 Sym3x3Inv, :610-615 solveSym3x3, :617-664
solveSym6x6) but are batched over leading dimensions and compile to VPU code
under XLA — no per-thread scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def sym3x3_inv(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of symmetric (...,3,3) matrices.

    Reads only the entries the reference reads (upper triangle + A(2,0),
    A(1,2)) and returns an exactly-symmetric inverse.
    """
    a00 = A[..., 0, 0]
    a01 = A[..., 0, 1]
    a11 = A[..., 1, 1]
    a02 = A[..., 2, 0]
    a12 = A[..., 1, 2]
    a22 = A[..., 2, 2]

    det = (
        a00 * a11 * a22
        + a01 * a12 * a02
        + a02 * a01 * a12
        - a00 * a12 * a12
        - a02 * a11 * a02
        - a01 * a01 * a22
    )
    inv_det = 1.0 / det

    b00 = inv_det * (a11 * a22 - a12 * a12)
    b01 = inv_det * (a02 * a12 - a01 * a22)
    b11 = inv_det * (a00 * a22 - a02 * a02)
    b02 = inv_det * (a01 * a12 - a02 * a11)
    b12 = inv_det * (a02 * a01 - a00 * a12)
    b22 = inv_det * (a00 * a11 - a01 * a01)

    row0 = jnp.stack([b00, b01, b02], axis=-1)
    row1 = jnp.stack([b01, b11, b12], axis=-1)
    row2 = jnp.stack([b02, b12, b22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def solve_sym3x3(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = H^-1 b for symmetric (...,3,3), b (...,3)."""
    return jnp.einsum("...ij,...j->...i", sym3x3_inv(H), b)


def solve_sym6x6(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = H^-1 b for symmetric (...,6,6) via nested 3x3 Schur complement.

    Partition H = [[A, B], [B^T, D]]; Hsc = A - B D^-1 B^T;
    x_p = Hsc^-1 (b_p - B D^-1 b_l);  x_l = D^-1 (b_l - B^T x_p).
    """
    A = H[..., :3, :3]
    B = H[..., :3, 3:]
    D = H[..., 3:, 3:]
    bp = b[..., :3]
    bl = b[..., 3:]

    invD = sym3x3_inv(D)
    B_invD = jnp.einsum("...ij,...jk->...ik", B, invD)
    Hsc = A - jnp.einsum("...ik,...jk->...ij", B_invD, B)
    bsc = bp - jnp.einsum("...ij,...j->...i", B_invD, bl)

    xp = solve_sym3x3(Hsc, bsc)
    cl = bl - jnp.einsum("...ji,...j->...i", B, xp)
    xl = jnp.einsum("...ij,...j->...i", invD, cl)
    return jnp.concatenate([xp, xl], axis=-1)
