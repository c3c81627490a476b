"""Schur complement: reduce the (6P+3L) system to 6P, and back-substitute.

Counterpart of the reference kernels (reference: src/cuda_block_solver.cu:
933-953 computeBschureKernel, :955-977 initializeHschur/computeHschure,
:1029-1043 schurComplementPostKernel).  The per-landmark column walks with
atomic scatter become batched 6x3/3x3 einsums plus segment_sums over the
precomputed multiplication triplets (mul_i, mul_j, mul_k), and the sparse
block result is scattered once into a dense, MXU-tile-padded matrix that
feeds the dense blocked Cholesky — replacing the whole cuSOLVER CSR pipeline
(src/cuda_linear_solver.cpp) with zero symbolic cost.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cuba_tpu.ops import smallmat


class SchurConsts(NamedTuple):
    hpl_row: jnp.ndarray  # [n_hpl]
    hpl_col: jnp.ndarray  # [n_hpl]
    hsc_row: jnp.ndarray  # [n_hsc]
    hsc_col: jnp.ndarray  # [n_hsc]
    mul_i: jnp.ndarray  # [n_mul]
    mul_j: jnp.ndarray  # [n_mul]
    mul_k: jnp.ndarray  # [n_mul]


def prepare_factors(
    bp: jnp.ndarray,  # [P,6]
    Hll_d: jnp.ndarray,  # damped [L,3,3]
    bl: jnp.ndarray,  # [L,3]
    Hpl: jnp.ndarray,  # [n_hpl,6,3]
    sc: SchurConsts,
    num_p: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared Schur factors: (invHll [L,3,3], W = Hpl invHll [n_hpl,6,3],
    bsc = bp - W bl [P,6]).  Equivalent of computeBschureKernel (cu:933-953)."""
    invHll = smallmat.sym3x3_inv(Hll_d)
    W = jnp.einsum("kij,kjl->kil", Hpl, invHll[sc.hpl_col], precision="highest")
    Wbl = jnp.einsum("kij,kj->ki", W, bl[sc.hpl_col], precision="highest")
    bsc = bp - jax.ops.segment_sum(Wbl, sc.hpl_row, num_segments=num_p)
    return invHll, W, bsc


def assemble_dense(
    Hpp_d: jnp.ndarray,  # damped [P,6,6]
    W: jnp.ndarray,  # [n_hpl,6,3]
    Hpl: jnp.ndarray,  # [n_hpl,6,3]
    sc: SchurConsts,
    num_p: int,
    pad_blocks: int,
) -> jnp.ndarray:
    """Dense padded Schur matrix [6*PB, 6*PB], identity on padded diagonal.

    Hsc = Hpp_d - sum_t W[i] Hpl[j]^T scattered at pose pair (r,c) and its
    mirror — the segment_sum over mul-triplets replaces computeHschureKernel's
    atomic DEACCUM (cu:964-977).
    """
    dtype = Hpp_d.dtype
    n_hsc = sc.hsc_row.shape[0]
    # triplet gathers + products in 2-D row layout: the [T, 6, 6] einsum
    # form pads ~28x under the TPU (8, 128) HBM tiling (measured 15+ GB
    # at 3.8M triplets — an OOM; same fix as the multichip body,
    # parallel/sharding.py "2-D row layout").  Same 3-term sums, same
    # order, so fp64 parity is unchanged.
    WT = W.reshape(-1, 18).T  # [18, n_hpl], rows (i*3+k)
    GT = Hpl.reshape(-1, 18).T  # [18, n_hpl], rows (j*3+k)
    Wg = WT[:, sc.mul_i]  # [18, T]
    Gg = GT[:, sc.mul_j]
    prod36 = jnp.stack([
        sum(Wg[3 * a + k] * Gg[3 * b + k] for k in range(3))
        for a in range(6) for b in range(6)
    ])  # [36, T], row (a*6+b)
    blocks = jax.ops.segment_sum(
        prod36.T, sc.mul_k, num_segments=n_hsc
    ).reshape(n_hsc, 6, 6)

    D = jnp.zeros((pad_blocks, 6, pad_blocks, 6), dtype)
    diag = jnp.arange(num_p)
    D = D.at[diag, :, diag, :].add(Hpp_d)
    D = D.at[sc.hsc_row, :, sc.hsc_col, :].add(-blocks)
    offdiag = (sc.hsc_row != sc.hsc_col)[:, None, None]
    mirrored = jnp.where(offdiag, -jnp.swapaxes(blocks, -1, -2), jnp.zeros_like(blocks))
    D = D.at[sc.hsc_col, :, sc.hsc_row, :].add(mirrored)

    n = 6 * pad_blocks
    Dm = D.reshape(n, n)
    pad_diag = jnp.concatenate([jnp.zeros(6 * num_p, dtype), jnp.ones(n - 6 * num_p, dtype)])
    return Dm + jnp.diag(pad_diag)


def back_substitute(
    invHll: jnp.ndarray,  # [L,3,3]
    bl: jnp.ndarray,  # [L,3]
    Hpl: jnp.ndarray,  # [n_hpl,6,3]
    xp: jnp.ndarray,  # [P,6]
    sc: SchurConsts,
    num_l: int,
) -> jnp.ndarray:
    """xl = Hll^-1 (bl - Hpl^T xp), per landmark (cu:1029-1043)."""
    contrib = jnp.einsum("kij,ki->kj", Hpl, xp[sc.hpl_row], precision="highest")  # Hpl^T xp per slot
    cl = bl - jax.ops.segment_sum(contrib, sc.hpl_col, num_segments=num_l)
    return jnp.einsum("kij,kj->ki", invHll, cl, precision="highest")
