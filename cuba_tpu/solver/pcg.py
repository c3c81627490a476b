"""Block-Jacobi preconditioned conjugate gradient on the Schur complement.

The scalable alternative to the dense Cholesky path (BASELINE.json config 4:
BAL/Venice-scale problems where 6P is too large to factor densely).  The
Schur complement is never materialized: each matvec streams through the
factored form

    Hsc x = Hpp_d x - W (Hpl^T x)

with two gathers + two segment_sums over the Hpl slots — O(n_hpl) work and
memory, no multiplication triplets, no dense matrix.  The preconditioner is
the exact block diagonal of Hsc (6x6 blocks), inverted in closed form.

The reference has no iterative solver at all; its failure semantics
(zero-pivot -> step rejected) map here to non-convergence -> ok=False.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cuba_tpu.ops import smallmat


class SchurOperator(NamedTuple):
    """Matrix-free Schur complement operator."""

    Hpp_d: jnp.ndarray  # damped [P,6,6]
    Hpl: jnp.ndarray  # [n_hpl,6,3]
    W: jnp.ndarray  # Hpl @ invHll per slot [n_hpl,6,3]
    hpl_row: jnp.ndarray
    hpl_col: jnp.ndarray
    num_p: int
    num_l: int

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [P,6] -> Hsc x [P,6]."""
        a = jax.ops.segment_sum(
            jnp.einsum("kij,ki->kj", self.Hpl, x[self.hpl_row], precision="highest"),
            self.hpl_col,
            num_segments=self.num_l,
        )  # Hpl^T x, per landmark column [L,3]
        y2 = jax.ops.segment_sum(
            jnp.einsum("kij,kj->ki", self.W, a[self.hpl_col], precision="highest"),
            self.hpl_row,
            num_segments=self.num_p,
        )
        return jnp.einsum("pij,pj->pi", self.Hpp_d, x, precision="highest") - y2

    def block_diagonal(self) -> jnp.ndarray:
        """Exact 6x6 block diagonal of Hsc (for the preconditioner)."""
        contrib = jnp.einsum("kil,kjl->kij", self.W, self.Hpl)  # W H^T per slot
        diag_correction = jax.ops.segment_sum(contrib, self.hpl_row, num_segments=self.num_p)
        return self.Hpp_d - diag_correction


def pcg_solve(
    op: SchurOperator,
    b: jnp.ndarray,
    max_iterations: int,
    tol: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve Hsc x = b.  Returns (x [P,6], ok).

    Standard PCG with the block-Jacobi preconditioner; runs entirely inside
    jit (lax.while_loop), converged = ||r|| <= tol * ||b||.
    """
    dtype = b.dtype
    Minv = jnp.linalg.inv(op.block_diagonal())  # [P,6,6]

    def apply_M(r):
        return jnp.einsum("pij,pj->pi", Minv, r, precision="highest")

    def dot(a, c):
        return jnp.sum(a * c)

    b_norm2 = dot(b, b)
    tol2 = (tol * tol) * b_norm2

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_M(r0)
    p0 = z0
    rz0 = dot(r0, z0)

    def cond(state):
        k, _, r, _, _, _ = state
        return (k < max_iterations) & (dot(r, r) > tol2)

    def body(state):
        k, x, r, p, rz, _ = state
        Ap = op.matvec(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, jnp.ones_like(pAp), pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, jnp.ones_like(rz), rz)
        p = z + beta * p
        return (k + 1, x, r, p, rz_new, pAp)

    k, x, r, p, rz, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, p0, rz0, jnp.zeros((), dtype))
    )
    converged = dot(r, r) <= tol2
    ok = converged & jnp.all(jnp.isfinite(x))
    x = jnp.where(ok, x, jnp.zeros_like(x))
    return x, ok
