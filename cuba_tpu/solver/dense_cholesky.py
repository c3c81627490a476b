"""Reduced pose-system solver: padded dense blocked Cholesky (+ refinement).

This deliberately replaces the reference's sparse CSR Cholesky pipeline
(reference: src/cuda_linear_solver.cpp:147-232 cuSOLVER csrchol*, METIS
ordering :342-348, permutation twists :278-335).  Rationale (SURVEY.md §6):
~74% of the reference GPU runtime is the sparse factorization; on TPU a
dense factorization of the 6P x 6P Schur complement is pure MXU work with
*zero* symbolic cost and beats the sparse path for the pose counts this
library targets (P up to ~20k).  For larger systems use the PCG solver.

Failure semantics match the reference: a non-finite solve (indefinite
system / zero pivot, cuda_linear_solver.cpp:175-189) reports ok=False and
the LM driver treats the step as rejected (rho = -1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cuba_tpu.solver import trisolve


def cholesky_solve(
    A: jnp.ndarray,
    b: jnp.ndarray,
    refinement_steps: int = 0,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve A x = b for SPD A.  Returns (x, ok).

    The system is Jacobi-equilibrated first (A' = S A S, S = diag(A)^-1/2):
    BA Schur complements have ~1e10 dynamic range across pose blocks and
    fp32 assembly noise makes the raw matrix numerically indefinite at small
    damping — equilibration collapses the condition number so the fp32
    factorization succeeds where the reference would reject the step
    (zero-pivot semantics, cuda_linear_solver.cpp:175-189).

    With refinement_steps > 0, performs fixed-point iterative refinement
    (residual recomputed against A) — the load-bearing piece of the fp32
    fast path (USE_FLOAT32 analogue, reference README.md:85-86 reports no
    fp32 speedup on GPU; on TPU fp32+refinement is the fast path).
    """
    d = jnp.diagonal(A)
    s = jax.lax.rsqrt(jnp.maximum(d, jnp.asarray(1e-30, A.dtype)))
    As = A * s[:, None] * s[None, :]

    # Diagonal-boost retry: fp32 Schur assembly noise makes the equilibrated
    # matrix marginally indefinite at moderate LM damping (a hard "lambda
    # cliff" ~2-60x above the current lambda at kitti00 scale, measured).
    # When the factorization goes non-finite, refactor with a small shift
    # delta*I (equilibrated diagonal is 1, so delta is relative).  Iterative
    # refinement below recomputes residuals against the ORIGINAL A, so the
    # shifted factor still converges to the unshifted solution when the true
    # matrix is PD — and when it is not, the LM gain-ratio check rejects the
    # step exactly as the reference's zero-pivot path does
    # (cuda_linear_solver.cpp:175-189), but without a ~100x lambda overshoot
    # that stalls the trajectory for several iterations.
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and trisolve.usable(A.shape[0], A.dtype)
        )
    if A.dtype == jnp.float32:
        n = A.shape[0]

        def boost_cond(c):
            delta, L, tries = c
            return ~jnp.isfinite(jnp.sum(L[-1])) & (tries < 4)

        def boost_body(c):
            delta, L, tries = c
            delta = jnp.where(delta == 0, jnp.float32(1e-5), delta * 32.0)
            L2 = jnp.linalg.cholesky(As + delta * jnp.eye(n, dtype=As.dtype))
            return delta, L2, tries + 1

        L0 = jnp.linalg.cholesky(As)
        _, L, _ = jax.lax.while_loop(
            boost_cond, boost_body, (jnp.float32(0.0), L0, jnp.int32(0))
        )
    else:
        L = jnp.linalg.cholesky(As)

    if use_pallas:
        # XLA's width-1 TriangularSolve unrolls into ~n/128 sequential
        # single-lane panel ops (docs/PERF_NOTES.md); the Pallas blocked
        # substitution is one kernel launch per sweep.
        invd = trisolve.prepare(L, interpret=interpret)

        def solve_with(rhs):
            y = trisolve.solve_lower(L, invd, rhs * s, interpret=interpret)
            return s * trisolve.solve_upper(L, invd, y, interpret=interpret)

        mv = lambda v: trisolve.matvec(A, v, interpret=interpret)
    else:

        def solve_with(rhs):
            y = jax.scipy.linalg.solve_triangular(L, rhs * s, lower=True)
            return s * jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        mv = lambda v: A @ v

    x = solve_with(b)
    for _ in range(refinement_steps):
        r = b - mv(x)
        x2 = x + solve_with(r)
        # Refinement diverges (overflows to inf) when assembly noise makes
        # the system numerically indefinite while the factorization itself
        # stays finite — measured at kitti00 scale near the fp32 "lambda
        # cliff".  Keep the last finite iterate: the LM gain-ratio check
        # rejects a poor step at nu-doubling cost instead of this solve
        # reporting ok=False and triggering the much larger numerical
        # escalation (which overshoots lambda and stalls the trajectory).
        finite = jnp.isfinite(jnp.sum(x2))
        x = jnp.where(finite, x2, x)

    ok = jnp.all(jnp.isfinite(x))
    x = jnp.where(ok, x, jnp.zeros_like(x))
    return x, ok
