"""fp64-grade summation in fp32: branch-free two-float (double-single) tree.

Why: the reference accumulates chi2 in ``Scalar`` (fp64 by default,
reference: src/cuda_block_solver.cu:771-785 shared-memory tree +
atomicAdd); its per-iteration chi2 matches g2o to 1e-6 relative.  On TPU
the fast path is fp32 and enabling global x64 to get an fp64 accumulator
penalizes every other op.  A naive fp32 ``jnp.sum`` over ~560k robustified
edge terms carries an O(depth * eps) rounding error that can exceed the
1e-6 parity bar; this module provides an fp32-in/fp32-out reduction whose
internal accuracy is that of a float-float (~2^-48) accumulator, so the
result is the correctly-rounded-to-fp32 sum for any realistic edge count.

Algorithm: pairwise tree reduction where every level uses Knuth's TwoSum
error-free transformation (branch-free, vectorizes on the VPU) and the
rounding errors are carried in a parallel compensation array.  Total work
is ~4 passes over the data — bandwidth-trivial next to the residual pass
that produces the inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def _two_sum(a: jnp.ndarray, b: jnp.ndarray):
    """Error-free transformation: a + b = s + e exactly (Knuth TwoSum)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def accurate_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of ``x`` with float-float internal accuracy, returned in x.dtype.

    Deterministic (fixed tree shape), branch-free, fully vectorized.  For
    fp64 inputs this still tightens the result (eps^2 accumulator) but the
    intended use is the fp32 fast path's chi2 accumulation.
    """
    x = x.ravel()
    n = int(x.shape[0])
    if n == 0:
        return jnp.zeros((), x.dtype)
    # pad to a power of two so every level is an exact halving
    N = 1
    while N < n:
        N *= 2
    s = jnp.pad(x, (0, N - n))
    c = None  # compensation terms; allocated lazily at the first level
    while s.shape[0] > 1:
        h = s.shape[0] // 2
        s, e = _two_sum(s[:h], s[h:])
        c = e if c is None else c[:h] + c[h:] + e
    total = s[0] if c is None else s[0] + c[0]
    return total
