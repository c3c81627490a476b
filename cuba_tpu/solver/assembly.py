"""System assembly: residuals/chi2 and the block quadratic form.

TPU-native counterpart of the reference's per-edge CUDA kernels
(reference: src/cuda_block_solver.cu:732-786 computeActiveErrorsKernel,
:788-839 constructQuadraticFormKernel, :841-875 computeChiSquaresKernel,
:877-904 maxDiagonalKernel).  The CUDA design scatters with atomicAdd; here
every reduction is a deterministic ``segment_sum`` over precomputed index
arrays, and the fixed-vertex gating (EDGE_FLAG_FIXED_P/L) falls out of the
index layout: fixed vertices have internal indices >= num_p / num_l, so their
contributions are routed to a clamp row that is sliced off.

Everything is batched over edges; XLA fuses the projection, Jacobian and
weighting math into a handful of elementwise kernels feeding the reductions.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cuba_tpu.ops import dsum, jacobians, projection, robust


class EdgeConsts(NamedTuple):
    """Static per-edge device arrays for one measurement dimension."""

    meas: jnp.ndarray  # [E, mdim]
    omega: jnp.ndarray  # [E]
    pose_idx: jnp.ndarray  # [E] int32
    lm_idx: jnp.ndarray  # [E] int32
    edge2hpl: jnp.ndarray  # [E] int32 (n_hpl == "no slot")


def edge_residuals(
    qs: jnp.ndarray,
    ts: jnp.ndarray,
    cams: jnp.ndarray,
    Xws: jnp.ndarray,
    ec: EdgeConsts,
    mdim: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge residual e = proj - meas and camera-frame point Xc."""
    q = qs[ec.pose_idx]
    t = ts[ec.pose_idx]
    cam = cams[ec.pose_idx]
    Xw = Xws[ec.lm_idx]
    Xc = projection.world_to_camera(q, t, Xw)
    err = projection.project(Xc, cam, mdim) - ec.meas
    return err, Xc


def chi_sum(err: jnp.ndarray, omega: jnp.ndarray, kernel: Tuple[int, float], chi_dtype) -> jnp.ndarray:
    """sum_e rho(omega |e|^2), accumulated in chi_dtype (cu:771-785).

    When chi_dtype is fp32 (default config without global x64) the
    reduction runs through the two-float tree (ops/dsum.py) so the result
    stays fp64-grade — the reference's fp64 chi semantics without x64."""
    x = omega * jnp.sum(err * err, axis=-1)
    rho = robust.robustify(x, kernel[0], kernel[1])
    if jnp.dtype(chi_dtype) == jnp.float32:
        return dsum.accurate_sum(rho.astype(jnp.float32))
    return jnp.sum(rho.astype(chi_dtype))


def chi_squares(err: jnp.ndarray, omega: jnp.ndarray) -> jnp.ndarray:
    """Per-edge *unrobustified* chi2 for the public chiSquared query (cu:841-875)."""
    return omega * jnp.sum(err * err, axis=-1)


def quadratic_form_terms(
    qs: jnp.ndarray,
    cams: jnp.ndarray,
    err: jnp.ndarray,
    Xc: jnp.ndarray,
    ec: EdgeConsts,
    mdim: int,
    kernel: Tuple[int, float],
):
    """Per-edge weighted Gauss-Newton blocks (cu:788-838 before the scatter).

    Returns (Hpp_e [E,6,6], bp_e [E,6], Hll_e [E,3,3], bl_e [E,3], Hpl_e [E,6,3]).
    """
    q = qs[ec.pose_idx]
    cam = cams[ec.pose_idx]
    x = ec.omega * jnp.sum(err * err, axis=-1)
    w = ec.omega * robust.weight(x, kernel[0], kernel[1])  # omega-tilde (cu:809-811)

    JP, JL = jacobians.compute(Xc, q, cam, mdim)
    wJP = w[:, None, None] * JP
    Hpp_e = jnp.einsum("eki,ekj->eij", wJP, JP, precision="highest")
    bp_e = jnp.einsum("eki,ek->ei", wJP, err, precision="highest")
    wJL = w[:, None, None] * JL
    Hll_e = jnp.einsum("eki,ekj->eij", wJL, JL, precision="highest")
    bl_e = jnp.einsum("eki,ek->ei", wJL, err, precision="highest")
    Hpl_e = jnp.einsum("eki,ekj->eij", wJP, JL, precision="highest")
    return Hpp_e, bp_e, Hll_e, bl_e, Hpl_e


def _seg(data: jnp.ndarray, ids: jnp.ndarray, num: int, clamp: int) -> jnp.ndarray:
    """segment_sum with one extra clamp row for inactive contributions."""
    ids = jnp.minimum(ids, clamp)
    return jax.ops.segment_sum(data, ids, num_segments=num + 1)[:num]


def build_system(
    qs: jnp.ndarray,
    cams: jnp.ndarray,
    num_p: int,
    num_l: int,
    n_hpl: int,
    mono: EdgeConsts,
    stereo: EdgeConsts,
    err2: jnp.ndarray,
    Xc2: jnp.ndarray,
    err3: jnp.ndarray,
    Xc3: jnp.ndarray,
    kernels: Tuple[Tuple[int, float], Tuple[int, float]],
):
    """Assemble Hpp [P,6,6], bp [P,6], Hll [L,3,3], bl [L,3], Hpl [n_hpl,6,3].

    Equivalent of the reference buildSystem (cpp:384-410): zero + two
    atomic-scatter kernel launches become two batched term computations and
    five segment_sums.  Contributions from edges whose pose (landmark) is
    fixed carry pose_idx >= num_p (lm_idx >= num_l) and are dropped by the
    clamp row, reproducing the EDGE_FLAG_FIXED_P/L gating (cu:818-833).
    """
    dtype = qs.dtype
    zero6 = jnp.zeros((num_p, 6, 6), dtype), jnp.zeros((num_p, 6), dtype)
    zero3 = jnp.zeros((num_l, 3, 3), dtype), jnp.zeros((num_l, 3), dtype)
    Hpp, bp = zero6
    Hll, bl = zero3
    Hpl = jnp.zeros((n_hpl, 6, 3), dtype)

    for ec, err, Xc, mdim, kern in (
        (mono, err2, Xc2, 2, kernels[0]),
        (stereo, err3, Xc3, 3, kernels[1]),
    ):
        if ec.meas.shape[0] == 0:
            continue
        Hpp_e, bp_e, Hll_e, bl_e, Hpl_e = quadratic_form_terms(
            qs, cams, err, Xc, ec, mdim, kern
        )
        if num_p:
            Hpp = Hpp + _seg(Hpp_e, ec.pose_idx, num_p, num_p)
            bp = bp + _seg(bp_e, ec.pose_idx, num_p, num_p)
        if num_l:
            Hll = Hll + _seg(Hll_e, ec.lm_idx, num_l, num_l)
            bl = bl + _seg(bl_e, ec.lm_idx, num_l, num_l)
        if n_hpl:
            Hpl = Hpl + _seg(Hpl_e, ec.edge2hpl, n_hpl, n_hpl)

    return Hpp, bp, Hll, bl, Hpl


def max_diagonal(Hpp: jnp.ndarray, Hll: jnp.ndarray) -> jnp.ndarray:
    """max over all active block-diagonal entries, floored at 0 (cu:877-904)."""
    parts = []
    if Hpp.shape[0]:
        parts.append(jnp.max(jnp.diagonal(Hpp, axis1=-2, axis2=-1)))
    if Hll.shape[0]:
        parts.append(jnp.max(jnp.diagonal(Hll, axis1=-2, axis2=-1)))
    if not parts:
        return jnp.zeros((), Hpp.dtype)
    m = parts[0] if len(parts) == 1 else jnp.maximum(parts[0], parts[1])
    return jnp.maximum(m, jnp.zeros((), m.dtype))


def damp(H: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """H + lambda*I on each diagonal block (addLambdaKernel, cu:906-918).

    Functional: no backup/restore needed, the undamped H is kept.
    """
    d = H.shape[-1]
    return H + lam * jnp.eye(d, dtype=H.dtype)
