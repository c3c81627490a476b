"""Optimizer configuration.

The reference hard-codes its LM hyper-parameters (maxq=10, tau=1e-5,
src/cuda_bundle_adjustment.cpp:795-796) and selects fp32/fp64 at compile time
(src/scalar.h:25-29).  Here they are documented runtime options.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


def default_dtype():
    """fp64 when x64 is enabled (parity mode), else fp32 (TPU fast path)."""
    import jax

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Configuration for :class:`cuba_tpu.BundleAdjustment`.

    Attributes:
      dtype: compute dtype for the numeric path.  ``None`` → fp64 if JAX x64
        is enabled, else fp32 (the USE_FLOAT32 analogue, scalar.h:25-29).
      chi_dtype: accumulation dtype for chi² reductions.  Defaults to fp64
        when JAX x64 is enabled; without x64 the reductions run in fp32
        through a two-float compensated tree (ops/dsum.py) whose internal
        accuracy is fp64-grade, so per-iteration chi² stays parity-grade on
        the default config either way.
      max_inner_iterations: LM trust-region retries per outer iteration
        (``maxq`` in cuda_bundle_adjustment.cpp:795).
      tau: initial damping factor, lambda0 = tau * max(diag H)
        (cuda_bundle_adjustment.cpp:796,813-814).
      scale_eps: epsilon added to the gain-ratio denominator
        (cuda_bundle_adjustment.cpp:829).
      attenuation_min/max: clamp bounds for the accepted-step damping
        attenuation 1-(2*rho-1)^3 (cuda_bundle_adjustment.cpp:834,890-891).
      solver: reduced-system solver.  "auto" (default) exploits problem
        structure the way the reference's sparse Cholesky + ordering does
        implicitly (cuda_linear_solver.cpp:342-348): band-certified pose
        graphs use "band_cr"; banded-plus-loop-closure patterns use
        "band_lr"; everything else "dense_cholesky" up to the dense
        compile ceiling, then "pcg".  Explicit choices: "dense_cholesky"
        (padded dense blocked Cholesky on the MXU), "band_cr"
        (block-tridiagonal cyclic reduction; raises if the Schur pattern
        is not banded), "band_lr" (cyclic reduction + Woodbury correction
        for out-of-band loop-closure blocks; raises if the in-band part
        does not certify or the loop-column set exceeds 64 pose blocks),
        "pcg" (block-Jacobi preconditioned conjugate gradient, for very
        large pose counts).
      refinement_steps: iterative-refinement sweeps after the Cholesky solve
        when running the fp32 fast path (residual accumulated in fp64).
      pcg_max_iterations / pcg_tol: PCG stopping controls.
      pose_block_pad: pad the dense reduced system to a multiple of this
        (128 aligns with the MXU lane count).
      phase_attribution: populate the reference's 8-phase TimeProfile from
        normal (fused) ``optimize()`` runs.  The fused device loop cannot be
        timed per phase from the host, so the first ``time_profile()`` call
        runs a one-time per-phase calibration (cached per compiled problem
        spec) and distributes each fused run's measured wall time across
        phases by the calibrated ratios.  Exact per-phase host timing is
        still available via ``optimize(n, profile=True)``.
      mesh: a ``jax.sharding.Mesh`` with a ``"landmarks"`` axis to run the
        optimizer multi-chip (landmark-sharded assembly, sparse Hsc-block
        all-reduce over ICI — cuba_tpu/parallel/sharding.py).  ``None``
        (default) runs single-chip.  This is a TPU-native scaling extension;
        the reference is strictly single-GPU (SURVEY.md §2).
    """

    dtype: Optional[jnp.dtype] = None
    chi_dtype: jnp.dtype = jnp.float64
    mxu: str = "auto"  # MXU Pallas fast path: "auto" | "on" | "off" | "interpret"
    max_inner_iterations: int = 10
    tau: float = 1e-5
    scale_eps: float = 1e-3
    attenuation_min: float = 1.0 / 3.0
    attenuation_max: float = 2.0 / 3.0
    solver: str = "auto"
    refinement_steps: int = 1
    numerical_escalation: float = 8.0  # lambda factor on factorization failure
    pcg_max_iterations: int = 250
    pcg_tol: float = 1e-10
    pose_block_pad: int = 128
    phase_attribution: bool = True
    mesh: Optional[object] = None  # jax.sharding.Mesh with a "landmarks" axis

    def resolve_dtype(self):
        return jnp.dtype(self.dtype) if self.dtype is not None else jnp.dtype(default_dtype())

    def resolve_chi_dtype(self):
        import jax

        d = jnp.dtype(self.chi_dtype)
        if d == jnp.float64 and not jax.config.jax_enable_x64:
            # x64 disabled: fp64 would silently downcast.  fp32 chi sums go
            # through the two-float tree (ops/dsum.py) — fp64-grade accuracy
            # with an fp32 carrier, so this is not a precision downgrade.
            return jnp.dtype(jnp.float32)
        return d
