"""Robust kernels (None / Huber / Tukey), branchless jnp.where forms.

Matches the reference functors (reference: src/cuda_block_solver.cu:666-727)
operating on the *squared, information-weighted* residual x = omega * |e|^2:

  Huber:  rho(x)  = x <= d^2 ? x : 2 d sqrt(x) - d^2
          rho'(x) = x <= d^2 ? 1 : d / sqrt(x)
  Tukey:  rho(x)  = x <= d^2 ? (d^2/3)(1 - (1 - x/d^2)^3) : d^2/3
          rho'(x) = x <= d^2 ? (1 - x/d^2)^2 : 0

One kernel per edge *type* (mono/stereo), selected statically at trace time
(the reference dispatches through a 6-entry function table, cu:1222-1230).
"""

from __future__ import annotations

import jax.numpy as jnp

NONE = 0
HUBER = 1
TUKEY = 2


def robustify(x: jnp.ndarray, kernel_type: int, delta: float) -> jnp.ndarray:
    """rho(x); kernel_type and delta are static (trace-time) values."""
    if kernel_type == NONE:
        return x
    d2 = delta * delta
    if kernel_type == HUBER:
        # guard sqrt argument so the unselected branch stays finite
        safe = jnp.maximum(x, d2)
        return jnp.where(x <= d2, x, 2.0 * jnp.sqrt(safe) * delta - d2)
    if kernel_type == TUKEY:
        maxv = d2 / 3.0
        return jnp.where(x <= d2, maxv * (1.0 - (1.0 - x / d2) ** 3), maxv)
    raise ValueError(f"unknown robust kernel type {kernel_type}")


def weight(x: jnp.ndarray, kernel_type: int, delta: float) -> jnp.ndarray:
    """rho'(x) — the multiplicative IRLS weight applied to omega."""
    if kernel_type == NONE:
        return jnp.ones_like(x)
    d2 = delta * delta
    if kernel_type == HUBER:
        safe = jnp.maximum(x, d2)
        return jnp.where(x <= d2, jnp.ones_like(x), delta / jnp.sqrt(safe))
    if kernel_type == TUKEY:
        return jnp.where(x <= d2, (1.0 - x / d2) ** 2, jnp.zeros_like(x))
    raise ValueError(f"unknown robust kernel type {kernel_type}")
