"""Pallas blocked triangular solves for the reduced camera system.

Why this exists: XLA's TriangularSolve with a width-1 RHS unrolls into
~n/128 sequential ``f32[n,1]`` panel ops (measured in the compiled HLO —
66 panels and ~44k scalar-ish ops at kitti00 scale, docs/PERF_NOTES.md).
Each panel uses 1 of 128 lanes and the per-op scheduling overhead leaks
into neighbouring stages of the fused LM loop.  The reference hits the
same problem class on GPU and solves it with cuSOLVER's blocked sparse
kernels (reference: src/cuda_linear_solver.cpp:147-232); the TPU-native
answer is a *dense* blocked substitution written as MXU matmuls:

* the diagonal blocks of L are inverted once per factorization by a
  batched block-recursive triangular inversion (`tri_inv_blocks`) —
  log2 levels of batched matmuls, no sequential scalar substitution
  at the XLA level except one 16-wide unrolled base case;
* each solve is then a single Pallas kernel: grid over K = n/B column
  (forward) or row (backward) stripes of L, with the running residual
  resident in a VMEM scratch.  Step k is two MXU matmuls:
  ``seg = invd[k] @ r[k]`` and ``r -= stripe @ seg``.

Everything is one kernel launch per solve instead of tens of thousands
of ops, so the LM while_loop's scheduler sees 6 custom calls per damped
trial instead of ~44k HLO ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256  # panel width; n (= 6 * pad_blocks) is always a multiple of 768


def _unrolled_tri_inv16(Ld: jnp.ndarray) -> jnp.ndarray:
    """Inverse of batched lower-triangular [*, m<=16, m] by substitution."""
    m = Ld.shape[-1]
    rows = []
    for i in range(m):
        e = jnp.zeros(Ld.shape[:-2] + (m,), Ld.dtype).at[..., i].set(1.0)
        acc = e
        for j in range(i):
            acc = acc - Ld[..., i, j, None] * rows[j]
        rows.append(acc / Ld[..., i, i, None])
    return jnp.stack(rows, axis=-2)


def tri_inv_blocks(Ld: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of lower-triangular blocks [batch, m, m].

    Block-recursive: inv([[A,0],[B,C]]) = [[iA,0],[-iC B iA, iC]].  Both
    diagonal halves are folded into the batch dimension so every level is
    ONE recursive call + one batched matmul pair — 4 levels at m=256.
    """
    m = Ld.shape[-1]
    if m <= 16:
        return _unrolled_tri_inv16(Ld)
    h = m // 2
    d = jnp.stack([Ld[:, :h, :h], Ld[:, h:, h:]], axis=1).reshape(-1, h, h)
    idm = tri_inv_blocks(d).reshape(-1, 2, h, h)
    iA, iC = idm[:, 0], idm[:, 1]
    off = -jnp.einsum(
        "bij,bjk,bkl->bil", iC, Ld[:, h:, :h], iA,
        precision=jax.lax.Precision.HIGHEST,
    )
    top = jnp.concatenate([iA, jnp.zeros_like(off)], axis=2)
    bot = jnp.concatenate([off, iC], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _extract_diag_blocks(L: jnp.ndarray, B: int, interpret: bool) -> jnp.ndarray:
    """[K, B, B] diagonal blocks of L — a pure-DMA Pallas pass (an XLA
    advanced-index gather here runs at ~5-10 GB/s, docs/PERF_NOTES.md)."""
    n = L.shape[0]
    K = n // B

    def kern(L_ref, out_ref):
        out_ref[0] = L_ref[:]

    return pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[pl.BlockSpec((B, B), lambda k: (k, k), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B, B), lambda k: (k, k * 0, k * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B, B), L.dtype),
        interpret=interpret,
    )(L)


def prepare(L: jnp.ndarray, *, block: int = BLOCK, interpret: bool = False):
    """Inverted diagonal blocks [K, B, B] for solve_lower/solve_upper."""
    Ld = _extract_diag_blocks(L, block, interpret)
    return tri_inv_blocks(Ld)


# Precision split: the refinement MATVEC must be fp32-exact (HIGHEST, 6
# MXU passes) — a bf16 residual caps the whole solve at ~1e-3.  The solve
# SWEEPS tolerate default precision (bf16 passes): their error is exactly
# what iterative refinement corrects, and 1 MXU pass instead of 6 makes
# each sweep DMA-bound.  The diagonal-block products stay HIGHEST (tiny,
# and substitution error compounds through the panel chain).
_MM = dict(
    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
)
_MM_SWEEP = dict(preferred_element_type=jnp.float32)


def _params(n: int, B: int):
    """Stripe kernels need ~2*n*B*4 bytes of VMEM (double-buffered stripe),
    above the 16MB scoped default at kitti00 scale — raise the limit."""
    # [n,1] vectors are lane-padded to 128 in VMEM: n*128*4 bytes each
    need = 2 * n * B * 4 + 3 * n * 128 * 4 + 4 * B * B * 4 + (4 << 20)
    return pltpu.CompilerParams(vmem_limit_bytes=min(max(need, 1 << 24), 110 << 20))


def solve_lower(L, invd, b, *, block: int = BLOCK, interpret: bool = False):
    """y = L^-1 b for lower-triangular L [n, n], b [n].  Right-looking:
    step k reads column stripe L[:, kB:(k+1)B] and the VMEM-resident
    accumulated update d, emits y[k] = invd[k] (b[k] + d[k]), folds
    -stripe @ y[k] into d.  Rows above the diagonal block are zero in L,
    so the full-stripe matmul only touches live residual rows."""
    n = L.shape[0]
    B = block
    K = n // B

    def kern(Lc_ref, invd_ref, bk_ref, yk_ref, d_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            d_ref[:] = jnp.zeros_like(d_ref)

        rk = bk_ref[:] + d_ref[pl.ds(k * B, B), :]  # [B, 1]
        seg = jax.lax.dot_general(invd_ref[0], rk, (((1,), (0,)), ((), ())), **_MM)
        yk_ref[:] = seg
        d_ref[:] -= jax.lax.dot_general(Lc_ref[:], seg, (((1,), (0,)), ((), ())), **_MM_SWEEP)

    y = pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((n, B), lambda k: (k * 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, B), lambda k: (k, k * 0, k * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda k: (k, k * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda k: (k, k * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, 1), jnp.float32)],
        compiler_params=_params(n, B),
        interpret=interpret,
    )(L, invd, b.reshape(n, 1))
    return y.reshape(n)


def solve_upper(L, invd, y, *, block: int = BLOCK, interpret: bool = False):
    """x = L^-T y (backward substitution on the transpose, reading ROW
    stripes of L so no materialized transpose is needed; the transposed
    products are expressed through dot_general contraction dims)."""
    n = L.shape[0]
    B = block
    K = n // B

    def kern(Lr_ref, invd_ref, yk_ref, xk_ref, d_ref):
        g = pl.program_id(0)
        k = K - 1 - g

        @pl.when(g == 0)
        def _():
            d_ref[:] = jnp.zeros_like(d_ref)

        rk = yk_ref[:] + d_ref[pl.ds(k * B, B), :]  # [B, 1]
        # seg = invd[k]^T @ rk
        seg = jax.lax.dot_general(invd_ref[0], rk, (((0,), (0,)), ((), ())), **_MM)
        xk_ref[:] = seg
        # d -= L[kB:(k+1)B, :]^T @ seg
        d_ref[:] -= jax.lax.dot_general(Lr_ref[:], seg, (((0,), (0,)), ((), ())), **_MM_SWEEP)

    rev = lambda g: K - 1 - g
    x = pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((B, n), lambda g: (rev(g), g * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, B), lambda g: (rev(g), g * 0, g * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda g: (rev(g), g * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda g: (rev(g), g * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, 1), jnp.float32)],
        compiler_params=_params(n, B),
        interpret=interpret,
    )(L, invd, y.reshape(n, 1))
    return x.reshape(n)


def matvec(A, x, *, block: int = BLOCK, interpret: bool = False):
    """A @ x over row stripes with x resident — the iterative-refinement
    residual's matvec, kept in Pallas so the refinement loop stays at a
    handful of custom calls."""
    n = A.shape[0]
    B = block
    K = n // B

    def kern(Ar_ref, x_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            Ar_ref[:], x_ref[:], (((1,), (0,)), ((), ())), **_MM
        )

    y = pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((B, n), lambda k: (k, k * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda k: (k * 0, k * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda k: (k, k * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        compiler_params=_params(n, B),
        interpret=interpret,
    )(A, x.reshape(n, 1))
    return y.reshape(n)


def usable(n: int, dtype, *, block: int = BLOCK) -> bool:
    """Pallas path gate: fp32, stripe divides, stripes fit VMEM (double-
    buffered column stripe = 2 * n * B * 4 bytes; cap well under 128MB)."""
    return (
        dtype == jnp.float32
        and n % block == 0
        and n >= 2 * block
        and 2 * n * block * 4 <= 96 * 1024 * 1024
    )
