"""Persistent Pallas blocked Cholesky for the reduced camera system.

XLA's `jnp.linalg.cholesky` at kitti00 scale (n≈8k) runs at ~13ms — ~4x off
the MXU roofline — because its inner factorization unrolls into thousands of
sequential single-column ops and its trailing updates run at HIGHEST
precision (6 MXU passes).  This kernel replaces it with ONE pallas_call:

* grid over K = n/B column stripes (B = 384), matrix factored IN PLACE
  (input_output_aliases) with explicit HBM<->VMEM DMA per stripe;
* left-looking stream updates `C -= L_j (L_j rows_k)^T` in a 3-term bf16
  split (a1b1 + a1b2 + a2b1, error ~2^-16 — iterative refinement in
  dense_cholesky.cholesky_solve absorbs it; reference analogue: the fp32
  USE_FLOAT32 path, README.md:85-86);
* the B x B diagonal block factored in-kernel by a recursive half-split
  scheme that yields BOTH the Cholesky factor and its inverse with ~5 small
  matmuls per node (leaf 8x8 by unrolled substitution) — no scalar column
  loop ever touches the full block;
* the stripe panel applied as one [n, B] @ inv(L_kk)^T MXU matmul.

The inverted diagonal blocks are emitted as a second output [K, B, B] and
feed solver/trisolve.py's blocked substitution directly, so the downstream
`trisolve.prepare` pass disappears.

Zero-pivot semantics match the reference's cuSOLVER path (reference:
src/cuda_linear_solver.cpp:175-189): a non-positive pivot produces NaN
(sqrt of a negative), the NaN propagates to the factor, and the caller's
finite-ness check reports ok=False so the LM loop rejects the step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 384  # stripe width: 3 lanes of 128; n = 6 * pad_blocks is always a multiple

_HI = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def _trunc_bf16(x):
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)


def _dot_nt(a, b, fast: bool):
    """a @ b^T for the stream updates.

    fast=False: Precision.HIGHEST (6 MXU passes, fp32-grade — default; the
    factor error must stay << 1/cond for iterative refinement to converge).
    fast=True: 2-term bf16 operand splits, 3 passes, error ~sqrt(n)*2^-16 —
    only safe for mildly-conditioned systems."""
    dims = (((1,), (1,)), ((), ()))
    if not fast:
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    a1f = _trunc_bf16(a)
    b1f = _trunc_bf16(b)
    a1 = a1f.astype(jnp.bfloat16)
    b1 = b1f.astype(jnp.bfloat16)
    a2 = (a - a1f).astype(jnp.bfloat16)
    b2 = (b - b1f).astype(jnp.bfloat16)
    out = jax.lax.dot_general(a1, b1, dims, preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(a1, b2, dims, preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(a2, b1, dims, preferred_element_type=jnp.float32)
    return out


def _chol8(a):
    """8x8 lower Cholesky by unrolled substitution.  a: [8, 8] jnp array.

    No scatters (Mosaic has no scatter lowering): each output row is
    assembled with a stack of scalars."""
    m = 8
    zero = jnp.zeros((), a.dtype)
    rows = []
    diag = []
    for i in range(m):
        v = a[i, :]  # running row; v[j] becomes (a[i,j] - sum_t<j L[i,t]L[j,t])
        lij = []
        for j in range(i):
            l = v[j] / diag[j]
            lij.append(l)
            v = v - l * rows[j]
        d = jnp.sqrt(v[i])
        diag.append(d)
        rows.append(jnp.stack(lij + [d] + [zero] * (m - i - 1)))
    return jnp.stack(rows)


def _inv8(L):
    """Inverse of an 8x8 lower-triangular matrix by unrolled substitution."""
    m = 8
    rows = []
    for i in range(m):
        e = (jax.lax.iota(jnp.int32, m) == i).astype(L.dtype)
        acc = e
        for j in range(i):
            acc = acc - L[i, j] * rows[j]
        rows.append(acc / L[i, i])
    return jnp.stack(rows)


def _chol_inv(a, m):
    """Recursive half-split Cholesky + inverse of an SPD [m, m] block.

    Returns (L, X) with L L^T = a and X = L^-1.  All internal products are
    HIGHEST precision; node count is ~m/8 so the whole B=384 block is a few
    hundred small MXU ops with no scalar column sweep."""
    if m <= 8:
        L = _chol8(a)
        return L, _inv8(L)
    # split at the largest power-of-two multiple of 8 below m (keeps every
    # leaf exactly 8 wide for any m divisible by 8)
    h = 8
    while h * 2 < m:
        h *= 2
    L11, X11 = _chol_inv(a[:h, :h], h)
    P = jax.lax.dot_general(a[h:, :h], X11, (((1,), (1,)), ((), ())), **_HI)
    S = a[h:, h:] - jax.lax.dot_general(P, P, (((1,), (1,)), ((), ())), **_HI)
    L22, X22 = _chol_inv(S, m - h)
    off = -jax.lax.dot_general(
        jax.lax.dot_general(X22, P, (((1,), (0,)), ((), ())), **_HI),
        X11, (((1,), (0,)), ((), ())), **_HI,
    )
    top_L = jnp.concatenate([L11, jnp.zeros((h, m - h), a.dtype)], axis=1)
    bot_L = jnp.concatenate([P, L22], axis=1)
    top_X = jnp.concatenate([X11, jnp.zeros((h, m - h), a.dtype)], axis=1)
    bot_X = jnp.concatenate([off, X22], axis=1)
    return (
        jnp.concatenate([top_L, bot_L], axis=0),
        jnp.concatenate([top_X, bot_X], axis=0),
    )


def cholesky_with_inv(A: jnp.ndarray, *, fast: bool = False, interpret: bool = False):
    """Blocked lower Cholesky of SPD A [n, n] fp32, n % B == 0.

    Returns (L [n, n] with zeros above the diagonal, invd [K, B, B] inverted
    diagonal blocks for trisolve.solve_lower/solve_upper block=B)."""
    n = A.shape[0]
    assert n % B == 0 and A.shape == (n, n), A.shape
    K = n // B

    def kern(A_ref, L_ref, invd_ref, C, Lb, sem_c, sem_j, sem_w):
        k = pl.program_id(0)
        # stripe k (reads the aliased in-place buffer: columns < kB already
        # hold final L values, columns >= kB still hold A)
        cp = pltpu.make_async_copy(L_ref.at[:, pl.ds(k * B, B)], C, sem_c)
        cp.start()
        cp.wait()

        def body(j, _):
            cj = pltpu.make_async_copy(L_ref.at[:, pl.ds(j * B, B)], Lb, sem_j)
            cj.start()
            cj.wait()
            Rk = Lb[pl.ds(k * B, B), :]  # [B, B] rows k of final panel j
            C[:, :] = C[:, :] - _dot_nt(Lb[:, :], Rk, fast)
            return 0

        jax.lax.fori_loop(0, k, body, 0)

        D = C[pl.ds(k * B, B), :]  # updated diagonal block [B, B]
        Lkk, Xkk = _chol_inv(D, B)
        invd_ref[0] = Xkk
        # panel apply; rows at/above the diagonal block are rewritten below
        F = jax.lax.dot_general(C[:, :], Xkk, (((1,), (1,)), ((), ())), **_HI)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)
        below = rows >= (k + 1) * B
        C[:, :] = jnp.where(below, F, 0.0)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        )
        C[pl.ds(k * B, B), :] = jnp.where(tri, Lkk, 0.0)
        wb = pltpu.make_async_copy(C, L_ref.at[:, pl.ds(k * B, B)], sem_w)
        wb.start()
        wb.wait()

    L, invd = pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, B, B), lambda k: (k, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((K, B, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, B), jnp.float32),
            pltpu.VMEM((n, B), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 << 20,
        ),
        interpret=interpret,
    )(A)
    return L, invd


def usable(n: int, dtype) -> bool:
    return dtype == jnp.float32 and n % B == 0 and n >= 2 * B
