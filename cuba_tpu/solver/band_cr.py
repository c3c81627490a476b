"""Block-tridiagonal cyclic-reduction solver for banded Schur complements.

SLAM/odometry pose graphs are band-structured: after the locality reorder
the Hsc block bandwidth at the reference's own benchmark scales is ~12
pose blocks (kitti00-scale synthetic; scalar half-bandwidth 78 out of
n=7926).  The dense Cholesky factors the full 6PB x 6PB matrix anyway —
O(n^3) FLOPs and, worse on TPU, ~n/128 *sequential* panel steps.

This module exploits the band the TPU-native way, playing the role the
reference's sparse Cholesky + METIS ordering plays on GPU (reference:
src/cuda_linear_solver.cpp:147-232, :342-348 — 74% of its runtime):

* The band is packed into block-tridiagonal storage: D [m, B, B] diagonal
  blocks and U [m, B, B] super-diagonal blocks (U[k] = A[k, k+1], B=384 =
  64 pose blocks), so a half-bandwidth <= 64 pose blocks fits exactly.
* Odd-even cyclic reduction eliminates all odd block rows per level:
  log2(m) levels of *batched* 384^3 MXU matmuls + one batched inverse —
  sequential depth ~log2(m) instead of n/128.  At m=22 that is 5 levels.
* The factor (per-level transfer operators) is kept, so the iterative-
  refinement re-solves are pure batched matvecs.

Elimination order is a symmetric permutation of an SPD matrix, so every
reduced system stays SPD and the recursion is unpivoted-stable; fp32
noise is handled exactly like dense_cholesky.py: Jacobi equilibration,
diagonal-boost retry on non-finite factors, iterative refinement against
the undamped band operator, and ok=False -> LM step rejection (the
reference's zero-pivot semantics, cuda_linear_solver.cpp:175-189).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

# CR block: 384 = 64 pose blocks * 6 — MXU-aligned (3 x 128 lanes) AND a
# multiple of 6, so 6x6 pose blocks never straddle a CR block boundary.
B = 384
POSES_PER_BLOCK = B // 6


def usable(num_blocks: int) -> bool:
    """CR needs >= 2 block rows to beat a direct solve."""
    return num_blocks >= 2


def certify(hsc_row, hsc_col, pad_blocks: int):
    """Host-side band certification: the Schur block pattern fits the
    block-tridiagonal storage iff every (row, col) pair lands in the same
    or an adjacent CR block — guaranteed by half-bandwidth <= 64 pose
    blocks.  Returns the CR block count m, or 0 if not banded."""
    m, ob = certify_lr(hsc_row, hsc_col, pad_blocks)
    return m if ob.size == 0 else 0


def certify_lr(hsc_row, hsc_col, pad_blocks: int):
    """Band + low-rank certification: like :func:`certify` but long-range
    (out-of-band) blocks are allowed and returned instead of failing.

    Loop-closure covisibility (ORB-SLAM revisits, reference README.md:101-104)
    makes real Schur patterns "banded + a few long-range blocks"; those
    blocks are handled by a Woodbury correction against the CR factor
    (:func:`cr_solve_woodbury`) instead of degrading to the dense solver.

    Returns (m, ob_idx): the CR block count (0 if the IN-band part does not
    certify) and the sorted indices into the hsc block list of the
    out-of-band blocks (empty for a pure band).
    """
    import numpy as np

    empty = np.zeros(0, np.int64)
    if pad_blocks % POSES_PER_BLOCK != 0:
        return 0, empty
    m = pad_blocks // POSES_PER_BLOCK
    if m < 2 or len(hsc_row) == 0:
        return 0, empty
    r = np.asarray(hsc_row, np.int64)
    c = np.asarray(hsc_col, np.int64)
    # representable in (D, U) storage == same or ADJACENT CR tile; that is
    # the exact condition (a block may sit |r-c| up to 127 apart and still
    # live in the super-diagonal tile)
    out = np.abs(r // POSES_PER_BLOCK - c // POSES_PER_BLOCK) > 1
    return m, np.nonzero(out)[0]


def from_dense(A: jnp.ndarray, m: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slice block-tridiagonal storage (D, U) out of a dense [m*B, m*B]
    matrix (bridging path: the band-certified dense formation)."""
    D = jnp.stack([A[k * B : (k + 1) * B, k * B : (k + 1) * B] for k in range(m)])
    U = jnp.stack(
        [A[k * B : (k + 1) * B, (k + 1) * B : (k + 2) * B] for k in range(m - 1)]
        + [jnp.zeros((B, B), A.dtype)]
    )
    return D, U


def ob_from_dense(Dm: jnp.ndarray, obr, obc) -> jnp.ndarray:
    """Gather the out-of-band 6x6 blocks A[obr[k], obc[k]] from a dense
    Schur matrix (bridging path for cr_solve_woodbury when the band storage
    was sliced out of the dense formation).  obr/obc are host-side NumPy
    pose-block indices, so the gather indices are static."""
    import numpy as np

    rows = np.asarray(obr, np.int64)[:, None] * 6 + np.arange(6)
    cols = np.asarray(obc, np.int64)[:, None] * 6 + np.arange(6)
    return Dm[rows[:, :, None], cols[:, None, :]]


def _inv_spd_chol(M):
    """Batched SPD inverse via Cholesky (batched over the leading dim)."""
    L = jnp.linalg.cholesky(M)
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True
    )
    return jnp.swapaxes(Linv, -1, -2) @ Linv


def _inv_spd_rs(M, leaf: int = 48):
    """Batched SPD inverse by recursive 2x2 block Schur complements —
    pure batched matmuls down to `leaf`-sized LU leaves, so the whole
    inverse is MXU work with log2(n/leaf) sequential depth (XLA's batched
    Cholesky still walks columns sequentially inside each block)."""
    n = M.shape[-1]
    if n <= leaf:
        # Cholesky leaf: TPU's LuDecomposition expander is F32-only, and
        # the blocks are SPD anyway
        return _inv_spd_chol(M)
    h = n // 2
    A = M[..., :h, :h]
    Bm = M[..., :h, h:]
    C = M[..., h:, h:]
    hp = "highest"
    Ai = _inv_spd_rs(A, leaf)
    AiB = jnp.matmul(Ai, Bm, precision=hp)
    S = C - jnp.matmul(jnp.swapaxes(Bm, -1, -2), AiB, precision=hp)
    Si = _inv_spd_rs(S, leaf)
    TR = -jnp.matmul(AiB, Si, precision=hp)
    TL = Ai - jnp.matmul(TR, jnp.swapaxes(AiB, -1, -2), precision=hp)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(TR, -1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# CUBA_TPU_CR_RSINV=0 switches the CR diagonal-block inverses back to
# batched Cholesky.  Default is the recursive-Schur form: measured 3.75 ms
# vs 10.6 ms for the full CR factor at kitti00 scale on v5e (XLA's batched
# Cholesky walks columns sequentially inside each 384 block; the recursive
# form is pure batched MXU matmuls with log-depth).  Numerics are covered
# by the same guards either way: equilibration, boost retry, refinement,
# ok=False -> LM rejection.
def _inv_spd(M):
    import os

    if os.environ.get("CUBA_TPU_CR_RSINV", "1") == "1":
        return _inv_spd_rs(M)
    return _inv_spd_chol(M)


def merge_pairs(D: jnp.ndarray, U: jnp.ndarray):
    """Merge adjacent block pairs: [m, B, B] tridiagonal -> [ceil(m/2), 2B,
    2B] tridiagonal over the SAME matrix (odd m pads a decoupled identity
    block).  CR on the merged system runs one fewer level with 8x-larger
    matmuls per op.  NEGATIVE RESULT (round 5, v5e, m=22): merge=1
    measured 6.9 vs 6.2 ms and merge=2 14.5 ms — the fatter recursive-
    Schur inverses cost more than the saved level, so the default stays 0
    and CUBA_TPU_CR_MERGE is a measurement knob (docs/PERF_NOTES.md)."""
    m, Bd = D.shape[0], D.shape[1]
    if m % 2:
        D = jnp.concatenate([D, jnp.eye(Bd, dtype=D.dtype)[None]], axis=0)
        U = jnp.concatenate([U, jnp.zeros((1, Bd, Bd), D.dtype)], axis=0)
    De, Do = D[0::2], D[1::2]
    Ue = U[0::2]  # intra-pair coupling 2k -> 2k+1
    Uo = U[1::2]  # inter-pair coupling 2k+1 -> 2k+2
    top = jnp.concatenate([De, Ue], axis=2)
    bot = jnp.concatenate([jnp.swapaxes(Ue, 1, 2), Do], axis=2)
    D2 = jnp.concatenate([top, bot], axis=1)
    z = jnp.zeros_like(Uo)
    U2 = jnp.concatenate(
        [jnp.concatenate([z, z], axis=2), jnp.concatenate([Uo, z], axis=2)],
        axis=1,
    )
    return D2, U2


def factor(D: jnp.ndarray, U: jnp.ndarray):
    """Cyclic-reduction factorization of the block-tridiagonal (D, U).

    D: [m, B, B] diagonal blocks; U: [m, B, B] with U[k] = A[k, k+1]
    (U[m-1] must be zero).  Returns the per-level transfer operators:
    levels = tuple of (Dinv_o, Ue, Uo, R, L) and the inverted base system.
    """
    levels = []
    b_dt = D.dtype
    Bd = D.shape[1]
    while D.shape[0] > 2:
        m = D.shape[0]
        ne, no = (m + 1) // 2, m // 2
        De, Do = D[0::2], D[1::2]
        Ue = U[0::2][:no]          # U[2t],   t < no
        Uo = U[1::2]               # U[2t+1], count (m-1)//2 = ne-1
        Dinv_o = _inv_spd(Do)      # [no, B, B]
        R = Ue @ Dinv_o            # A[2t, 2t+1] D_{2t+1}^{-1}
        L = jnp.swapaxes(U[1::2][: ne - 1], 1, 2) @ Dinv_o[: ne - 1]
        # reduced diagonal: D'_t = D_2t - R U^T (right) - L U (left)
        Dn = De.at[:no].add(-(R @ jnp.swapaxes(Ue, 1, 2)))
        Dn = Dn.at[1:ne].add(-(L @ U[1::2][: ne - 1]))
        # reduced super-diagonal: U'_t = -R_t U_{2t+1}, t < ne-1
        Un = -(R[: ne - 1] @ Uo[: ne - 1])
        Un = jnp.concatenate(
            [Un, jnp.zeros((ne - (ne - 1), Bd, Bd), b_dt)], axis=0
        )
        levels.append((Dinv_o, Ue, Uo, R, L))
        D, U = Dn, Un
    # base: m <= 2 -> one dense [m*B, m*B] SPD solve
    m = D.shape[0]
    if m == 1:
        base = _inv_spd(D[0])
    else:
        top = jnp.concatenate([D[0], U[0]], axis=1)
        bot = jnp.concatenate([U[0].T, D[1]], axis=1)
        base = _inv_spd(jnp.concatenate([top, bot], axis=0))
    return tuple(levels), base


def solve(levels, base, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B using a factor() result.

    b: [m*B] or [m*B, R] (multi-RHS — every step is a batched matmul, so
    extra right-hand sides ride the MXU nearly for free; the Woodbury
    loop-closure correction leans on this)."""
    vec = b.ndim == 1
    bm = b[:, None] if vec else b
    R_ = bm.shape[1]
    if not levels:  # base-only factor (m <= 2): one dense solve
        x = base @ bm
        return x[:, 0] if vec else x
    Bd = levels[0][0].shape[-1]
    m0 = bm.shape[0] // Bd
    b_lv = [bm.reshape(m0, Bd, R_)]
    for (Dinv_o, Ue, Uo, R, L) in levels:
        bb = b_lv[-1]
        m = bb.shape[0]
        ne = (m + 1) // 2
        no = m // 2
        be, bo = bb[0::2], bb[1::2]
        bn = be.at[:no].add(-(R @ bo))
        bn = bn.at[1:ne].add(-(L @ bo[: ne - 1]))
        b_lv.append(bn)
    x = (base @ b_lv[-1].reshape(-1, R_)).reshape(-1, Bd, R_)
    for (Dinv_o, Ue, Uo, R, L), bb in zip(reversed(levels), reversed(b_lv[:-1])):
        m = bb.shape[0]
        no = m // 2
        bo = bb[1::2]
        # x_odd[t] = Dinv[t] (b_odd[t] - U[2t]^T x_e[t] - U[2t+1] x_e[t+1])
        xe_r = jnp.concatenate([x[1:], jnp.zeros((1, Bd, R_), x.dtype)], axis=0)
        r = bo - jnp.swapaxes(Ue, 1, 2) @ x[:no]
        r = r - Uo[:no] @ xe_r[:no]
        xo = Dinv_o @ r
        xn = jnp.zeros((m, Bd, R_), x.dtype)
        xn = xn.at[0::2].set(x[: (m + 1) // 2])
        xn = xn.at[1::2].set(xo)
        x = xn
    x = x.reshape(-1, R_)
    return x[:, 0] if vec else x


def matvec(D: jnp.ndarray, U: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Y = A X for the block-tridiagonal (D, U).  x, y: [m*B] or [m*B, R]."""
    vec = x.ndim == 1
    xm = x[:, None] if vec else x
    R_ = xm.shape[1]
    m = D.shape[0]
    Bd = D.shape[1]
    xb = xm.reshape(m, Bd, R_)
    y = D @ xb
    xr = jnp.concatenate([xb[1:], jnp.zeros((1, Bd, R_), x.dtype)], axis=0)
    y = y + U @ xr
    xl = jnp.concatenate([jnp.zeros((1, Bd, R_), x.dtype), xb[:-1]], axis=0)
    Ul = jnp.concatenate([jnp.zeros((1, Bd, Bd), x.dtype), U[:-1]], axis=0)
    y = y + jnp.swapaxes(Ul, 1, 2) @ xl
    y = y.reshape(-1, R_)
    return y[:, 0] if vec else y


def _factor_equilibrated(D: jnp.ndarray, U: jnp.ndarray):
    """Jacobi-equilibrate and CR-factor the band, with the fp32
    diagonal-boost retry on non-finite factors.  Returns ``solve_with``,
    a closure solving A x = rhs ([n] or [n, R]) in the ORIGINAL scaling."""
    import os

    n_orig = D.shape[0] * D.shape[1]
    try:
        merge = int(os.environ.get("CUBA_TPU_CR_MERGE", "0"))
    except ValueError:
        import warnings

        warnings.warn("CUBA_TPU_CR_MERGE is not an integer; using 0")
        merge = 0
    for _ in range(merge):
        if D.shape[0] < 4:
            break
        D, U = merge_pairs(D, U)
    Bd = D.shape[1]
    n_pad = D.shape[0] * Bd - n_orig  # odd-m merges append identity blocks
    d = jnp.diagonal(D, axis1=1, axis2=2)  # [m, Bd]
    s = jax.lax.rsqrt(jnp.maximum(d, jnp.asarray(1e-30, D.dtype)))
    sr = jnp.concatenate([s[1:], jnp.ones((1, Bd), s.dtype)], axis=0)
    Ds = D * s[:, :, None] * s[:, None, :]
    Us = U * s[:, :, None] * sr[:, None, :]
    sf = s.reshape(-1)

    eyeB = jnp.eye(Bd, dtype=D.dtype)

    if D.dtype == jnp.float32:
        # fp32 diagonal-boost retry as ONE lax.cond, not a while_loop: the
        # loop carried the whole factor (5 levels x ~13 MB) through every
        # iteration check, costing ~8 ms/attempt at kitti00 scale even when
        # no boost fired (measured, tools/profile_crsolve.py).  One retry at
        # a strong delta suffices — if that still fails, ok=False rejects
        # the LM step and lambda escalation re-damps (the same self-healing
        # as the reference's zero-pivot path, cuda_linear_solver.cpp:175-189).
        lv0, base0 = factor(Ds, Us)
        bad = ~jnp.isfinite(jnp.sum(base0))
        for (Dinv_o, *_rest) in lv0:
            bad = bad | ~jnp.isfinite(jnp.sum(Dinv_o[-1]))
        levels, base = jax.lax.cond(
            bad,
            lambda: factor(Ds + jnp.float32(1e-3) * eyeB[None], Us),
            lambda: (lv0, base0),
        )
    else:
        levels, base = factor(Ds, Us)

    def solve_with(rhs):
        if n_pad:  # identity-padded tail rows (decoupled, zero rhs)
            zpad = ((0, n_pad),) + ((0, 0),) * (rhs.ndim - 1)
            rhs = jnp.pad(rhs, zpad)
        sc = sf if rhs.ndim == 1 else sf[:, None]
        x = sc * solve(levels, base, rhs * sc)
        return x[:n_orig] if n_pad else x

    return solve_with


def cr_solve(
    D: jnp.ndarray,
    U: jnp.ndarray,
    b: jnp.ndarray,
    refinement_steps: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the banded SPD system A x = b.  Returns (x, ok).

    Same numerical contract as dense_cholesky.cholesky_solve: Jacobi
    equilibration, diagonal-boost retry on a non-finite factor, fixed
    refinement sweeps against the *original* operator, last-finite-iterate
    keep, ok=False on a non-finite result (LM rejects the step).
    """
    solve_with = _factor_equilibrated(D, U)

    x = solve_with(b)
    for _ in range(refinement_steps):
        r = b - matvec(D, U, x)
        x2 = x + solve_with(r)
        finite = jnp.isfinite(jnp.sum(x2))
        x = jnp.where(finite, x2, x)

    ok = jnp.all(jnp.isfinite(x))
    x = jnp.where(ok, x, jnp.zeros_like(x))
    return x, ok


def cr_solve_woodbury(
    D: jnp.ndarray,
    U: jnp.ndarray,
    b: jnp.ndarray,
    Vob: jnp.ndarray,  # [n_ob, 6, 6] out-of-band block values A[rob, cob]
    ob_i: jnp.ndarray,  # [n_ob] int32 index of rob in the loop-column set J
    ob_j: jnp.ndarray,  # [n_ob] int32 index of cob in J
    jrows: jnp.ndarray,  # [6k] int32 scalar rows of the J columns (k blocks)
    refinement_steps: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve (B + P S P^T) x = b: banded + low-rank loop-closure blocks.

    This is the TPU answer to the reference's fill-reducing sparse Cholesky
    (reference: src/cuda_linear_solver.cpp:342-348): real SLAM covisibility
    is "banded + a few long-range loop-closure blocks"; the band B factors
    by cyclic reduction and the k loop columns are corrected by the
    Woodbury identity

        (B + P S P^T)^{-1} = B^{-1} - B^{-1} P (I + S G)^{-1} S P^T B^{-1},
        G = P^T B^{-1} P,

    which holds for SINGULAR S too (S has zero diagonal blocks: it carries
    only the off-band coupling).  Cost: ONE multi-RHS CR solve with 6k+1
    columns (the factor's block reads amortize across columns on the MXU),
    one [6k, 6k] dense solve, and batched matvecs per refinement sweep.

    B must be SPD for the CR factor; with LM damping it is, in practice —
    a non-finite factor hits the boost retry and, failing that, ok=False
    rejects the step (lambda grows, making B more diagonally dominant:
    self-healing via the reference's own rho=-1 semantics).

    Returns (x, ok).
    """
    n = b.shape[0]
    r6 = jrows.shape[0]
    dt = b.dtype

    # S [6k, 6k]: symmetric scatter of the off-band blocks (zero diagonal)
    n_ob = Vob.shape[0]
    S = jnp.zeros((r6, r6), dt)
    bi = jnp.broadcast_to(
        ob_i[:, None, None] * 6 + jnp.arange(6)[None, :, None], (n_ob, 6, 6)
    ).reshape(-1)
    bj = jnp.broadcast_to(
        ob_j[:, None, None] * 6 + jnp.arange(6)[None, None, :], (n_ob, 6, 6)
    ).reshape(-1)
    S = S.at[bi, bj].add(Vob.reshape(-1))
    S = S.at[bj, bi].add(Vob.reshape(-1))

    # Gershgorin shift: B = A - P S P^T need not be SPD (S's coupling can
    # exceed A's spectral floor and the CR Cholesky would NaN).  Move a
    # diagonal d_j = sum_k |S[j,k]| from S into B: with S' = S - diag(d),
    # B' = B + P diag(d) P^T we get x'B'x = x'Ax + (u'diag(d)u - u'Su) >= 0
    # for u = P^T x, so B' >= A > 0 — SPD by construction, same algebra.
    drow = jnp.sum(jnp.abs(S), axis=1)
    S = S - jnp.diag(drow)
    kb = jrows // B
    ob_off = jrows % B
    D = D.at[kb, ob_off, ob_off].add(drow)

    solve_with = _factor_equilibrated(D, U)

    # one multi-RHS solve: [b | E], E = unit columns at jrows
    E = jnp.zeros((n, r6), dt).at[jrows, jnp.arange(r6)].set(1.0)
    Y = solve_with(jnp.concatenate([b[:, None], E], axis=1))
    y, Z = Y[:, 0], Y[:, 1:]
    G = Z[jrows, :]  # [6k, 6k]
    T = jnp.eye(r6, dtype=dt) + S @ G
    # factor the capacitance once per attempt: correct() is then a gather
    # + one [n, 6k] matvec, cheap enough to run per refinement sweep.
    # (TPU's LuDecomposition expander is f32-only; the band path is fp32 by
    # design and the fp64 XLA path runs on CPU where f64 LU lowers fine.)
    W2 = Z @ jnp.linalg.solve(T, S)

    def correct(yv):
        """Woodbury correction of a band solve yv = B^{-1} rhs."""
        return yv - W2 @ yv[jrows]

    def full_matvec(x):
        extra = jnp.zeros(n, dt).at[jrows].add(S @ x[jrows])
        return matvec(D, U, x) + extra

    x = correct(y)
    for _ in range(refinement_steps):
        r = b - full_matvec(x)
        x2 = x + correct(solve_with(r))
        finite = jnp.isfinite(jnp.sum(x2))
        x = jnp.where(finite, x2, x)

    ok = jnp.all(jnp.isfinite(x))
    x = jnp.where(ok, x, jnp.zeros_like(x))
    return x, ok
