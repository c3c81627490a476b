"""Reduced-system solver tests: dense Cholesky path vs matrix-free PCG path,
plus direct operator checks against a dense reconstruction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuba_tpu import BAConfig, EdgeType, RobustKernelType
from cuba_tpu.io import synthetic
from cuba_tpu.solver import pcg
from cuba_tpu.solver.engine import BlockSolverEngine


def make_engine(config, seed=21, poses=10, lms=90):
    prob = synthetic.generate(num_poses=poses, num_landmarks=lms, seed=seed)
    ba = synthetic.build_graph(prob, config)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba.initialize()
    return ba


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_pcg_matches_dense_cholesky():
    ba_d = make_engine(BAConfig(solver="dense_cholesky"))
    ba_p = make_engine(BAConfig(solver="pcg", pcg_tol=1e-12, pcg_max_iterations=500))
    ba_d.optimize(6)
    ba_p.optimize(6)
    chis_d = np.array([s.chi2 for s in ba_d.batch_statistics()])
    chis_p = np.array([s.chi2 for s in ba_p.batch_statistics()])
    n = min(len(chis_d), len(chis_p))
    assert n >= 4
    rel = np.abs(chis_d[:n] - chis_p[:n]) / np.abs(chis_d[:n])
    assert np.all(rel < 1e-6), list(zip(chis_d[:n], chis_p[:n]))


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_schur_operator_matches_dense(rng):
    """SchurOperator.matvec and block_diagonal against the dense assembly."""
    from cuba_tpu.solver import assembly, schur

    ba = make_engine(BAConfig(), seed=5, poses=6, lms=40)
    eng = ba._engine
    state, consts = eng.state, eng.consts
    err2, Xc2, err3, Xc3, _ = eng._residuals_and_chi(state, consts)
    Hpp, bp, Hll, bl, Hpl = eng._build(state, consts, err2, Xc2, err3, Xc3)
    lam = jnp.asarray(1e-4, eng.dtype)
    Hpp_d = assembly.damp(Hpp, lam)
    Hll_d = assembly.damp(Hll, lam)
    invHll, W, bsc = schur.prepare_factors(bp, Hll_d, bl, Hpl, consts.sc, eng.num_p)
    Dm = np.asarray(schur.assemble_dense(Hpp_d, W, Hpl, consts.sc, eng.num_p, eng.pad_blocks))
    n_act = 6 * eng.num_p
    D_act = Dm[:n_act, :n_act]
    np.testing.assert_allclose(D_act, D_act.T, atol=1e-10)

    op = pcg.SchurOperator(Hpp_d, Hpl, W, consts.sc.hpl_row, consts.sc.hpl_col, eng.num_p, eng.num_l)
    x = rng.normal(size=(eng.num_p, 6))
    y_op = np.asarray(op.matvec(jnp.asarray(x)))
    y_dense = (D_act @ x.reshape(-1)).reshape(eng.num_p, 6)
    np.testing.assert_allclose(y_op, y_dense, rtol=1e-9, atol=1e-9)

    bd = np.asarray(op.block_diagonal())
    for r in range(eng.num_p):
        np.testing.assert_allclose(bd[r], D_act[6 * r : 6 * r + 6, 6 * r : 6 * r + 6], atol=1e-10)


def test_cholesky_failure_reports_not_ok():
    from cuba_tpu.solver.dense_cholesky import cholesky_solve

    A = jnp.asarray(np.diag([1.0, -1.0, 1.0, 1.0]))  # indefinite
    b = jnp.ones(4, jnp.float64)
    x, ok = jax.jit(cholesky_solve)(A, b)
    assert not bool(ok)
    assert np.all(np.asarray(x) == 0)


def test_trisolve_pallas_matches_dense(rng):
    """Pallas blocked trisolve kernels (interpret mode) vs NumPy solves.

    These replace XLA's width-1 TriangularSolve on TPU (solver/trisolve.py);
    on CPU the engine never selects them, so exercise interpret mode here."""
    from cuba_tpu.solver import trisolve
    from cuba_tpu.solver.dense_cholesky import cholesky_solve

    n = 768
    M = rng.standard_normal((n, n)).astype(np.float32)
    A = (M @ M.T + n * np.eye(n, dtype=np.float32)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    L = np.linalg.cholesky(A)

    # block-recursive triangular inversion
    Ld = jnp.asarray(
        np.stack([L[i * 256 : (i + 1) * 256, i * 256 : (i + 1) * 256] for i in range(3)])
    )
    inv = np.asarray(trisolve.tri_inv_blocks(Ld))
    for i in range(3):
        np.testing.assert_allclose(inv[i] @ np.asarray(Ld[i]), np.eye(256), atol=5e-6)

    Lj = jnp.asarray(L)
    invd = trisolve.prepare(Lj, interpret=True)
    y = np.asarray(trisolve.solve_lower(Lj, invd, jnp.asarray(b), interpret=True))
    y_ref = np.linalg.solve(L, b)
    np.testing.assert_allclose(y, y_ref, rtol=0, atol=2e-5 * np.abs(y_ref).max())
    x = np.asarray(trisolve.solve_upper(Lj, invd, jnp.asarray(y), interpret=True))
    x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(x, x_ref, rtol=0, atol=2e-5 * np.abs(x_ref).max())
    mv = np.asarray(trisolve.matvec(jnp.asarray(A), jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(mv, A @ x, rtol=0, atol=1e-4 * np.abs(A @ x).max())

    # full equilibrated solve through the public entry point
    xs, ok = cholesky_solve(jnp.asarray(A), jnp.asarray(b), 2, use_pallas=True, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(xs), x_ref, rtol=0, atol=1e-5 * np.abs(x_ref).max())


def test_trisolve_usable_gate():
    from cuba_tpu.solver import trisolve

    assert trisolve.usable(768, jnp.float32)
    assert trisolve.usable(8448, jnp.float32)
    assert not trisolve.usable(768, jnp.float64)  # Mosaic has no f64
    assert not trisolve.usable(700, jnp.float32)  # not a block multiple
    assert not trisolve.usable(256, jnp.float32)  # single panel: XLA is fine
    assert not trisolve.usable(200_000, jnp.float32)  # stripe exceeds VMEM
