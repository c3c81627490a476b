"""Block-tridiagonal cyclic-reduction solver (solver/band_cr.py): numerics
against dense references, band certification, and the engine integration
(solver="band_cr" must track the dense-Cholesky LM trajectory).

This is the TPU-native counterpart of the reference's banded-sparsity
exploitation (sparse Cholesky + METIS ordering,
reference: src/cuda_linear_solver.cpp:147-232, :342-348)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cuba_tpu.config import BAConfig
from cuba_tpu.io import synthetic

pytestmark = pytest.mark.slow  # exhaustive sweep: CI slow lane
from cuba_tpu.ops import robust
from cuba_tpu.solver import band_cr
from cuba_tpu.solver.engine import BlockSolverEngine
from cuba_tpu.solver.structure import build_structure_from_arrays

B = band_cr.B


def _banded_system(m, rng, couple=0.3, dtype=np.float64):
    U = rng.standard_normal((m, B, B)) * couple
    U[m - 1] = 0
    D = rng.standard_normal((m, B, B))
    D = np.einsum("mij,mkj->mik", D, D) + np.eye(B) * B
    b = rng.standard_normal(m * B)
    return D.astype(dtype), U.astype(dtype), b.astype(dtype)


def _dense_of(D, U):
    m = D.shape[0]
    n = m * B
    A = np.zeros((n, n), D.dtype)
    for k in range(m):
        A[k * B : (k + 1) * B, k * B : (k + 1) * B] = D[k]
        if k + 1 < m:
            A[k * B : (k + 1) * B, (k + 1) * B : (k + 2) * B] = U[k]
            A[(k + 1) * B : (k + 2) * B, k * B : (k + 1) * B] = U[k].T
    return A


@pytest.mark.parametrize("m", [2, 3, 5, 8, 22])
def test_cr_matches_dense_solve(m, rng):
    D, U, b = _banded_system(m, rng)
    x_ref = np.linalg.solve(_dense_of(D, U), b)
    x, ok = jax.jit(band_cr.cr_solve)(jnp.asarray(D), jnp.asarray(U), jnp.asarray(b))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("m", [5, 8])
def test_cr_pair_merge_matches_dense_solve(m, rng, monkeypatch):
    """CUBA_TPU_CR_MERGE folds block pairs into 2B-blocks before factoring
    (band_cr.merge_pairs — a measurement knob, default 0 after the round-5
    negative result); the merged factorization must stay exact, including
    the odd-m identity-pad path."""
    monkeypatch.setenv("CUBA_TPU_CR_MERGE", "1")
    D, U, b = _banded_system(m, rng)
    x_ref = np.linalg.solve(_dense_of(D, U), b)
    x, ok = jax.jit(band_cr.cr_solve)(jnp.asarray(D), jnp.asarray(U), jnp.asarray(b))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9, atol=1e-9)


def test_cr_fp32_with_refinement(rng):
    D, U, b = _banded_system(22, rng, dtype=np.float32)
    x_ref = np.linalg.solve(_dense_of(D, U).astype(np.float64), b.astype(np.float64))
    x, ok = jax.jit(lambda D, U, b: band_cr.cr_solve(D, U, b, refinement_steps=1))(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray(b)
    )
    assert bool(ok)
    err = np.abs(np.asarray(x) - x_ref).max() / np.abs(x_ref).max()
    assert err < 1e-4, err


def test_cr_matvec(rng):
    D, U, b = _banded_system(7, rng)
    x = rng.standard_normal(7 * B)
    y = band_cr.matvec(jnp.asarray(D), jnp.asarray(U), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), _dense_of(D, U) @ x, rtol=1e-10)


def test_cr_indefinite_reports_not_ok():
    # a singular diagonal block: factor goes non-finite even after boosts
    D = np.stack([np.eye(B), np.zeros((B, B)), np.eye(B)])
    D[1] -= 1e3 * np.eye(B)  # strongly negative-definite middle block
    U = np.zeros((3, B, B))
    b = np.ones(3 * B)
    x, ok = band_cr.cr_solve(
        jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32),
        jnp.asarray(b, jnp.float32),
    )
    # either rejected (ok=False) or the boost made it solvable; in both
    # cases the result must be finite
    assert np.all(np.isfinite(np.asarray(x)))


def test_certify():
    # banded pattern: neighbors only
    r = np.arange(100, dtype=np.int64).repeat(2)[1:-1].reshape(-1, 2)[:, 0]
    c = r + 1
    assert band_cr.certify(r, c, 128) == 2
    # adjacent-tile pair: representable in the super-diagonal tile even
    # though |r - c| > 64 (certification is tile-based, not bandwidth-based)
    assert band_cr.certify(np.array([0, 0]), np.array([1, 99]), 128) == 2
    # pair two CR tiles apart breaks certification
    assert band_cr.certify(np.array([0, 0]), np.array([1, 190]), 192) == 0
    assert band_cr.certify(np.array([0]), np.array([1]), 64) == 0  # m<2 -> 0


def _engine(solver, mxu):
    prob = synthetic.generate(num_poses=10, num_landmarks=90, seed=5)
    cams = np.tile(prob.cam, (10, 1))
    fp = np.zeros(10, bool)
    fp[prob.fixed_poses] = True
    fl = np.zeros(90, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fp, fl,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    return BlockSolverEngine(s, k, BAConfig(dtype=jnp.float32, mxu=mxu, solver=solver))


@pytest.mark.parametrize("mxu", ["interpret", "off"])
def test_engine_band_cr_matches_dense(mxu):
    e_b = _engine("band_cr", mxu)
    e_d = _engine("dense_cholesky", mxu)
    assert e_b.band_m >= 2
    rb = e_b.optimize(None, 5)
    rd = e_d.optimize(None, 5)
    n = min(int(rb.niters), int(rd.niters))
    assert n >= 3
    np.testing.assert_allclose(
        np.asarray(rb.chis)[:n], np.asarray(rd.chis)[:n], rtol=5e-3
    )


def test_engine_band_cr_rejects_unbanded():
    # scattered covisibility -> not band-certified -> clear error
    rng = np.random.default_rng(0)
    num_p, num_l = 200, 1600
    qs = np.tile(np.array([0.0, 0, 0, 1]), (num_p, 1))
    ts = rng.normal(size=(num_p, 3)) * 0.1
    cams = np.tile(np.array([500.0, 500, 320, 240, 0.1]), (num_p, 1))
    Xws = rng.normal(size=(num_l, 3)) + np.array([0, 0, 5.0])
    fp = np.zeros(num_p, bool)
    fp[0] = True
    fl = np.zeros(num_l, bool)
    mp, ml = [], []
    for lm in range(num_l):
        for p in rng.choice(num_p, size=4, replace=False):
            mp.append(p)
            ml.append(lm)
    e = np.zeros((0,), np.int32)
    s = build_structure_from_arrays(
        qs, ts, cams, Xws, fp, fl,
        np.asarray(mp, np.int32), np.asarray(ml, np.int32),
        rng.normal(size=(len(mp), 2)) * 10 + np.array([320.0, 240]),
        np.ones(len(mp)), e, e, np.zeros((0, 3)), np.zeros(0),
    )
    k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    with pytest.raises(ValueError, match="band"):
        BlockSolverEngine(s, k, BAConfig(dtype=jnp.float32, solver="band_cr"))


def test_schur_band_mxu_matches_dense_slice():
    """Direct band formation (mxu.schur_band_mxu / segmm.compact_to_band)
    must equal slicing the band out of the dense formation."""
    from cuba_tpu.solver import mxu as mxu_mod

    num_p, num_l = 150, 1400
    prob = synthetic.generate(num_poses=num_p, num_landmarks=num_l, seed=2)
    cams = np.tile(prob.cam, (num_p, 1))
    fp = np.zeros(num_p, bool)
    fp[prob.fixed_poses] = True
    fl = np.zeros(num_l, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fp, fl,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    e = BlockSolverEngine(s, k, BAConfig(dtype=jnp.float32, mxu="interpret",
                                         solver="band_cr"))
    assert e.use_mxu and e.mxu_plans.v2 and e.band_m >= 3
    st, co = e.state, e.consts
    err2, Xc2, err3, Xc3, chi = e._residuals_and_chi(st, co)
    HppT, HllT, HplT = e._build(st, co, err2, Xc2, err3, Xc3)
    lam = jnp.float32(1e-4)
    iv9, W, bscT, g12 = mxu_mod.prepare_factors_mxu(
        HppT, HllT, HplT, lam, e.num_p, e.num_l, e.mxu_plans, co.mxu,
        interpret=True)
    Dm = mxu_mod.schur_dense_mxu(
        HppT, W, HplT, lam, e.num_p, e.pad_blocks, e.mxu_plans, co.mxu,
        jnp.float32, interpret=True)
    D1, U1 = band_cr.from_dense(Dm, e.band_m)
    D2, U2 = mxu_mod.schur_band_mxu(
        HppT, W, HplT, lam, e.num_p, e.pad_blocks, e.mxu_plans, co.mxu,
        jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2), rtol=1e-5, atol=1e-5)


def _seq_graph_with_extras(num_p, num_l, extra_obs, seed=3):
    """Sequential covisibility window plus explicit (pose, landmark) extras."""
    rng = np.random.default_rng(seed)
    qs = np.tile(np.array([0.0, 0, 0, 1]), (num_p, 1))
    ts = np.cumsum(rng.normal(0.1, 0.02, size=(num_p, 3)), axis=0)
    cams = np.tile(np.array([500.0, 500, 320, 240, 0.1]), (num_p, 1))
    Xws = rng.normal(size=(num_l, 3)) * 3 + np.array([0, 0, 6.0])
    fp = np.zeros(num_p, bool)
    fp[0] = True
    fl = np.zeros(num_l, bool)
    mp, ml = [], []
    for lm in range(num_l):
        base = (lm * num_p) // num_l
        for kk in range(3):  # sequential covisibility window
            mp.append(min(base + kk, num_p - 1))
            ml.append(lm)
    for p, lm in extra_obs:
        mp.append(p)
        ml.append(lm)
    mp = np.asarray(mp, np.int32)
    ml = np.asarray(ml, np.int32)
    mz = rng.normal(size=(len(mp), 2)) * 10 + np.array([320.0, 240])
    e = np.zeros((0,), np.int32)
    return build_structure_from_arrays(
        qs, ts, cams, Xws, fp, fl, mp, ml, mz, np.ones(len(mp)),
        e, e, np.zeros((0, 3)), np.zeros(0),
    )


def test_single_loop_closure_folds_to_band():
    """A single seam loop closure (first landmarks re-observed from the
    last poses) is CIRCULAR covisibility: the structure pass's cycle-fold
    pose permutation restores a band, so 'auto' keeps the band path
    (round-2 behavior was degradation to dense)."""
    num_p, num_l = 200, 1800
    extras = [(num_p - 1 - lm, lm) for lm in range(8)]
    s = _seq_graph_with_extras(num_p, num_l, extras)
    k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    eng = BlockSolverEngine(
        s, k, BAConfig(dtype=jnp.float32, mxu="off", solver="band_cr")
    )
    assert s.pose_rank is not None, "cycle fold should trigger"
    assert eng.band_m > 0, "folded loop closure should band-certify"
    # (auto would still pick dense below m=8 — the explicit band_cr above
    # proves the folded pattern certifies and solves on the band path)
    res = eng.optimize(None, 4)
    chis = np.asarray(res.chis)[: int(res.niters)]
    assert np.all(np.isfinite(chis)) and chis[-1] < chis[0]


def test_scattered_chords_degrade_to_dense():
    """Long-range covisibility that neither the cycle fold nor the Woodbury
    gate (<= 64 loop columns) can absorb must degrade to dense and still
    converge (the reference's sparse Cholesky covers this shape natively;
    dense is our fallback of last resort below the PCG scale)."""
    rng = np.random.default_rng(9)
    num_p, num_l = 200, 1800
    # ~90 distinct chord endpoints scattered over the trajectory
    extras = []
    for _ in range(90):
        p = int(rng.integers(0, num_p))
        lm_anchor = int(rng.integers(0, num_p))
        lm = (lm_anchor * num_l) // num_p  # landmark anchored at lm_anchor
        extras.append((p, min(lm, num_l - 1)))
    s = _seq_graph_with_extras(num_p, num_l, extras, seed=9)
    k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    eng = BlockSolverEngine(s, k, BAConfig(dtype=jnp.float32, mxu="off"))
    assert eng.band_m == 0
    assert eng.solver in ("dense_cholesky", "band_lr")
    res = eng.optimize(None, 4)
    chis = np.asarray(res.chis)[: int(res.niters)]
    assert np.all(np.isfinite(chis)) and chis[-1] < chis[0]
