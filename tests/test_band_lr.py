"""Band + low-rank (Woodbury) solver for loop-closure Schur patterns.

The reference covers loop-closure covisibility with its fill-reducing
sparse Cholesky (reference: src/cuda_linear_solver.cpp:342-348); the TPU
design covers it with cyclic reduction on the in-band part plus a Woodbury
correction over the loop columns (solver/band_cr.py:cr_solve_woodbury).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuba_tpu.config import BAConfig
from cuba_tpu.io import synthetic

pytestmark = pytest.mark.slow  # exhaustive sweep: CI slow lane
from cuba_tpu.ops import robust
from cuba_tpu.solver import band_cr
from cuba_tpu.solver.engine import BlockSolverEngine
from cuba_tpu.solver.structure import build_structure_from_arrays

KERNELS = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))


def _loop_graph(num_p=200, num_l=1800, chords=4, seed=3):
    """Sequential covisibility plus FOLD-RESISTANT long-range chords.

    A single seam (first<->last poses) is handled by the structure pass's
    cycle-fold permutation and never reaches the Woodbury solver; multiple
    incommensurate chords cannot be band-ified by any single fold, so they
    exercise the band+low-rank path."""
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
        for kk in range(3):
            mp.append(min(base + kk, num_p - 1))
            ml.append(lm)
    # chords: re-observe a handful of landmarks from poses ~1/3 and ~2/3
    # of the trajectory away — no cycle fold makes ALL of these local
    lm_at = lambda pose: (pose * num_l) // num_p  # landmark anchored at pose
    for c in range(chords):
        src = (c * 2 + 1) * num_p // (2 * chords + 1)
        for dst_frac in (3, 5):
            dst = (src + dst_frac * num_p // 7) % num_p
            mp.append(dst)
            ml.append(lm_at(src))
    mp = np.asarray(mp, np.int32)
    ml = np.asarray(ml, np.int32)
    mz = rng.normal(size=(len(mp), 2)) * 10 + np.array([320.0, 240])
    e = np.zeros((0,), np.int32)
    return build_structure_from_arrays(
        qs, ts, cams, Xws, fp, fl, mp, ml, mz, np.ones(len(mp)),
        e, e, np.zeros((0, 3)), np.zeros(0),
    )


def test_certify_lr_splits_out_of_band():
    s = _loop_graph()
    pad = 256
    m, ob = band_cr.certify_lr(s.hsc_row, s.hsc_col, pad)
    assert m == pad // band_cr.POSES_PER_BLOCK
    assert ob.size > 0
    r = np.asarray(s.hsc_row)[ob]
    c = np.asarray(s.hsc_col)[ob]
    assert (np.abs(r - c) > band_cr.POSES_PER_BLOCK).all() or (
        np.abs(r // 64 - c // 64) > 1
    ).all()
    # certify (pure band) must reject the same pattern
    assert band_cr.certify(s.hsc_row, s.hsc_col, pad) == 0


def test_woodbury_matches_dense_reference(rng):
    B = band_cr.B
    m = 3
    n = m * B
    Dg = rng.normal(size=(m, B, B))
    D = Dg @ np.swapaxes(Dg, 1, 2) + np.eye(B) * (2.0 * B)
    U = rng.normal(size=(m, B, B)) * 0.3
    U[-1] = 0
    A = np.zeros((n, n))
    for k in range(m):
        A[k * B : (k + 1) * B, k * B : (k + 1) * B] = D[k]
        if k + 1 < m:
            A[k * B : (k + 1) * B, (k + 1) * B : (k + 2) * B] = U[k]
            A[(k + 1) * B : (k + 2) * B, k * B : (k + 1) * B] = U[k].T
    obr = np.array([0, 2, 5])
    obc = np.array([m * 64 - 1, m * 64 - 3, m * 64 - 1])
    Vob = rng.normal(size=(3, 6, 6))
    for (r, c, V) in zip(obr, obc, Vob):
        A[r * 6 : (r + 1) * 6, c * 6 : (c + 1) * 6] += V
        A[c * 6 : (c + 1) * 6, r * 6 : (r + 1) * 6] += V.T
    b = rng.normal(size=n)
    x_ref = np.linalg.solve(A, b)
    J = np.unique(np.concatenate([obr, obc]))
    ob_i = np.searchsorted(J, obr).astype(np.int32)
    ob_j = np.searchsorted(J, obc).astype(np.int32)
    jrows = (J[:, None] * 6 + np.arange(6)).reshape(-1).astype(np.int32)
    x, ok = band_cr.cr_solve_woodbury(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray(b), jnp.asarray(Vob),
        jnp.asarray(ob_i), jnp.asarray(ob_j), jnp.asarray(jrows), 1,
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9, atol=1e-9)
    # ob_from_dense gathers the same blocks back out of the dense image
    Vg = np.asarray(band_cr.ob_from_dense(jnp.asarray(A), obr, obc))
    np.testing.assert_allclose(Vg, Vob, rtol=1e-12, atol=1e-12)


def test_engine_band_lr_matches_dense_solver():
    """band_lr and dense_cholesky must produce the same LM trajectory on a
    loop-closure graph (same role as the reference's g2o parity check)."""
    s = _loop_graph()
    res = {}
    for solver in ("dense_cholesky", "band_lr"):
        eng = BlockSolverEngine(
            s, KERNELS, BAConfig(dtype=jnp.float64, mxu="off", solver=solver)
        )
        if solver == "band_lr":
            assert eng.solver == "band_lr" and eng.lr is not None
        r = eng.optimize(None, 5)
        res[solver] = np.asarray(r.chis)[: int(r.niters)]
    a, b = res["dense_cholesky"], res["band_lr"]
    n = min(len(a), len(b))
    assert n >= 3
    np.testing.assert_allclose(a[:n], b[:n], rtol=1e-6)


def test_auto_picks_band_lr_at_scale():
    """auto routes banded+loop-closure patterns to band_lr once the band
    pays off (m >= 8), instead of degrading to dense."""
    s = _loop_graph(num_p=1100, num_l=6600, chords=4, seed=5)
    eng = BlockSolverEngine(
        s, KERNELS, BAConfig(dtype=jnp.float32, mxu="off", solver="auto")
    )
    assert eng.band_m == 0  # not a pure band
    assert eng.lr is not None
    assert eng.solver == "band_lr"
    r = eng.optimize(None, 3)
    chis = np.asarray(r.chis)[: int(r.niters)]
    assert np.all(np.isfinite(chis)) and chis[-1] < chis[0]


def test_band_lr_mxu_interpret_parity():
    """The MXU band_lr path (compact band formation + ob gather) matches
    the XLA dense-based path in interpret mode."""
    # chords must span >= 2 CR tiles (128 poses) to stay out-of-band
    s = _loop_graph(num_p=300, num_l=2400, chords=3, seed=7)
    cfgs = {
        "xla": BAConfig(dtype=jnp.float32, mxu="off", solver="band_lr"),
        "mxu": BAConfig(dtype=jnp.float32, mxu="interpret", solver="band_lr"),
    }
    chis = {}
    for name, cfg in cfgs.items():
        eng = BlockSolverEngine(s, KERNELS, cfg)
        if name == "mxu":
            assert eng.use_mxu and eng.mxu_plans.lr_nob > 0
        r = eng.optimize(None, 3)
        chis[name] = np.asarray(r.chis)[: int(r.niters)]
    n = min(len(chis["xla"]), len(chis["mxu"]))
    assert n >= 2
    np.testing.assert_allclose(chis["xla"][:n], chis["mxu"][:n], rtol=2e-4)


def test_synthetic_loop_closure_folds_to_band():
    """generate(loop_closure=True) makes the temporal pose order circular;
    the structure pass's cycle-fold permutation (the METIS-ordering
    analogue, structure._pose_band_perm) restores a pure band, so the loop
    trajectory rides the fast band_cr path with no low-rank correction."""
    prob = synthetic.generate(
        num_poses=300, num_landmarks=3000, mean_obs_per_landmark=5.0,
        stereo_fraction=0.2, seed=1, loop_closure=True,
    )
    n_poses, n_lms = 300, 3000
    cams = np.tile(prob.cam, (n_poses, 1))
    fixed_p = np.zeros(n_poses, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(n_lms, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    assert s.pose_rank is not None  # the fold was applied
    pad = 384
    assert band_cr.certify(s.hsc_row, s.hsc_col, pad) == pad // 64
    # the folded pattern must certify and solve on the band path (auto
    # still picks dense below m=8 — it's faster there; force band_cr)
    eng = BlockSolverEngine(
        s, KERNELS, BAConfig(dtype=jnp.float64, mxu="off", solver="band_cr")
    )
    assert eng.band_m == pad // 64
    res = eng.optimize(None, 4)
    chis = np.asarray(res.chis)[: int(res.niters)]
    assert np.all(np.isfinite(chis)) and chis[-1] < chis[0]


def test_pose_fold_preserves_solution():
    """The pose permutation is internal: the LM trajectory matches the
    unfolded problem's (solved dense, no fold) to parity grade."""
    num_p, num_l = 160, 1500
    prob = synthetic.generate(
        num_poses=num_p, num_landmarks=num_l, mean_obs_per_landmark=4.0,
        stereo_fraction=0.2, seed=4, loop_closure=True,
    )
    cams = np.tile(prob.cam, (num_p, 1))
    fixed_p = np.zeros(num_p, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(num_l, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    if s.pose_rank is None:
        return  # fold not triggered at this scale; nothing to compare
    chis = {}
    for solver in ("dense_cholesky", "band_cr"):
        eng = BlockSolverEngine(
            s, KERNELS, BAConfig(dtype=jnp.float64, mxu="off", solver=solver)
        )
        r = eng.optimize(None, 4)
        chis[solver] = np.asarray(r.chis)[: int(r.niters)]
    n = min(len(chis["dense_cholesky"]), len(chis["band_cr"]))
    assert n >= 3
    np.testing.assert_allclose(
        chis["dense_cholesky"][:n], chis["band_cr"][:n], rtol=1e-8
    )
