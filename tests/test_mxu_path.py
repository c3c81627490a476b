"""MXU solve path (solver/mxu.py) vs the XLA path: identical problems must
produce matching systems, solves and LM trajectories.  Runs the Pallas
kernels in interpreter mode so this works on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cuba_tpu.config import BAConfig
from cuba_tpu.io import synthetic
from cuba_tpu.ops import robust
from cuba_tpu.solver.engine import BlockSolverEngine
from cuba_tpu.solver.structure import build_structure_from_arrays


def _engines(num_poses=10, num_landmarks=90, seed=5):
    prob = synthetic.generate(num_poses=num_poses, num_landmarks=num_landmarks, seed=seed)
    cams = np.tile(prob.cam, (num_poses, 1))
    fp = np.zeros(num_poses, bool)
    fp[prob.fixed_poses] = True
    fl = np.zeros(num_landmarks, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fp, fl,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    e_mxu = BlockSolverEngine(s, k, BAConfig(dtype=jnp.float32, mxu="interpret"))
    e_xla = BlockSolverEngine(s, k, BAConfig(dtype=jnp.float32, mxu="off"))
    return e_mxu, e_xla


class TestMXUPath:
    def test_mxu_plans_ok(self):
        e_mxu, _ = _engines()
        assert e_mxu.use_mxu, "MXU plans rejected a well-behaved synthetic problem"

    @pytest.mark.slow  # heavy sweep: CI slow lane

    def test_build_system_matches(self):
        # each engine runs its own residual pass (the rows front end returns
        # transposed packs, not AoS arrays); chi equality below is the
        # cross-path residual check
        e_mxu, e_xla = _engines()
        st, cm = e_mxu.state, e_mxu.consts
        r2m, x2m, r3m, x3m, chi_m = e_mxu._residuals_and_chi(st, cm)
        err2, Xc2, err3, Xc3, chi_x = e_xla._residuals_and_chi(e_xla.state, e_xla.consts)
        np.testing.assert_allclose(float(chi_m), float(chi_x), rtol=1e-5)
        HppT, HllT, HplT = e_mxu._build(st, cm, r2m, x2m, r3m, x3m)
        Hpp, bp, Hll, bl, Hpl = e_xla._build(e_xla.state, e_xla.consts, err2, Xc2, err3, Xc3)
        P, L, nh = e_xla.num_p, e_xla.num_l, e_xla.structure.n_hpl
        np.testing.assert_allclose(
            np.asarray(HppT[:36].T.reshape(P, 6, 6)), np.asarray(Hpp), rtol=1e-3, atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(HppT[36:].T), np.asarray(bp), rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(HllT[:9].T.reshape(L, 3, 3)), np.asarray(Hll), rtol=1e-3, atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(HllT[9:].T), np.asarray(bl), rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(HplT[:, :nh].T.reshape(nh, 6, 3)), np.asarray(Hpl), rtol=1e-3, atol=2e-3
        )
        assert float(jnp.abs(HplT[:, nh:]).max()) == 0.0

    @pytest.mark.slow  # heavy sweep: CI slow lane

    def test_solve_matches(self):
        # strong damping keeps the system well-conditioned so the two fp32
        # paths agree elementwise; at tiny lambda single-observation
        # landmarks have cond(Hll)~1e7 and ANY fp32 evaluation-order change
        # is amplified arbitrarily (both paths are equally "right" there —
        # trajectory equality below is the behavioral check).
        e_mxu, e_xla = _engines()
        err_m = e_mxu._residuals_and_chi(e_mxu.state, e_mxu.consts)[:4]
        err_x = e_xla._residuals_and_chi(e_xla.state, e_xla.consts)[:4]
        sys_m = e_mxu._build(e_mxu.state, e_mxu.consts, *err_m)
        sys_x = e_xla._build(e_xla.state, e_xla.consts, *err_x)
        lam = jnp.float32(1.0)
        xp_m, xl_m, ok_m = e_mxu._solve(sys_m, lam, e_mxu.consts)
        xp_x, xl_x, ok_x = e_xla._solve(sys_x, lam, e_xla.consts)
        assert bool(ok_m) and bool(ok_x)
        sp = float(jnp.abs(xp_x).max())
        sl = float(jnp.abs(xl_x).max())
        np.testing.assert_allclose(np.asarray(xp_m), np.asarray(xp_x), rtol=2e-2, atol=1e-3 * sp)
        np.testing.assert_allclose(np.asarray(xl_m), np.asarray(xl_x), rtol=2e-2, atol=1e-3 * sl)

    def test_chi_squares_rows_path(self):
        # regression: the public chiSquared query must work when the rows
        # front end is active (the AoS edge consts are wire dummies there)
        e_mxu, e_xla = _engines()
        a = e_mxu.chi_squares(e_mxu.state)
        b = e_xla.chi_squares(e_xla.state)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    @pytest.mark.slow  # heavy sweep: CI slow lane

    def test_lm_trajectory_matches(self):
        e_mxu, e_xla = _engines()
        r_m = e_mxu.optimize(e_mxu.state, 5)
        r_x = e_xla.optimize(e_xla.state, 5)
        n = min(int(r_m.niters), int(r_x.niters))
        assert n >= 3
        chis_m = np.asarray(r_m.chis)[:n]
        chis_x = np.asarray(r_x.chis)[:n]
        np.testing.assert_allclose(chis_m, chis_x, rtol=5e-3)
        assert chis_m[-1] <= chis_m[0]


class TestMXUPCG:
    """solver="pcg" on the MXU fast path (VERDICT round-1 item 2: the config
    option was silently ignored in the use_mxu branch).  The matrix-free
    matvec (mxu.schur_matvec_rows) must agree with the XLA SchurOperator and
    the full LM trajectory must match the dense-Cholesky path."""

    def _engine(self, solver, **kw):
        prob = synthetic.generate(num_poses=10, num_landmarks=90, seed=5)
        np_, nl = 10, 90
        cams = np.tile(prob.cam, (np_, 1))
        fp = np.zeros(np_, bool)
        fp[prob.fixed_poses] = True
        fl = np.zeros(nl, bool)
        s = build_structure_from_arrays(
            prob.qs, prob.ts, cams, prob.Xws, fp, fl,
            prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
            prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
        )
        k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
        return BlockSolverEngine(
            s, k, BAConfig(dtype=jnp.float32, mxu="interpret", solver=solver, **kw)
        )

    def test_pcg_plans_skip_dense(self):
        e = self._engine("pcg")
        assert e.use_mxu
        assert e.mxu_plans.schur is None  # no triplet planning for PCG

    def test_matvec_matches_xla_operator(self):
        from cuba_tpu.solver import mxu as mxu_mod
        from cuba_tpu.solver import pcg as pcg_mod
        from cuba_tpu.solver import assembly, schur

        e = self._engine("pcg")
        st, cm = e.state, e.consts
        rr = e._residuals_and_chi(st, cm)
        HppT, HllT, HplT = e._build(st, cm, *rr[:4])
        lam = jnp.float32(0.5)
        iv9, W, bscT, g12 = mxu_mod.prepare_factors_mxu(
            HppT, HllT, HplT, lam, e.num_p, e.num_l, e.mxu_plans, cm.mxu,
            interpret=True,
        )
        x = jnp.asarray(np.random.default_rng(0).normal(size=(e.num_p, 6)), jnp.float32)
        y_rows = mxu_mod.schur_matvec_rows(
            HppT, HplT, W, lam, x.T, e.num_p, e.num_l, e.mxu_plans, cm.mxu,
            interpret=True,
        ).T

        # XLA twin on the same system values
        nh = e.structure.n_hpl
        Hpp = HppT[:36].T.reshape(e.num_p, 6, 6)
        Hll = HllT[:9].T.reshape(e.num_l, 3, 3)
        Hpl = HplT[:, :nh].T.reshape(nh, 6, 3)
        Hpp_d = assembly.damp(Hpp, lam)
        Hll_d = assembly.damp(Hll, lam)
        hpl_row = jnp.asarray(e.structure.hpl_row)
        hpl_col = jnp.asarray(e.structure.hpl_col)
        from cuba_tpu.ops import smallmat
        invHll = smallmat.sym3x3_inv(Hll_d)
        Wx = jnp.einsum("kij,kjl->kil", Hpl, invHll[hpl_col])
        op = pcg_mod.SchurOperator(Hpp_d, Hpl, Wx, hpl_row, hpl_col, e.num_p, e.num_l)
        y_ref = op.matvec(x)
        scale = float(jnp.abs(y_ref).max())
        np.testing.assert_allclose(
            np.asarray(y_rows), np.asarray(y_ref), rtol=2e-2, atol=2e-3 * scale
        )

    @pytest.mark.slow  # heavy sweep: CI slow lane

    def test_pcg_lm_trajectory_matches_dense(self):
        e_pcg = self._engine("pcg", pcg_tol=1e-7)
        e_dense = self._engine("dense_cholesky")
        r_p = e_pcg.optimize(e_pcg.state, 5)
        r_d = e_dense.optimize(e_dense.state, 5)
        n = min(int(r_p.niters), int(r_d.niters))
        assert n >= 3
        np.testing.assert_allclose(
            np.asarray(r_p.chis)[:n], np.asarray(r_d.chis)[:n], rtol=5e-3
        )
        assert float(r_p.chis[n - 1]) <= float(r_p.chis[0])


class TestPlanRejection:
    """plan_mxu must reject structures the MXU kernels cannot handle, so the
    engine falls back to the XLA path (VERDICT round-1 weak item 8: the MXU
    branch assumes both P and L active; safety relies on these rejections)."""

    def _structure(self, num_p=24, num_l=200, edges_per_lm=4, scatter=False,
                   fix_all_lm=False, free_poses=None, seed=0):
        rng = np.random.default_rng(seed)
        qs = np.tile(np.array([0.0, 0, 0, 1]), (num_p, 1))
        ts = rng.normal(size=(num_p, 3)) * 0.1
        cams = np.tile(np.array([500.0, 500, 320, 240, 0.1]), (num_p, 1))
        Xws = rng.normal(size=(num_l, 3)) + np.array([0, 0, 5.0])
        fp = np.zeros(num_p, bool)
        fp[0] = True
        if free_poses is not None:
            fp[:] = True
            fp[:free_poses] = False
        fl = np.full(num_l, bool(fix_all_lm))
        mp, ml = [], []
        for lm in range(num_l):
            if scatter:
                ps = rng.choice(num_p, size=min(edges_per_lm, num_p), replace=False)
            else:
                base = (lm * num_p) // num_l
                ps = [(base + k) % num_p for k in range(edges_per_lm)]
            for p in ps:
                mp.append(p)
                ml.append(lm)
        mp = np.asarray(mp, np.int32)
        ml = np.asarray(ml, np.int32)
        mz = rng.normal(size=(len(mp), 2)) * 10 + np.array([320.0, 240])
        mw = np.ones(len(mp))
        e = np.zeros((0,), np.int32)
        return build_structure_from_arrays(
            qs, ts, cams, Xws, fp, fl, mp, ml, mz, mw,
            e, e, np.zeros((0, 3)), np.zeros(0),
        )

    def _plan(self, s):
        from cuba_tpu.solver import mxu as mxu_mod
        from cuba_tpu.solver.engine import _pad_blocks

        plans, consts = mxu_mod.plan_mxu(s, pad_blocks=_pad_blocks(s.num_p))
        return plans

    def test_rejects_pose_only(self):
        s = self._structure(fix_all_lm=True)
        assert s.num_l == 0
        assert not self._plan(s).ok

    def test_rejects_landmark_only(self):
        s = self._structure(free_poses=0)
        assert s.num_p == 0
        assert not self._plan(s).ok

    def test_rejects_scattered_covisibility(self):
        s = self._structure(num_p=100, num_l=800, edges_per_lm=6, scatter=True)
        assert not self._plan(s).ok

    def test_engine_falls_back_when_plan_rejected(self):
        s = self._structure(num_p=100, num_l=800, edges_per_lm=6, scatter=True)
        k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
        e = BlockSolverEngine(s, k, BAConfig(dtype=jnp.float32, mxu="on"))
        assert not e.use_mxu
        res = e.optimize(None, 3)
        chis = np.asarray(res.chis)[: int(res.niters)]
        assert chis[-1] < chis[0]

    def test_bad_pad_blocks_raises(self):
        from cuba_tpu.solver import mxu as mxu_mod

        s = self._structure()
        with pytest.raises(ValueError, match="multiple of 128"):
            mxu_mod.plan_mxu(s, pad_blocks=59)
