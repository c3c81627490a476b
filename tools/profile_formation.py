"""Amortized attribution of the band-formation sub-stages at kitti00 scale.

Splits schur_band_mxu into schur_fused / band-major combine /
compact_to_band, plus cr_solve sub-pieces (factor vs solve vs refine).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--loop-closures", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust, segmm
    from cuba_tpu.solver import band_cr, mxu
    from cuba_tpu.solver.engine import BlockSolverEngine
    from cuba_tpu.solver.structure import build_structure_from_arrays

    n_poses, n_lms, mean_obs = 1322, 133383, 5.5
    prob = synthetic.generate(
        num_poses=n_poses, num_landmarks=n_lms,
        mean_obs_per_landmark=mean_obs, stereo_fraction=0.25, seed=0,
        loop_closure=args.loop_closures,
    )
    cams = np.tile(prob.cam, (n_poses, 1))
    fixed_p = np.zeros(n_poses, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(n_lms, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    kernels = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    eng = BlockSolverEngine(s, kernels, BAConfig(dtype=jnp.float32))
    st, co = eng.state, eng.consts
    plans, mc = eng.mxu_plans, co.mxu
    REPS = args.reps
    lam0 = jnp.float32(1e-3)
    PB = eng.pad_blocks

    # precompute inputs once
    @jax.jit
    def inputs(st, co):
        r = eng._residuals_and_chi(st, co)
        sys = eng._build(st, co, r[0], r[1], r[2], r[3])
        HppT, HllT, HplT = sys
        iv9, W, bscT, g12 = mxu.prepare_factors_mxu(
            HppT, HllT, HplT, lam0, eng.num_p, eng.num_l, plans, mc)
        Db, Ub = mxu.schur_band_mxu(HppT, W, HplT, lam0, eng.num_p, PB, plans, mc,
                                    jnp.float32)
        rhs = jnp.zeros(6 * PB, jnp.float32).at[: 6 * eng.num_p].set(
            bscT.T.reshape(-1))
        return HppT, HllT, HplT, iv9, W, bscT, g12, Db, Ub, rhs

    HppT, HllT, HplT, iv9, W, bscT, g12, Db, Ub, rhs = jax.block_until_ready(
        inputs(st, co))

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        float(np.asarray(out.ravel()[0]))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = f(*xs)
            float(np.asarray(out.ravel()[0]))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:36s}: {best*1e3:8.2f} ms")
        return best

    def loop(body):
        def fn(*xs):
            def step(i, c):
                out = body(*( (xs[0] + c * 1e-30,) + xs[1:] ))
                return out.ravel()[:1] * 1e-30
            return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))
        return fn

    # 1. schur_fused alone
    def f_fused(W, HplT):
        return segmm.schur_fused(W, HplT, plans.schur, mc.sc_sb, mc.sc_li,
                                 mc.sc_lj, mc.sc_lk)
    t_fused = timed("schur_fused", loop(f_fused), W, HplT)

    # 2. fused + the single band-major combine (= schur_compact_mxu)
    def f_comb(W, HplT):
        return mxu.schur_compact_mxu(W, HplT, plans, mc)
    t_both = t_up2 = timed("fused+combine", loop(f_comb), W, HplT)

    # 4. whole schur_band_mxu
    def f_band(W, HplT, HppT):
        Db, Ub = mxu.schur_band_mxu(HppT, W, HplT, lam0, eng.num_p, PB, plans,
                                    mc, jnp.float32)
        return Db + Ub
    t_band = timed("schur_band_mxu (all)", loop(f_band), W, HplT, HppT)

    # 5. cr factor alone / solve / refines
    def f_factor(Db, Ub):
        lv, base = band_cr.factor(Db, Ub)
        return base
    t_factor = timed("cr factor (no boost loop)", loop(f_factor), Db, Ub)

    for r in (0, 1, 2):
        timed(f"cr_solve refine={r}", loop(
            lambda Db, Ub, rhs, r=r: band_cr.cr_solve(Db, Ub, rhs, r)[0]),
            Db, Ub, rhs)

    import os
    os.environ["CUBA_TPU_CR_RSINV"] = "1"
    timed("cr factor RSINV", loop(f_factor), Db, Ub)
    timed("cr_solve refine=2 RSINV", loop(
        lambda Db, Ub, rhs: band_cr.cr_solve(Db, Ub, rhs, 2)[0]), Db, Ub, rhs)
    os.environ["CUBA_TPU_CR_RSINV"] = "0"

    print(f"marginals: combine={1e3*(t_both-t_fused):.2f} "
          f"compact_to_band~={1e3*(t_band-t_both):.2f}")


if __name__ == "__main__":
    main()
