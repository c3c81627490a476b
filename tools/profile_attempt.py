"""Amortized per-stage attribution of one LM attempt on the band path.

Each stage is timed as a jitted fori_loop of REPS calls with a live data
dependency threaded through state (docs/PERF_NOTES.md methodology: the
serving tunnel's ~30-50ms dispatch latency drowns single-call timings).

Usage: python tools/profile_attempt.py [--quick] [--reps 20]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--solver", default="auto")
    ap.add_argument("--loop-closures", action="store_true",
                    help="closed-loop covisibility (the kitti00 headline shape)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
    from cuba_tpu.solver import band_cr, mxu
    from cuba_tpu.solver.engine import BlockSolverEngine, State
    from cuba_tpu.solver.structure import build_structure_from_arrays

    if args.quick:
        n_poses, n_lms, mean_obs = 248, 26127, 4.65
    else:
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
    config = BAConfig(dtype=jnp.float32, solver=args.solver)
    eng = BlockSolverEngine(s, kernels, config)
    print(f"solver={eng.solver} band_m={eng.band_m} pad_blocks={eng.pad_blocks} "
          f"v2={eng.mxu_plans.v2 if eng.mxu_plans else None}")
    st, co = eng.state, eng.consts
    REPS = args.reps
    lam0 = jnp.float32(1e-3)

    def timed(name, make_loop):
        f = jax.jit(make_loop)
        out = f(st, co)  # compile
        jax.block_until_ready(out)
        float(np.asarray(out.ravel()[0]))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = f(st, co)
            float(np.asarray(out.ravel()[0]))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:32s}: {best*1e3:8.2f} ms")
        return best

    def perturb(state, c):
        return State(state.qs + c * 1e-30, state.ts, state.Xws)

    # stage 1: residual rows + chi
    def l_resid(st, co):
        def step(i, c):
            *_, chi = eng._residuals_and_chi(perturb(st, c), co)
            return (chi * 1e-30).astype(jnp.float32).reshape(1)[:1]
        return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))

    # stage 2: resid + build
    def l_build(st, co):
        def step(i, c):
            r = eng._residuals_and_chi(perturb(st, c), co)
            sys = eng._build(st, co, r[0], r[1], r[2], r[3])
            leaf = jax.tree_util.tree_leaves(sys)[0]
            return leaf.ravel()[:1] * 1e-30
        return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))

    # full attempt pieces, each building on the previous chain
    def chain(upto):
        def fn(st, co):
            def step(i, c):
                r = eng._residuals_and_chi(perturb(st, c), co)
                sys = eng._build(st, co, r[0], r[1], r[2], r[3])
                HppT, HllT, HplT = sys
                plans, mc = eng.mxu_plans, co.mxu
                iv9, W, bscT, g12 = mxu.prepare_factors_mxu(
                    HppT, HllT, HplT, lam0, eng.num_p, eng.num_l, plans, mc)
                if upto == "prepare":
                    return bscT.ravel()[:1] * 1e-30
                Db, Ub = mxu.schur_band_mxu(
                    HppT, W, HplT, lam0, eng.num_p, eng.pad_blocks,
                    plans, mc, eng.dtype)
                if upto == "schur_band":
                    return Db.ravel()[:1] * 1e-30
                n = 6 * eng.pad_blocks
                rhs = jnp.zeros(n, eng.dtype).at[: 6 * eng.num_p].set(
                    bscT.T.reshape(-1))
                x, ok = band_cr.cr_solve(Db, Ub, rhs,
                                         eng.config.refinement_steps)
                if upto == "cr_solve":
                    return x[:1] * 1e-30
                xp = x[: 6 * eng.num_p].reshape(eng.num_p, 6)
                xl = mxu.back_substitute_mxu(
                    iv9, HllT, HplT, g12, xp, eng.num_l, plans, mc)
                if upto == "backsub":
                    return xl.ravel()[:1] * 1e-30
                trial = eng._apply_update(st, xp, xl)
                Fhat = eng._chi_only(trial, co)
                return (Fhat * 1e-30).astype(jnp.float32).reshape(1)[:1]
            return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))
        return fn

    t_resid = timed("resid+chi", l_resid)
    t_build = timed("resid+build", l_build)
    t_prep = timed("..+prepare_factors", chain("prepare"))
    t_band = timed("..+schur_band", chain("schur_band"))
    t_cr = timed("..+cr_solve", chain("cr_solve"))
    t_bs = timed("..+backsub", chain("backsub"))
    t_full = timed("..+apply+trial_chi (full attempt)", chain("full"))
    print("--- marginal costs ---")
    print(f"build          {1e3*(t_build - t_resid):8.2f} ms")
    print(f"prepare        {1e3*(t_prep - t_build):8.2f} ms")
    print(f"schur_band     {1e3*(t_band - t_prep):8.2f} ms")
    print(f"cr_solve       {1e3*(t_cr - t_band):8.2f} ms")
    print(f"backsub        {1e3*(t_bs - t_cr):8.2f} ms")
    print(f"apply+chi      {1e3*(t_full - t_bs):8.2f} ms")


if __name__ == "__main__":
    main()
