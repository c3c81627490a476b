"""Sharded-PCG vs replicated-band crossover for the multi-chip scaling model.

The round-4 scaling model (docs/PERF_NOTES.md) asserts the replicated band
solve (compact_to_band + cyclic reduction) is the Amdahl term past S~8 and
that large meshes should ride the sharded PCG instead.  This script MEASURES
the three quantities that model needs on the real chip (S=1):

  t_form   — schur_compact_mxu (shardable: psum'd compact table)
  t_band   — band_from_compact + cr_solve (replicated on every device)
  t_pcg    — pcg_solve_rows end-to-end, and its CG step count n_cg
             (shardable except the per-step ICI latency chain)

and prints the modeled per-attempt solve cost vs S for both paths:

  band(S) = t_form/S + t_band
  pcg(S)  = (t_pcg - n_cg*t_lat)/S + n_cg*t_lat     t_lat ~ 20 us ICI+launch

Usage: python tools/bench_pcg_band_mc.py [--reps 20] [--loop-closures]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T_LAT_US = 20.0  # per-CG-step replicated latency (ICI ~5us + launch ~15us)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--loop-closures", action="store_true", default=True)
    ap.add_argument("--no-loop-closures", dest="loop_closures", action="store_false")
    ap.add_argument("--pcg-tol", type=float, default=None,
                    help="override BAConfig.pcg_tol (1e-10 parity-grade; "
                    "1e-4 is the practical inexact-Newton setting)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
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
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p, np.zeros(n_lms, bool),
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    kernels = ((robust.HUBER, float(np.sqrt(5.991))),
               (robust.HUBER, float(np.sqrt(7.815))))
    eng = BlockSolverEngine(s, kernels, BAConfig(dtype=jnp.float32))
    st, co = eng.state, eng.consts
    plans, mc = eng.mxu_plans, co.mxu
    PB = eng.pad_blocks
    lam0 = jnp.float32(1e-3)
    REPS = args.reps
    cfg = eng.config
    pcg_tol = cfg.pcg_tol if args.pcg_tol is None else args.pcg_tol

    @jax.jit
    def inputs(st, co):
        r = eng._residuals_and_chi(st, co)
        sys_ = eng._build(st, co, r[0], r[1], r[2], r[3])
        HppT, HllT, HplT = sys_
        iv9, W, bscT, g12 = mxu.prepare_factors_mxu(
            HppT, HllT, HplT, lam0, eng.num_p, eng.num_l, plans, mc)
        rhs = jnp.zeros(6 * PB, jnp.float32).at[: 6 * eng.num_p].set(
            bscT.T.reshape(-1))
        return HppT, HllT, HplT, W, bscT, rhs

    HppT, HllT, HplT, W, bscT, rhs = jax.block_until_ready(inputs(st, co))

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        float(np.asarray(out.ravel()[0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*xs)
            float(np.asarray(out.ravel()[0]))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:34s}: {best*1e3:8.2f} ms", flush=True)
        return best

    def loop(body):
        def fn(*xs):
            def step(i, c):
                out = body(*((xs[0] + c * 1e-30,) + xs[1:]))
                return out.ravel()[:1] * 1e-30
            return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))
        return fn

    # shardable formation half (psum'd compact table in the mesh engine)
    def f_form(W, HplT):
        return mxu.schur_compact_mxu(W, HplT, plans, mc)
    t_form = timed("schur_compact (shardable)", loop(f_form), W, HplT)

    # replicated half: band materialization + CR factor/solve
    def f_band(W, HplT, HppT, rhs):
        Db, Ub = mxu.schur_band_mxu(HppT, W, HplT, lam0, eng.num_p, PB,
                                    plans, mc, jnp.float32)
        x, _ok = band_cr.cr_solve(Db, Ub, rhs, 1)
        return x
    t_band_all = timed("band+CR (form incl.)", loop(f_band), W, HplT, HppT, rhs)
    t_band = max(t_band_all - t_form, 1e-6)  # replicated share

    # PCG end-to-end + step count
    def f_pcg(W, HplT, HppT):
        bT = HppT[36:42]
        x, _ok = mxu.pcg_solve_rows(
            HppT, HplT, W, lam0, bT, eng.num_p, eng.num_l, plans, mc,
            cfg.pcg_max_iterations, pcg_tol)
        return x
    t_pcg = timed("pcg_solve_rows (all)", loop(f_pcg), W, HplT, HppT)

    @jax.jit
    def pcg_iters(W, HplT, HppT):
        bT = HppT[36:42]
        _x, ok, k = mxu.pcg_solve_rows(
            HppT, HplT, W, lam0, bT, eng.num_p, eng.num_l, plans, mc,
            cfg.pcg_max_iterations, pcg_tol, with_iters=True)
        return ok, k
    ok, n_cg = jax.block_until_ready(pcg_iters(W, HplT, HppT))
    n_cg = int(n_cg)
    print(f"pcg converged={bool(ok)} n_cg={n_cg} "
          f"(cap {cfg.pcg_max_iterations}, tol {pcg_tol})", flush=True)

    t_lat = T_LAT_US * 1e-6
    rep_pcg = n_cg * t_lat
    print(f"\nmodel: band(S) = {t_form*1e3:.2f}/S + {t_band*1e3:.2f} ms ; "
          f"pcg(S) = {(t_pcg - rep_pcg)*1e3:.2f}/S"
          f" + {rep_pcg*1e3:.2f} ms  (t_lat {T_LAT_US:.0f} us/step)")
    print(f"{'S':>4} {'band ms':>9} {'pcg ms':>9} {'winner':>7}")
    cross = None
    for S in (1, 2, 4, 8, 16, 32, 64, 128):
        b = t_form / S + t_band
        p = (t_pcg - rep_pcg) / S + rep_pcg
        w = "band" if b <= p else "pcg"
        if cross is None and p < b:
            cross = S
        print(f"{S:>4} {b*1e3:>9.2f} {p*1e3:>9.2f} {w:>7}")
    print(f"\ncrossover: sharded PCG beats the replicated band solve from "
          f"S = {cross if cross else '>128'}")


if __name__ == "__main__":
    main()
