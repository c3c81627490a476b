"""Large-P solver crossover benchmark: dense Cholesky vs band CR vs PCG.

The dense reduced solver (solver/dense_cholesky.py) is O(PB^2) memory /
O(PB^3) FLOPs and wins at small scales; band cyclic reduction
(solver/band_cr.py) is O(n) for band-certified odometry graphs; the
matrix-free block-Jacobi PCG (mxu.pcg_solve_rows) is O(n_hpl) per matvec
and covers large problems whose structure is NOT banded — together they
span the regime the reference covers with sparse Cholesky + METIS
(reference: src/cuda_linear_solver.cpp:147-232, :342-348).  This script
measures all three on the same pose-heavy synthetic problems and reports
the dense->scalable crossover.

Usage:  python tools/bench_pcg_crossover.py [--scales 2048,4096,8192,16384]
Prints one JSON line per (P, solver) and a final summary line.  Results are
recorded in docs/PERF_NOTES.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(num_p, num_l, mean_obs, solver, iters, trials):
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeated sweeps skip the remote compile
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
    from cuba_tpu.solver.engine import BlockSolverEngine
    from cuba_tpu.solver.structure import build_structure_from_arrays

    # gentler initialization noise than the kitti00 bench default: at
    # P >= 4096 the accumulated trajectory drift otherwise starts LM so far
    # from the basin that fp32 rejects the first steps and chi2 stalls —
    # the solver comparison needs accepted steps to be meaningful
    prob = synthetic.generate(
        num_poses=num_p, num_landmarks=num_l,
        mean_obs_per_landmark=mean_obs, stereo_fraction=0.25, seed=0,
        init_rot_noise=0.002, init_trans_noise=0.02, init_point_noise=0.04,
    )
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
    cfg = BAConfig(dtype=jnp.float32, solver=solver)
    nedges = prob.mono_p.size + prob.stereo_p.size

    # warm-up (compile), then min-of-trials like bench.py
    engine = BlockSolverEngine(s, k, cfg)
    res = jax.block_until_ready(engine.optimize(None, iters))
    chis = np.asarray(res.chis)[: int(res.niters)]
    elapsed = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        engine = BlockSolverEngine(s, k, cfg)
        res = engine.optimize(None, iters)
        _ = int(res.niters)
        elapsed = min(elapsed, time.perf_counter() - t0)
    return dict(
        P=num_p, L=num_l, E=int(nedges), solver=solver,
        use_mxu=bool(engine.use_mxu), iters=iters,
        wall_s=round(elapsed, 4),
        chi0=float(chis[0]), chiN=float(chis[-1]),
        descended=bool(chis[-1] < chis[0]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="2048,4096,8192,16384")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--lm-per-pose", type=float, default=15.0)
    args = ap.parse_args()

    rows = []
    for p in [int(x) for x in args.scales.split(",")]:
        nl = int(p * args.lm_per_pose)
        for solver in ("dense_cholesky", "band_cr", "pcg"):
            try:
                r = run_one(p, nl, 5.0, solver, args.iters, args.trials)
            except Exception as e:  # dense OOMs past its documented ceiling
                r = dict(P=p, L=nl, solver=solver,
                         error=f"{type(e).__name__}: {str(e)[:120]}")
            rows.append(r)
            print(json.dumps(r), flush=True)

    # crossover: smallest P where a scalable solver beats dense (or dense fails)
    cross = None
    for p in sorted({r["P"] for r in rows}):
        d = next(r for r in rows if r["P"] == p and r["solver"] == "dense_cholesky")
        best = min(
            (r["wall_s"] for r in rows
             if r["P"] == p and r["solver"] != "dense_cholesky" and "wall_s" in r),
            default=float("inf"),
        )
        if "error" in d or best < d.get("wall_s", float("inf")):
            cross = p
            break
    print(json.dumps({"summary": "solver_crossover",
                      "first_P_where_scalable_beats_dense": cross}))


if __name__ == "__main__":
    main()
