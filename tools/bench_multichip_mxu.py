"""On-chip multichip-MXU vs single-chip comparison (VERDICT r2 ask 5).

Runs the kitti07-scale problem (248 P / 26k L / ~95k E) on the REAL TPU:
  1. single-chip BlockSolverEngine optimize(10)
  2. MultiChipEngine on a 1-device mesh, MXU body (config.mxu default)
  3. MultiChipEngine on a 1-device mesh, XLA body (config.mxu="off")

and reports min-of-N optimize wall for each.  The VERDICT acceptance bar:
the multichip MXU LM step within ~1.2x of the single-chip engine on chip.

Usage: python tools/bench_multichip_mxu.py [--trials 5] [--iters 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--poses", type=int, default=248)
    ap.add_argument("--landmarks", type=int, default=26127)
    ap.add_argument("--mean-obs", type=float, default=4.65)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
    from cuba_tpu.parallel.sharding import AXIS, MultiChipEngine
    from cuba_tpu.solver.engine import BlockSolverEngine
    from cuba_tpu.solver.structure import build_structure_from_arrays

    print("backend:", jax.default_backend(), jax.devices()[:1])
    prob = synthetic.generate(
        num_poses=args.poses, num_landmarks=args.landmarks,
        mean_obs_per_landmark=args.mean_obs, stereo_fraction=0.25, seed=0,
    )
    cams = np.tile(prob.cam, (args.poses, 1))
    fixed_p = np.zeros(args.poses, bool)
    fixed_p[prob.fixed_poses] = True
    structure = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p,
        np.zeros(args.landmarks, bool),
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    kernels = ((robust.HUBER, float(np.sqrt(5.991))),
               (robust.HUBER, float(np.sqrt(7.815))))
    cfg = BAConfig(dtype=jnp.float32)
    print(f"problem: {args.poses} P / {args.landmarks} L / "
          f"{prob.mono_p.size + prob.stereo_p.size} E")

    # --- single chip -----------------------------------------------------
    eng = BlockSolverEngine(structure, kernels, cfg)
    r = eng.optimize(None, args.iters)
    int(r.niters)  # fence
    print(f"single-chip solver={eng.solver} band_m={eng.band_m} "
          f"rows={eng.use_rows}")
    best_s = float("inf")
    for _ in range(args.trials):
        t0 = time.perf_counter()
        r = eng.optimize(None, args.iters)
        int(r.niters)
        best_s = min(best_s, time.perf_counter() - t0)
    chis_s = np.asarray(r.chis)[: int(r.niters)]
    print(f"single-chip optimize({args.iters}): {best_s:.4f}s "
          f"chi2 {chis_s[0]:.1f} -> {chis_s[-1]:.1f}")

    # --- multichip on a 1-device mesh -----------------------------------
    for mode, label in (("auto", "MXU"), ("off", "XLA")):
        mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
        mc = MultiChipEngine(structure, kernels,
                             BAConfig(dtype=jnp.float32, mxu=mode), mesh)
        print(f"multichip[{label}] solver={mc.solver} "
              f"mxu={'yes' if mc.mxu_sp is not None else 'no'}")
        p0 = (mc.problem.qs, mc.problem.ts, mc.problem.Xws)
        chis, *_ = mc.optimize(args.iters)  # warm-up / compile
        best_m = float("inf")
        for _ in range(args.trials):
            mc.problem.qs, mc.problem.ts, mc.problem.Xws = p0
            t0 = time.perf_counter()
            chis, *_ = mc.optimize(args.iters)
            best_m = min(best_m, time.perf_counter() - t0)
        print(f"multichip[{label}] optimize({args.iters}): {best_m:.4f}s "
              f"chi2 {chis[0]:.1f} -> {chis[-1]:.1f}  "
              f"ratio vs single-chip: {best_m / best_s:.2f}x")


if __name__ == "__main__":
    main()
