"""On-chip per-phase profiling of the band path at kitti00 scale.

Uses the engine's phase_calibration (same jitted building blocks as
optimize), plus an amortized whole-LM-run measurement and the attempt
count.  Run on the TPU; respects CUBA_TPU_CR_RSINV for the CR inverse
comparison (docs/PERF_NOTES.md).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--solver", default="auto")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
    from cuba_tpu.solver.engine import BlockSolverEngine
    from cuba_tpu.solver.structure import build_structure_from_arrays

    if args.quick:
        n_poses, n_lms, mean_obs = 248, 26127, 4.65
    else:
        n_poses, n_lms, mean_obs = 1322, 133383, 5.5
    prob = synthetic.generate(
        num_poses=n_poses, num_landmarks=n_lms,
        mean_obs_per_landmark=mean_obs, stereo_fraction=0.25, seed=0,
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
    print(f"solver={eng.solver} band_m={eng.band_m} pad_blocks={eng.pad_blocks}")

    # warm-up/compile
    r = jax.block_until_ready(eng.optimize(None, args.iters))
    print(f"niters={int(r.niters)} nattempts={int(r.nattempts)} "
          f"chi2 {np.asarray(r.chis)[:3]}...")

    # amortized LM run (min of 3, 4-byte fence)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = eng.optimize(None, args.iters)
        _ = int(r.niters)
        best = min(best, time.perf_counter() - t0)
    print(f"optimize({args.iters}) min-of-3: {best*1e3:.1f} ms "
          f"({best*1e3/max(int(r.nattempts),1):.2f} ms/attempt incl fixed)")

    calib = eng.phase_calibration()
    tot = sum(calib.values())
    for k, v in calib.items():
        print(f"  {k:>6s}: {v*1e3:7.2f} ms")
    print(f"  sum per attempt-ish: {tot*1e3:.2f} ms")


if __name__ == "__main__":
    main()
