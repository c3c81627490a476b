"""Large-landmark-axis stress (VERDICT r3 #9): >= 1M landmarks single chip.

The BAL/Venice regime SURVEY's PCG row targets is millions of landmarks —
everything that scales with L and E (per-edge pads, hpl tables, the rows
front end, the triplet stream) gets exercised here.  Reports the memory
plan: host-side symbolic sizes, device wire size, per-array HBM footprints
of the dominant [D, E]/[D, n_hpl] tables, and live HBM after optimize.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/stress_large_l.py
     [--landmarks 1000000] [--poses 1778] [--mean-obs 5.0] [--solver auto]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", type=int, default=1_000_000)
    ap.add_argument("--poses", type=int, default=1778)
    ap.add_argument("--mean-obs", type=float, default=5.0)
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

    nP, nL = args.poses, args.landmarks
    t0 = time.perf_counter()
    prob = synthetic.generate(
        num_poses=nP, num_landmarks=nL,
        mean_obs_per_landmark=args.mean_obs, stereo_fraction=0.25, seed=0,
    )
    nE = prob.mono_p.size + prob.stereo_p.size
    print(f"generate: {time.perf_counter()-t0:.1f}s  "
          f"{nP} P / {nL} L / {nE} E")

    cams = np.tile(prob.cam, (nP, 1))
    fixed_p = np.zeros(nP, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(nL, bool)
    t0 = time.perf_counter()
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    t_struct = time.perf_counter() - t0
    print(f"structure: {t_struct:.1f}s  n_hpl={s.n_hpl} "
          f"n_hsc={s.n_hsc} n_tri={s.mul_i.size}")

    kernels = ((robust.HUBER, float(np.sqrt(5.991))),
               (robust.HUBER, float(np.sqrt(7.815))))
    t0 = time.perf_counter()
    eng = BlockSolverEngine(
        s, kernels, BAConfig(dtype=jnp.float32, solver=args.solver))
    t_ctor = time.perf_counter() - t0
    plans = eng.mxu_plans
    print(f"ctor: {t_ctor:.1f}s  use_mxu={eng.use_mxu} "
          f"rows={getattr(eng, 'use_rows', None)} solver={eng.solver} "
          f"band_m={eng.band_m} "
          f"{'wg=%d e_pad=%d/%d hpl_pad=%d' % (plans.wg, plans.e_pad_m, plans.e_pad_s, plans.hpl_pad) if plans else 'XLA path'}")

    # dominant device arrays (the memory plan)
    if plans:
        rows = [
            ("W [18, hpl_pad]", 18 * plans.hpl_pad * 4),
            ("HplT [18, hpl_pad]", 18 * plans.hpl_pad * 4),
            ("HllT [9, n_l_pad]", 9 * ((eng.num_l + 127) // 128 * 128) * 4),
            ("edge packs [~30, e_pad]", 30 * (plans.e_pad_m + plans.e_pad_s) * 4),
            ("schur_fused out [36, C*kwin]",
             36 * plans.schur.num_chunks * plans.schur.kwin * 4
             if plans.schur is not None and plans.schur.ok else 0),
        ]
        for name, b in rows:
            print(f"  {name}: {b/1e9:.2f} GB" if b > 1e8 else
                  f"  {name}: {b/1e6:.1f} MB")

    t0 = time.perf_counter()
    res = eng.optimize(eng.state, args.iters)
    chis = np.asarray(res.chis)
    t_opt_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = eng.optimize(eng.state, args.iters)
    chis = np.asarray(res.chis)
    t_opt = time.perf_counter() - t0
    print(f"optimize({args.iters}): cold {t_opt_cold:.1f}s warm {t_opt:.2f}s "
          f"nattempts={int(res.nattempts)}")
    print(f"chi: {chis[0]:.4g} -> {chis[chis > 0][-1]:.4g}")
    try:
        ms = jax.devices()[0].memory_stats()
        print(f"HBM: peak {ms.get('peak_bytes_in_use', 0)/2**30:.2f} GiB / "
              f"limit {ms.get('bytes_limit', 0)/2**30:.2f} GiB")
    except Exception as e:
        print("memory_stats unavailable:", e)
    assert np.all(np.isfinite(chis[chis != 0])), "non-finite chi"
    assert chis[chis > 0][-1] < chis[0], "no descent"
    print("STRESS OK")


if __name__ == "__main__":
    main()
