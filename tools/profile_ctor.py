"""Time the engine-constructor sub-phases at kitti00 scale on the chip.

Replicates BlockSolverEngine.__init__'s step order with host timers so the
ctor wall (bench.py's second component) can be attributed: early pack,
early dispatch, plan_mxu, main pack, main dispatch, materialize.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
    from cuba_tpu.solver import mxu
    from cuba_tpu.solver.engine import BlockSolverEngine, _pack_group, _narrow16
    from cuba_tpu.solver.structure import build_structure_from_arrays

    n_poses, n_lms, mean_obs = 1322, 133383, 5.5
    prob = synthetic.generate(
        num_poses=n_poses, num_landmarks=n_lms,
        mean_obs_per_landmark=mean_obs, stereo_fraction=0.25, seed=0,
    )
    cams = np.tile(prob.cam, (n_poses, 1))
    fixed_p = np.zeros(n_poses, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(n_lms, bool)

    def build():
        return build_structure_from_arrays(
            prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
            prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
            prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
        )

    kernels = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    config = BAConfig(dtype=jnp.float32)

    # warm-up (compile everything)
    s = build()
    eng = BlockSolverEngine(s, kernels, config)
    r = jax.block_until_ready(eng.optimize(None, 10))
    _ = int(r.niters)

    for trial in range(3):
        t = {}
        t0 = time.perf_counter()
        s = build()
        t["structure"] = time.perf_counter() - t0

        # --- replicate ctor steps with timers ---
        t0 = time.perf_counter()
        gm, gs = mxu.guess_e_pads(s)
        sc_early = mxu.plan_schur_for(s)
        t["plan_schur"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        fl = mxu.rows_float_arrays(s, gm, gs)
        t["rows_float"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        eitems = [
            ("qs", np.asarray(s.qs, np.float32), 0),
            ("ts", np.asarray(s.ts, np.float32), 0),
            ("Xws", np.asarray(s.Xws, np.float32), 0),
            ("cams", np.asarray(s.cams, np.float32), 0),
            ("measT_m", fl["measT_m"], 0),
            ("measT_s", fl["measT_s"], 0),
            ("omegaT_m", fl["omegaT_m"], 0),
            ("omegaT_s", fl["omegaT_s"], 0),
        ] + [
            (name, _narrow16(a), pv)
            for name, (a, pv) in mxu.early_int_arrays(s, gm, gs, sc_early).items()
        ]
        t["early_items"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        eblob, emeta = _pack_group([(n, a) for n, a, _pv in eitems])
        t["early_pack"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        deb = jax.device_put(eblob)
        t["early_put_enqueue"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        plans, mxu_consts = mxu.plan_mxu(s, 1408, need_dense=True, sc=sc_early)
        t["plan_mxu"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        jax.block_until_ready(deb)
        t["early_put_wait"] = time.perf_counter() - t0

        # full ctor (includes all of the above again) for the reference total
        t0 = time.perf_counter()
        eng = BlockSolverEngine(s, kernels, config)
        t["FULL_ctor"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = eng.optimize(None, 10)
        _ = int(r.niters)
        t["optimize10"] = time.perf_counter() - t0

        print(f"trial {trial}: " + "  ".join(f"{k}={v*1e3:.0f}ms" for k, v in t.items()))


if __name__ == "__main__":
    main()
