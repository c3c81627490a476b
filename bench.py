"""Benchmark: kitti_00-scale bundle adjustment, 10 LM iterations.

Mirrors the reference's headline benchmark (reference: README.md:28-38 —
ba_kitti_00: 1322 poses / 133,383 landmarks / 561,116 edges, 10 LM iters,
GTX 1080: 1.23 s).  The reference's KITTI fixture (ba_input.7z) is not in
its checkout, so we generate a synthetic problem with the same vertex/edge
counts and co-visibility structure.

Timed region matches the reference sample (samples/sample_ba_from_file.cpp:
31-75): a warm-up initialize+optimize is run first (JIT compile analogue of
the reference's warm-up), then initialize() + optimize(10) is timed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
the extra fields make the number interpretable without a lab notebook:
  probe_mbps    — 10 MB upload probe bracketing the timed trials (the
                  serving-tunnel weather; ±0.3-0.5 s day-to-day at 40-90
                  MB/s, docs/PERF_NOTES.md)
  rt_ms         — 4-byte readback round-trip latency of the same probe
  structure_s / ctor_s / opt_s — best-trial split of the timed region
  warm_opt_s    — warm-engine optimize(iters) wall (device time + one RTT;
                  excludes the fresh-engine upload/derive tail)
  chi2_final    — final chi2 of the reported trial (also asserted against
                  the recorded fp64 parity band, docs/PARITY_kitti00.md)
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_GPU_SECONDS = 1.23  # kitti_00, reference README.md:38, GTX 1080
BASELINE_GPU_SECONDS_QUICK = 0.23  # kitti_07, reference README.md:37

# Recorded fp64 (XLA path) final chi2 for the exact default bench graphs,
# 10 LM iterations (docs/PARITY_kitti00.md; regenerate with
# tools/parity_kitti00.py).  A descending-but-numerically-wrong fp32 run
# must NOT publish a headline number: the final chi2 has to land within
# REL_BAND of the recorded fp64 value.  The band is wide enough for fp32
# reduction-order noise (measured ~2e-6 rel) and seed-stable LM attempt
# divergence (an extra rejected attempt shifts chi2 ~1e-4 rel), narrow
# enough to reject any real numerics bug (wrong Jacobian/weight/solve
# errors move chi2 by >1e-2 rel at these scales).
CHI2_FP64_FINAL = {
    # (name, iters): final chi2 from the recorded fp64 run
    ("kitti00_scale_loop", 10): 925601.05,
    ("kitti00_scale", 10): 924194.00,
    ("kitti07_scale", 10): 148331.12,
}
CHI2_REL_BAND = 5e-3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="kitti_07-scale instead of kitti_00")
    ap.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--x64",
        default=False,
        action=argparse.BooleanOptionalAction,
        help="global x64 mode — measured +0.2s wall at kitti00 scale with "
        "no accuracy benefit: chi2 accumulation is fp64-grade either way "
        "(chunked fp32/fp64 combine), trajectory matches to ~5e-7 rel",
    )
    # min-of-7: the serving tunnel's per-transfer latency jitter is hundreds
    # of ms and hits structure/ctor/opt independently, and the 1-core host
    # occasionally takes ~1s page-fault stalls in the structure pass; 3
    # trials routinely leave ~0.2s of pure jitter in the minimum
    # (docs/PERF_NOTES.md)
    ap.add_argument("--trials", type=int, default=7)
    ap.add_argument(
        "--solver",
        default="auto",
        choices=["auto", "dense_cholesky", "band_cr", "band_lr", "pcg"],
        help="reduced-system solver (BAConfig.solver)",
    )
    ap.add_argument(
        "--loop-closures",
        default=None,
        action=argparse.BooleanOptionalAction,
        help="closed-circuit trajectory with seam covisibility — the real "
        "KITTI-00 loop-closure shape (reference README.md:101-104), and "
        "therefore the DEFAULT for the kitti00-scale headline (real KITTI-00 "
        "is a closed loop; --no-loop-closures gives the open odometry "
        "variant).  The Schur pattern becomes banded + corner blocks; the "
        "cycle-fold pose ordering re-bands it for the band solver",
    )
    args = ap.parse_args()

    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)
    try:  # persistent compile cache: only speeds the untimed warm-up
        import os

        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
    from cuba_tpu.solver.engine import BlockSolverEngine
    from cuba_tpu.solver.structure import build_structure_from_arrays

    # mean_obs tuned so the generated edge count matches the reference
    # fixture within 0.5% (ba_kitti_07: 95,037 E; ba_kitti_00: 561,116 E)
    if args.quick:
        n_poses, n_lms, mean_obs = 248, 26127, 4.65  # -> 95,149 edges
        name = "kitti07_scale"
        baseline = BASELINE_GPU_SECONDS_QUICK
        if args.loop_closures is None:
            args.loop_closures = False  # kitti07 is an open odometry segment
    else:
        n_poses, n_lms, mean_obs = 1322, 133383, 5.5  # -> 563,279 edges
        name = "kitti00_scale"
        baseline = BASELINE_GPU_SECONDS
        if args.loop_closures is None:
            args.loop_closures = True  # real KITTI-00 is a closed loop

    if args.loop_closures:
        name += "_loop"
    t0 = time.perf_counter()
    prob = synthetic.generate(
        num_poses=n_poses,
        num_landmarks=n_lms,
        mean_obs_per_landmark=mean_obs,
        stereo_fraction=0.25,
        seed=0,
        loop_closure=args.loop_closures,
    )
    nedges = prob.mono_p.size + prob.stereo_p.size
    if args.verbose:
        print(
            f"# generated {n_poses} poses / {n_lms} landmarks / {nedges} edges "
            f"in {time.perf_counter()-t0:.1f}s",
            file=sys.stderr,
        )

    cams = np.tile(prob.cam, (n_poses, 1))
    fixed_p = np.zeros(n_poses, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(n_lms, bool)

    def compile_problem():
        return build_structure_from_arrays(
            prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
            prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
            prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
        )

    kernels = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    config = BAConfig(
        dtype=jnp.float32 if args.dtype == "float32" else jnp.float64,
        solver=args.solver,
    )

    # --- warm-up (JIT compile; reference excludes its warm-up too) -------
    t0 = time.perf_counter()
    structure = compile_problem()
    engine = BlockSolverEngine(structure, kernels, config)
    result = jax.block_until_ready(engine.optimize(None, args.iters))
    warm = time.perf_counter() - t0
    chis_warm = np.asarray(result.chis)[: int(result.niters)]
    if args.verbose:
        print(f"# warm-up (incl. compile): {warm:.2f}s, chi2 {chis_warm[:3]}...", file=sys.stderr)
        print(
            f"# solver={engine.solver} band_m={engine.band_m} "
            f"loop_cols={0 if engine.lr is None else engine.lr['jrows'].size // 6}",
            file=sys.stderr,
        )

    # warm-engine device time: the same optimize(iters) on the already
    # uploaded engine — excludes the fresh-engine upload + derive tail, so
    # the JSON separates "device capability" from "transport"
    warm_opt_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = engine.optimize(None, args.iters)
        int(r.niters)
        warm_opt_s = min(warm_opt_s, time.perf_counter() - t0)

    # --- timed: initialize + upload + optimize(iters) --------------------
    # best of 3: the TPU serving tunnel has multi-hundred-ms latency jitter
    # between runs (docs/PERF_NOTES.md); min-of-repeats is the standard way
    # to report the machine's actual capability
    import gc

    elapsed = float("inf")
    split = (0.0, 0.0, 0.0)
    for trial in range(args.trials):
        gc.collect()  # keep collector pauses out of the timed region
        t0 = time.perf_counter()
        structure = compile_problem()
        t1 = time.perf_counter()
        engine = BlockSolverEngine(structure, kernels, config)
        t2 = time.perf_counter()
        result = engine.optimize(None, args.iters)
        nit = int(result.niters)  # forces completion (4-byte read)
        t3 = time.perf_counter()
        trial_s = t3 - t0
        if args.verbose:
            print(
                f"# trial {trial}: {trial_s:.4f}s ({nit} iters; "
                f"structure {t1-t0:.3f} ctor {t2-t1:.3f} opt+sync {t3-t2:.3f})",
                file=sys.stderr,
            )
        if trial_s < elapsed:
            elapsed = trial_s
            split = (t1 - t0, t2 - t1, t3 - t2)

    chis = np.asarray(result.chis)[: int(result.niters)]
    assert chis.size >= 2 and chis[-1] <= chis[0], f"LM failed to converge: {chis}"
    # correctness gate: descent alone would let a numerically wrong fp32 run
    # publish a perf number — the final chi2 must also land in the recorded
    # fp64 parity band (docs/PARITY_kitti00.md) when this configuration has
    # a recorded value (the default graphs do)
    chi2_final = float(chis[-1])
    ref_chi2 = CHI2_FP64_FINAL.get((name, args.iters))
    if args.solver != "auto":
        # explicit solver experiments legitimately land outside the band
        # (e.g. PCG's inexact solves converge slower per iteration); the
        # recorded values gate the DEFAULT headline configuration only
        if ref_chi2 is not None and args.verbose:
            rel = abs(chi2_final - ref_chi2) / abs(ref_chi2)
            print(f"# chi2 vs fp64 record: rel {rel:.2e} "
                  f"(informational — solver={args.solver})", file=sys.stderr)
        ref_chi2 = None
    if ref_chi2 is not None:
        rel = abs(chi2_final - ref_chi2) / abs(ref_chi2)
        assert rel < CHI2_REL_BAND, (
            f"final chi2 {chi2_final:.2f} is outside the recorded fp64 "
            f"parity band ({ref_chi2:.2f} ± {CHI2_REL_BAND:.0e} rel, "
            f"measured rel {rel:.2e}) — wrong numerics, refusing to "
            f"publish a headline number (docs/PARITY_kitti00.md)"
        )
    elif args.verbose:
        print(f"# no recorded fp64 chi2 for ({name}, {args.iters})", file=sys.stderr)
    if args.verbose:
        print(f"# chi2 trajectory: {chis}", file=sys.stderr)
        print(f"# iterations run: {int(result.niters)}", file=sys.stderr)

    # --- tunnel-weather probe (after the trials so it can't disturb them):
    # 10 MB upload + 4-byte readback, median of 3 — the two numbers that
    # explain wall-clock deltas between sessions (docs/PERF_NOTES.md)
    dev = jax.devices()[0]
    # EXPLICIT float32: a float64 blob is canonicalized host-side to fp32
    # under the default x64-off config, so only half the bytes would cross
    # the wire and the reported MB/s would be ~2x the real tunnel rate
    # (historical probes before round 5 had exactly that bias — comparable
    # to each other, but 2x optimistic in absolute terms)
    blob = np.random.default_rng(0).random(10 * 1024 * 1024 // 4).astype(np.float32)
    ups, rts = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(blob, dev)
        d.block_until_ready()
        ups.append(time.perf_counter() - t0)
        sprobe = jnp.sum(d[:1])
        sprobe.block_until_ready()
        t0 = time.perf_counter()
        float(sprobe)
        rts.append(time.perf_counter() - t0)
        del d
    probe_mbps = blob.nbytes / 1e6 / float(np.median(ups))

    print(
        json.dumps(
            {
                "metric": f"{name}_ba_{args.iters}LM_iters_wall",
                "value": round(elapsed, 4),
                "unit": "s",
                "vs_baseline": round(baseline / elapsed, 3),
                "probe_mbps": round(probe_mbps, 1),
                "rt_ms": round(float(np.median(rts)) * 1e3, 2),
                "structure_s": round(split[0], 4),
                "ctor_s": round(split[1], 4),
                "opt_s": round(split[2], 4),
                "warm_opt_s": round(warm_opt_s, 4),
                "chi2_final": round(chi2_final, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
