#!/usr/bin/env python
"""Run bundle adjustment on a graph JSON file and print the time profile.

Python counterpart of the reference sample (reference:
samples/sample_ba_from_file.cpp:31-75): loads the cv::FileStorage-JSON graph,
does a warm-up initialize+optimize(1) (JIT compile analogue), then runs a
timed initialize + optimize(10) and prints the per-phase profile and
per-iteration chi2.

Usage:  python samples/sample_ba_from_file.py <graph.json> [--iters 10]
        python samples/sample_ba_from_file.py --synthetic [--poses N --landmarks M]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("graph", nargs="?", help="graph JSON (reference format)")
    ap.add_argument("--synthetic", action="store_true", help="use a synthetic problem")
    ap.add_argument("--poses", type=int, default=100)
    ap.add_argument("--landmarks", type=int, default=2000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--profiled",
        action="store_true",
        help="host-stepped driver with exact per-phase timing (slower); "
        "default is the fused device loop + calibrated phase attribution",
    )
    ap.add_argument("--fp64", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.fp64:
        jax.config.update("jax_enable_x64", True)

    from cuba_tpu import EdgeType, RobustKernelType
    from cuba_tpu.io import json_io, synthetic

    def load():
        if args.synthetic or not args.graph:
            prob = synthetic.generate(num_poses=args.poses, num_landmarks=args.landmarks, seed=0)
            return synthetic.build_graph(prob)
        return json_io.read_graph(args.graph)

    ba = load()
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(7.815)), EdgeType.STEREO)
    print(f"num poses      : {ba.nposes()}")
    print(f"num landmarks  : {ba.nlandmarks()}")
    print(f"num edges      : {ba.nedges()}")

    # warm-up (excluded from timing, like the reference sample; same
    # iteration count — the fused loop's chi buffer is shaped by it)
    ba.initialize()
    ba.optimize(1 if args.profiled else args.iters)

    ba = load()
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(7.815)), EdgeType.STEREO)
    t0 = time.perf_counter()
    ba.initialize()
    ba.optimize(args.iters, profile=args.profiled)
    elapsed = time.perf_counter() - t0

    print("=== Time profile ===")
    prof = ba.time_profile()
    attributed = ba.attributed_phases()
    for k, v in prof.items():
        mark = " *" if k in attributed else ""
        print(f"{k:32s}: {1e3 * v:9.1f} ms{mark}")
    print(f"{'Total':32s}: {1e3 * elapsed:9.1f} ms")
    if attributed:
        print(
            "* attributed: the fused device loop is one dispatch, so these "
            "rows split its measured wall time by calibrated per-phase "
            "ratios; run with --profiled for host-timed exact phases"
        )
    print("=== Objective ===")
    for s in ba.batch_statistics():
        print(f"iter {s.iteration:2d}: chi2 = {s.chi2:.1f}")


if __name__ == "__main__":
    main()
