#!/usr/bin/env python
"""Run bundle adjustment on a BAL-format problem file.

Loads any problem from the public "Bundle Adjustment in the Large"
collection (grail.cs.washington.edu/projects/bal — e.g.
problem-49-7776-pre.txt.bz2 decompressed to .txt, or gzipped), converts
it to the +z pinhole model (see cuba_tpu/io/bal.py), optimizes, and
prints the per-iteration chi2 and reprojection RMSE.

The reference framework has no BAL pathway (its sample loads
cv::FileStorage JSON, reference: samples/sample_ba_from_file.cpp:91-164);
this extends the same engine to the standard public benchmark corpus.

Usage:  python samples/sample_bal.py data/bal_toy.txt.gz [--iters 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("problem", nargs="?", default="data/bal_toy.txt.gz")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--huber", type=float, default=0.0, help="Huber delta (0 = off)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cuba_tpu import EdgeType, RobustKernelType
    from cuba_tpu.io import bal

    def load():
        ba = bal.read_bal(args.problem)
        if args.huber > 0:
            ba.set_robust_kernels(RobustKernelType.HUBER, args.huber, EdgeType.MONOCULAR)
        return ba

    ba = load()
    print(f"problem        : {args.problem}")
    print(f"num cameras    : {ba.nposes()}")
    print(f"num points     : {ba.nlandmarks()}")
    print(f"num obs        : {ba.nedges()}")

    # warm-up (JIT compile, excluded from timing; same iteration count as
    # the timed run — the fused LM loop's chi2 buffer is shaped by it)
    ba.initialize()
    ba.optimize(args.iters)

    ba = load()
    t0 = time.perf_counter()
    ba.initialize()
    ba.optimize(args.iters)
    elapsed = time.perf_counter() - t0

    stats = ba.batch_statistics()
    for s in stats:
        print(f"iter {s.iteration:2d}: chi2 = {s.chi2:.3f}")
    n = ba.nedges()
    rmse0 = np.sqrt(stats[0].chi2 / n)
    rmse1 = np.sqrt(stats[-1].chi2 / n)
    print(f"reprojection RMSE: {rmse0:.4f} px -> {rmse1:.4f} px")
    print(f"wall time ({len(stats)} iters): {elapsed:.3f} s")


if __name__ == "__main__":
    main()
