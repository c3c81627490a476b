#!/usr/bin/env python
"""Compare the TPU engine against the independent NumPy/SciPy reference
solver on the same graph — the analogue of the reference's g2o comparison
(reference: samples/sample_comparison_with_g2o.cpp:43-308): identical graph
into both optimizers, per-iteration chi2 side by side, and RMSE between the
final rotation/translation/landmark estimates.

Usage:  python samples/sample_comparison_with_reference.py [graph.json]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("graph", nargs="?", help="graph JSON (reference format)")
    ap.add_argument("--poses", type=int, default=20)
    ap.add_argument("--landmarks", type=int, default=300)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # parity runs in fp64

    from cuba_tpu import EdgeType, RobustKernelType
    from cuba_tpu.io import json_io, synthetic
    from cuba_tpu.reference.solver import RefProblem, ReferenceSolver

    if args.graph:
        ba = json_io.read_graph(args.graph)
    else:
        prob = synthetic.generate(num_poses=args.poses, num_landmarks=args.landmarks, seed=0)
        ba = synthetic.build_graph(prob)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(7.815)), EdgeType.STEREO)

    ba.initialize()
    ref = ReferenceSolver(RefProblem.from_structure(ba._engine.structure, ba._kernels))

    ba.optimize(args.iters)
    chis_tpu = [s.chi2 for s in ba.batch_statistics()]
    chis_ref = ref.optimize(args.iters)

    print(f"{'iter':>4} | {'chi2 (cuba_tpu)':>18} | {'chi2 (numpy ref)':>18} | {'rel diff':>10}")
    for i in range(min(len(chis_tpu), len(chis_ref))):
        rel = abs(chis_tpu[i] - chis_ref[i]) / abs(chis_ref[i])
        print(f"{i:4d} | {chis_tpu[i]:18.4f} | {chis_ref[i]:18.4f} | {rel:10.2e}")

    s = ba._engine.structure
    qs_t = np.asarray(ba._state.qs)[: s.num_p]
    ts_t = np.asarray(ba._state.ts)[: s.num_p]
    Xw_t = np.asarray(ba._state.Xws)[: s.num_l]
    print("=== estimate RMSE (cuba_tpu vs reference) ===")
    print(f"rotation   : {np.sqrt(np.mean((qs_t - ref.p.qs[:s.num_p]) ** 2)):.3e}")
    print(f"translation: {np.sqrt(np.mean((ts_t - ref.p.ts[:s.num_p]) ** 2)):.3e}")
    print(f"landmark   : {np.sqrt(np.mean((Xw_t - ref.p.Xws[:s.num_l]) ** 2)):.3e}")


if __name__ == "__main__":
    main()
