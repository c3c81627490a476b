#!/usr/bin/env python
"""Multi-chip bundle adjustment through the public API.

The reference is single-GPU (SURVEY.md §2 — its only parallelism is
per-edge CUDA threads); this sample demonstrates the TPU scaling
extension: pass ``BAConfig(mesh=...)`` and the same ``BundleAdjustment``
surface runs landmark-sharded over a `jax.sharding.Mesh` — per-shard MXU
assembly inside `shard_map`, psum-reduced Schur tables over ICI, and the
full solver family (band CR / dense / CR+Woodbury / sharded PCG).

On a machine without multiple TPU chips, run on virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python samples/sample_multichip.py --devices 8

Usage:  python samples/sample_multichip.py [--devices N] [--poses P]
        [--landmarks L] [--iters K] [--solver auto|pcg|...]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size (default: all available devices)")
    ap.add_argument("--poses", type=int, default=60)
    ap.add_argument("--landmarks", type=int, default=1200)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--solver", default="auto",
                    choices=["auto", "dense_cholesky", "band_cr", "band_lr", "pcg"])
    args = ap.parse_args()

    import os

    import jax

    # some TPU plugins win over the JAX_PLATFORMS env var; honor an explicit
    # cpu request via the config (must run before any jax op)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from cuba_tpu import BAConfig, EdgeType, RobustKernelType
    from cuba_tpu.io import synthetic
    from cuba_tpu.parallel.sharding import AXIS

    n_dev = args.devices or len(jax.devices())
    if len(jax.devices()) < n_dev:
        raise SystemExit(
            f"need {n_dev} devices, have {len(jax.devices())} — on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))
    print(f"mesh: {n_dev}x {jax.devices()[0].platform} over axis '{AXIS}'")

    prob = synthetic.generate(
        num_poses=args.poses, num_landmarks=args.landmarks, seed=1
    )
    ba = synthetic.build_graph(prob, config=BAConfig(mesh=mesh, solver=args.solver))
    ba.set_robust_kernels(
        RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR
    )
    ba.set_robust_kernels(
        RobustKernelType.HUBER, float(np.sqrt(7.815)), EdgeType.STEREO
    )

    ba.initialize()
    ba.optimize(1)  # warm-up (JIT compile, matching the reference sample)
    ba.initialize()
    t0 = time.perf_counter()
    ba.optimize(args.iters)
    wall = time.perf_counter() - t0
    eng = ba._engine._mc
    print(f"solver resolved: {eng.solver}  "
          f"mxu={'on' if eng.mxu_sp is not None else 'off (XLA body)'}")
    print(f"optimize({args.iters}): {wall:.3f}s")
    for s in ba.batch_statistics():
        print(f"  iteration {s.iteration}: chi2 = {s.chi2:.2f}")


if __name__ == "__main__":
    main()
