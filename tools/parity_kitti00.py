"""Headline-scale parity artifact: fp64 engine (XLA path) vs the fp32 MXU
headline configuration on the EXACT default bench graphs.

The reference publishes CPU<->GPU per-iteration chi2 agreement at kitti00
scale, 561k edges (reference: README.md:141-150,176-192).  The committed
kitti07-scale artifact (docs/PARITY_kitti07.md) certifies fp64 parity vs
the independent NumPy/SciPy solver one scale class below the headline; the
scipy solve is impractical at kitti00 scale (415 s at kitti07), so THIS
artifact certifies the exact code path the headline bench number comes
from: engine-fp64 (XLA, CPU backend — bitwise independent of the Pallas
kernels) vs engine-fp32 (MXU, the bench configuration) per-iteration chi2.

Two phases sharing a JSON cache (so each side runs on its natural backend):

    JAX_PLATFORMS=cpu python tools/parity_kitti00.py --phase fp64
    python tools/parity_kitti00.py --phase fp32     # on the TPU chip

`--phase fp64` also prints the CHI2_FP64_FINAL entries bench.py pins its
correctness band to.  `--phase fp32` writes docs/PARITY_kitti00.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CACHE = os.path.join(os.path.dirname(__file__), "..", "docs", "_parity_kitti00_fp64.json")
OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "PARITY_kitti00.md")

# the exact bench.py default shapes (kitti00 headline = loop closure)
SHAPES = {
    "kitti00_scale_loop": dict(num_poses=1322, num_landmarks=133383,
                               mean_obs=5.5, loop=True),
    "kitti00_scale": dict(num_poses=1322, num_landmarks=133383,
                          mean_obs=5.5, loop=False),
    "kitti07_scale": dict(num_poses=248, num_landmarks=26127,
                          mean_obs=4.65, loop=False),
}
NITERS = 10


def _build(shape):
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
    from cuba_tpu.solver.structure import build_structure_from_arrays

    cfg = SHAPES[shape]
    prob = synthetic.generate(
        num_poses=cfg["num_poses"], num_landmarks=cfg["num_landmarks"],
        mean_obs_per_landmark=cfg["mean_obs"], stereo_fraction=0.25,
        seed=0, loop_closure=cfg["loop"],
    )
    np_, nl_ = cfg["num_poses"], cfg["num_landmarks"]
    cams = np.tile(prob.cam, (np_, 1))
    fixed_p = np.zeros(np_, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(nl_, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    kernels = ((robust.HUBER, float(np.sqrt(5.991))),
               (robust.HUBER, float(np.sqrt(7.815))))
    nedges = prob.mono_p.size + prob.stereo_p.size
    return s, kernels, nedges


def _run_engine(s, kernels, dtype):
    import jax
    import jax.numpy as jnp

    from cuba_tpu.config import BAConfig
    from cuba_tpu.solver.engine import BlockSolverEngine

    t0 = time.perf_counter()
    eng = BlockSolverEngine(s, kernels, BAConfig(dtype=dtype))
    r = jax.block_until_ready(eng.optimize(None, NITERS))
    wall = time.perf_counter() - t0
    n = int(r.niters)
    return np.asarray(r.chis, np.float64)[:n], eng, wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["fp64", "fp32"], required=True)
    ap.add_argument("--shapes", nargs="*", default=list(SHAPES))
    args = ap.parse_args()

    import jax

    if args.phase == "fp64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    if args.phase == "fp64":
        cache = {}
        if os.path.exists(CACHE):
            cache = json.load(open(CACHE))
        for shape in args.shapes:
            s, kernels, nedges = _build(shape)
            chis, eng, wall = _run_engine(s, kernels, jnp.float64)
            cache[shape] = {
                "chis": [float(c) for c in chis],
                "nedges": int(nedges),
                "solver": eng.solver,
                "backend": jax.default_backend(),
                "date": time.strftime("%Y-%m-%d"),
                "niters": NITERS,
            }
            print(f"# {shape}: fp64 {len(chis)} iters in {wall:.0f}s, "
                  f"final chi2 {chis[-1]:.2f}")
        json.dump(cache, open(CACHE, "w"), indent=1)
        print("\n# bench.py CHI2_FP64_FINAL entries:")
        for shape, rec in cache.items():
            print(f'    ("{shape}", {rec["niters"]}): {rec["chis"][-1]:.2f},')
        return 0

    # --phase fp32: the headline MXU configuration on the real chip
    if not os.path.exists(CACHE):
        print(f"run --phase fp64 first (missing {CACHE})", file=sys.stderr)
        return 2
    cache = json.load(open(CACHE))
    lines = [
        "# kitti00-scale parity: fp32 MXU headline path vs fp64 XLA engine",
        "",
        f"Generated by `tools/parity_kitti00.py` ({time.strftime('%Y-%m-%d')}).",
        "",
        "The fp64 side runs the XLA (non-Pallas) path on the CPU backend in",
        "x64 mode — numerically independent of every Pallas kernel and of",
        "TPU matmul precision.  The fp32 side is the EXACT headline bench",
        "configuration (MXU one-hot kernels, band/CR solvers, bf16x3",
        "matmul splits) on the TPU chip.  Agreement certifies the code path",
        "the BENCH_r05 number is produced by (reference analogue:",
        "README.md:141-150 publishes CPU<->GPU chi2 at this scale).",
        "",
    ]
    worst = 0.0
    ok = True
    for shape in args.shapes:
        if shape not in cache:
            print(f"no fp64 record for {shape}", file=sys.stderr)
            return 2
        s, kernels, nedges = _build(shape)
        chis32, eng, wall = _run_engine(s, kernels, jnp.float32)
        rec = cache[shape]
        chis64 = np.asarray(rec["chis"])
        n = min(chis32.size, chis64.size)
        rel = np.abs(chis32[:n] - chis64[:n]) / np.abs(chis64[:n])
        worst = max(worst, float(rel.max()))
        shape_ok = bool(n >= 5 and np.all(rel < 5e-3))
        ok = ok and shape_ok
        lines += [
            f"## {shape} ({nedges} edges, {NITERS} LM iterations)",
            "",
            f"fp64: solver={rec['solver']} on {rec['backend']}"
            f" ({rec['date']}); fp32 MXU: solver={eng.solver} on"
            f" {jax.default_backend()}, {wall:.1f}s wall incl. compile.",
            "",
            "| iter | fp32 MXU chi2 | fp64 XLA chi2 | rel diff |",
            "|---|---|---|---|",
        ]
        for i in range(n):
            lines.append(
                f"| {i} | {chis32[i]:.2f} | {chis64[i]:.2f} | {rel[i]:.2e} |"
            )
        lines += ["", f"max rel diff {rel.max():.2e} —"
                  f" {'PASS' if shape_ok else 'FAIL'} (< 5e-3)", ""]
        print(f"# {shape}: max rel {rel.max():.2e} "
              f"{'PASS' if shape_ok else 'FAIL'}")
    lines += [
        f"**Overall: {'PASS' if ok else 'FAIL'}** — worst rel diff"
        f" {worst:.2e}.  bench.py asserts its final chi2 against the fp64"
        " values recorded here (CHI2_FP64_FINAL) so a descending but"
        " numerically wrong run cannot publish a headline number.",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {os.path.normpath(OUT)}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
