"""MFU / roofline table for the hot kernels at kitti00 scale (VERDICT r3 #4).

For each kernel: measured amortized ms on chip, analytic FLOPs (useful =
what the math needs; physical = what the MXU executes, including the
bf16x3 3-pass one-hot split / HIGHEST 6-pass / DEFAULT 1-pass policy per
kernel), HBM bytes, achieved TFLOP/s and GB/s, and % of v5e peak
(197 TFLOP/s bf16 matmul, 819 GB/s HBM).  Prints a markdown table for
docs/PERF_NOTES.md.

Run: PYTHONPATH=/root/repo python tools/mfu.py [--loop-closures]
"""

import argparse
import time

import numpy as np

PEAK_TFLOPS_BF16 = 197.0  # v5e MXU, bf16 operands / fp32 accumulate
PEAK_HBM_GBS = 819.0      # v5e HBM bandwidth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--loop-closures", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import segmm, robust
    from cuba_tpu.solver import band_cr, dense_cholesky, mxu
    from cuba_tpu.solver.engine import BlockSolverEngine
    from cuba_tpu.solver.structure import build_structure_from_arrays

    n_poses, n_lms, mean_obs = 1322, 133383, 5.5
    prob = synthetic.generate(
        num_poses=n_poses, num_landmarks=n_lms,
        mean_obs_per_landmark=mean_obs, stereo_fraction=0.25, seed=0,
        loop_closure=args.loop_closures,
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
    kernels = ((robust.HUBER, float(np.sqrt(5.991))),
               (robust.HUBER, float(np.sqrt(7.815))))
    eng = BlockSolverEngine(s, kernels, BAConfig(dtype=jnp.float32))
    st, co = eng.state, eng.consts
    plans, mc = eng.mxu_plans, co.mxu
    REPS = args.reps
    lam0 = jnp.float32(1e-3)
    PB = eng.pad_blocks
    sch = plans.schur

    @jax.jit
    def inputs(st, co):
        r = eng._residuals_and_chi(st, co)
        sys = eng._build(st, co, r[0], r[1], r[2], r[3])
        HppT, HllT, HplT = sys
        iv9, W, bscT, g12 = mxu.prepare_factors_mxu(
            HppT, HllT, HplT, lam0, eng.num_p, eng.num_l, plans, mc)
        Db, Ub = mxu.schur_band_mxu(
            HppT, W, HplT, lam0, eng.num_p, PB, plans, mc, jnp.float32)
        rhs = jnp.zeros(6 * PB, jnp.float32).at[: 6 * eng.num_p].set(
            bscT.T.reshape(-1))
        return HppT, HllT, HplT, W, Db, Ub, rhs

    HppT, HllT, HplT, W, Db, Ub, rhs = jax.block_until_ready(inputs(st, co))

    def loop(body):
        def fn(*xs):
            def step(i, c):
                out = body(*((xs[0] + c * 1e-30,) + xs[1:]))
                return out.ravel()[:1] * 1e-30
            return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))
        return fn

    def timed(fn, *xs):
        f = jax.jit(loop(fn))
        out = f(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*xs))
            best = min(best, (time.perf_counter() - t0) / REPS)
        return best

    rows = []

    def add(name, secs, useful_f, phys_f, bytes_, note):
        tf = phys_f / secs / 1e12
        gbs = bytes_ / secs / 1e9
        pct_mxu = 100.0 * tf / PEAK_TFLOPS_BF16
        pct_hbm = 100.0 * gbs / PEAK_HBM_GBS
        bound = "compute" if pct_mxu >= 2 * pct_hbm else (
            "bandwidth" if pct_hbm >= 2 * pct_mxu else "mixed")
        if max(pct_mxu, pct_hbm) < 15:
            bound = "latency/overhead"
        rows.append((name, secs * 1e3, useful_f / 1e9, phys_f / 1e9,
                     tf, pct_mxu, gbs, pct_hbm, bound, note))

    # ---- 1. schur_fused: windowed pair products --------------------------
    C, R, SB, KW = sch.num_chunks, sch.chunk, sch.slot_block, sch.kwin
    WIN = 2 * SB
    t = timed(lambda W, G: segmm.schur_fused(
        W, G, sch, mc.sc_sb, mc.sc_li, mc.sc_lj, mc.sc_lk), W, HplT)
    n_tri = plans.sc_ntri
    phys = C * 3 * 2 * (2 * 18 * WIN * R + 36 * R * KW)  # bf16x3 one-hot
    useful = n_tri * 216  # 6x6 blocks of 3-term dots, 2 flops each
    byts = C * 4 * (4 * 18 * SB + 3 * R + 36 * KW)
    add("schur_fused", t, useful, phys, byts,
        f"C={C} R={R} SB={SB} kwin={KW} n_tri={n_tri/1e6:.2f}M")

    # ---- 2. band-major combine (tiled_segsum over sc_gid) ----------------
    p2 = plans.up2
    M = PB // 64
    t = timed(lambda W, G: mxu.schur_compact_mxu(W, G, plans, mc), W, HplT)
    t_f = timed(lambda W, G: segmm.schur_fused(
        W, G, sch, mc.sc_sb, mc.sc_li, mc.sc_lj, mc.sc_lk), W, HplT)
    t_comb = max(t - t_f, 1e-9)
    phys = p2.num_tiles * p2.n_blocks * 3 * 2 * 36 * p2.block * p2.tile
    useful = C * KW * 36 * 2
    byts = p2.num_tiles * p2.n_blocks * 4 * (36 * p2.block + p2.block) \
        + 36 * M * plans.wg * 4
    add("band-major combine", t_comb, useful, phys, byts,
        f"tiles={p2.num_tiles} blocks/tile={p2.n_blocks} Wg={plans.wg}")

    # ---- 3. compact_to_band: formation ----------------------------------
    t_band = timed(lambda W, G, H: mxu.schur_band_mxu(
        H, W, G, lam0, eng.num_p, PB, plans, mc, jnp.float32)[0],
        W, HplT, HppT)
    t_ctb = max(t_band - t, 1e-9)
    Wg = plans.wg
    tile = 64
    # per grid step (M x 2): 36 x (sel-up + sel-mir + sel-diag + x@CjT)
    # + 6 x Ri@Bi, one-hot bf16x3
    per = 36 * 3 * 2 * (tile * Wg * tile + tile * Wg * tile
                        + tile * 128 * tile + tile * tile * 384) \
        + 6 * 3 * 2 * (384 * tile * 384)
    phys = M * 2 * per
    useful = 36 * (plans.maxw + 1) * PB * 2  # scatter + mirror + diag adds
    byts = M * 2 * (2 * 36 * Wg * 4 + 4 * Wg * 4) + M * 384 * 768 * 4
    add("compact_to_band", t_ctb, useful, phys, byts,
        f"M={M} Wg={Wg}")

    # ---- 4. CR factor (+1 solve): batched 384^3, DEFAULT precision ------
    m = Db.shape[0]  # [m, 384, 384] block-tridiagonal storage
    B3 = 384 ** 3

    def flops_factor(m):
        f = 0
        while m > 2:
            ne, no = (m + 1) // 2, m // 2
            # _inv_spd ~ 3.7 B^3 (recursive Schur) + 5 batched matmuls
            f += no * int(3.7 * B3) + (2 * no + 3 * (ne - 1)) * 2 * B3
            m = ne
        f += int(3.7 * ((m * 384) ** 3) / (384 ** 3) * B3)
        return f

    t_fac = timed(lambda Db, Ub, rhs: band_cr.cr_solve(Db, Ub, rhs, 0)[0],
                  Db, Ub, rhs)
    phys = flops_factor(m)  # DEFAULT precision: 1 bf16 pass
    useful = phys
    byts = 2 * m * B3 // 384 * 4 * 3  # read D,U + write factors, ~3 passes
    add("CR factor+solve", t_fac, useful, phys, byts,
        f"m={m} levels={int(np.ceil(np.log2(max(m, 2) / 2)))}")

    # ---- 5. dense cholesky at PB (XLA jnp.linalg.cholesky) --------------
    n = 6 * PB
    Dm = jax.block_until_ready(jax.jit(
        lambda W, G, H: mxu.schur_dense_mxu(
            H, W, G, lam0, eng.num_p, PB, plans, mc, jnp.float32)
    )(W, HplT, HppT))
    t_ch = timed(
        lambda Dm, rhs: dense_cholesky.cholesky_solve(Dm, rhs, 0)[0],
        Dm, rhs)
    useful = n ** 3 // 3 + 2 * n * n  # chol + 2 trisolves
    phys = useful  # XLA chol: fp32 via 6-pass only on matmul panels; ~mixed
    byts = n * n * 4 * 3
    add("dense cholesky+solve", t_ch, useful, phys, byts, f"n={n}")

    shape = "loop" if args.loop_closures else "odometry"
    print(f"\nMFU table (kitti00 scale, {shape}, v5e, REPS={args.reps}):\n")
    print("| kernel | ms | useful GFLOP | phys GFLOP | TFLOP/s | %MXU | "
          "GB/s | %HBM | bound | facts |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]:.2f} | {r[2]:.2f} | {r[3]:.1f} | "
              f"{r[4]:.1f} | {r[5]:.0f}% | {r[6]:.0f} | {r[7]:.0f}% | "
              f"{r[8]} | {r[9]} |")


if __name__ == "__main__":
    main()
