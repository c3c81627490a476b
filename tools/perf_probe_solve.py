"""Amortized micro-benchmarks for the reduced-solve stages (v5e tunnel).

Methodology per docs/PERF_NOTES.md: every timing is a jitted fori_loop of
REPS iterations with a data dependency threaded through, fenced by a
4-byte scalar read.  Run stages one at a time; never concurrently with
another TPU process.

Usage: python tools/perf_probe_solve.py [--n 8448] [--reps 20]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8448)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from cuba_tpu.solver import dense_cholesky, trisolve

    n, REPS = args.n, args.reps
    rng = np.random.default_rng(0)
    # SPD with BA-like conditioning after equilibration (~1e3-1e4)
    G = rng.normal(size=(n, n)).astype(np.float32)
    A = (G @ G.T / n + np.eye(n) * 1e-2).astype(np.float32)
    d = 1.0 / np.sqrt(np.diagonal(A))
    A = A * d[:, None] * d[None, :] + np.eye(n, dtype=np.float32) * 0.2
    b = rng.normal(size=n).astype(np.float32)

    Ad = jax.device_put(jnp.asarray(A))
    bd = jax.device_put(jnp.asarray(b))

    def bench(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.ravel()[0]))  # fence
        t0 = time.perf_counter()
        out = f(*xs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.ravel()[0]))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:44s}: {dt:8.2f} ms/iter")
        return out

    def loop(body):
        def fn(A, b):
            def step(i, c):
                x = body(A, b + c * 0.0)
                return x[:1] * 1e-20
            return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))
        return fn

    # 1. XLA cholesky alone
    bench("xla cholesky", loop(lambda A, b: jnp.linalg.cholesky(A)[:, 0]), Ad, bd)

    # 2. full cholesky_solve, refine sweeps 0/1/2 (pallas trisolve on)
    for r in (0, 1, 2):
        bench(
            f"cholesky_solve refine={r} (pallas)",
            loop(lambda A, b, r=r: dense_cholesky.cholesky_solve(A, b, r, use_pallas=True)[0]),
            Ad, bd,
        )

    # 3. trisolve pieces
    L = jnp.linalg.cholesky(Ad)
    L = jax.block_until_ready(L)
    invd = jax.block_until_ready(jax.jit(trisolve.prepare)(L))

    def sweeps(L, invd, b):
        y = trisolve.solve_lower(L, invd, b)
        return trisolve.solve_upper(L, invd, y)

    def fn_sweep(L, invd, b):
        def step(i, c):
            return sweeps(L, invd, b + c * 1e-30)[:1] * 1e-20
        return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))

    f = jax.jit(fn_sweep)
    out = jax.block_until_ready(f(L, invd, bd))
    float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    out = f(L, invd, bd)
    float(np.asarray(out.ravel()[0]))
    print(f"{'trisolve lower+upper pair':44s}: {(time.perf_counter()-t0)/REPS*1e3:8.2f} ms/iter")

    def fn_mv(A, b):
        def step(i, c):
            return trisolve.matvec(A, b + c * 1e-30)[:1] * 1e-20
        return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))

    f = jax.jit(fn_mv)
    out = jax.block_until_ready(f(Ad, bd))
    float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    out = f(Ad, bd)
    float(np.asarray(out.ravel()[0]))
    print(f"{'refinement matvec':44s}: {(time.perf_counter()-t0)/REPS*1e3:8.2f} ms/iter")

    # 4. accuracy of one solve at current sweep precision
    x0, ok = jax.jit(lambda A, b: dense_cholesky.cholesky_solve(A, b, 0, use_pallas=True))(Ad, bd)
    x1, _ = jax.jit(lambda A, b: dense_cholesky.cholesky_solve(A, b, 1, use_pallas=True))(Ad, bd)
    x2, _ = jax.jit(lambda A, b: dense_cholesky.cholesky_solve(A, b, 2, use_pallas=True))(Ad, bd)
    xr = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
    for name, x in (("refine=0", x0), ("refine=1", x1), ("refine=2", x2)):
        err = np.linalg.norm(np.asarray(x, np.float64) - xr) / np.linalg.norm(xr)
        print(f"solve rel err {name:36s}: {err:.3e}")


if __name__ == "__main__":
    main()
