"""Attribution of cr_solve's non-factor cost: boost while_loop vs solve
sweep vs equilibration, amortized (fori_loop x REPS)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cuba_tpu.solver import band_cr

    REPS = 20
    rng = np.random.default_rng(0)
    m, B = 22, band_cr.B
    n = m * B
    Dg = rng.normal(size=(m, B, B)).astype(np.float32)
    D = (Dg @ np.swapaxes(Dg, 1, 2) / B + np.eye(B) * 2.0).astype(np.float32)
    U = (rng.normal(size=(m, B, B)) * 0.05).astype(np.float32)
    U[-1] = 0
    b = rng.normal(size=n).astype(np.float32)
    Dd, Ud, bd = map(jnp.asarray, (D, U, b))

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        float(np.asarray(out.ravel()[0]))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = f(*xs)
            float(np.asarray(out.ravel()[0]))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:40s}: {best*1e3:8.2f} ms")

    def loop(body):
        def fn(D, U, b):
            def step(i, c):
                return body(D + c[0] * 1e-30, U, b).ravel()[:1] * 1e-30
            return jax.lax.fori_loop(0, REPS, step, jnp.zeros(1, jnp.float32))
        return fn

    # 1. factor only (no equilibration, no boost)
    timed("factor only", loop(lambda D, U, b: band_cr.factor(D, U)[1]), Dd, Ud, bd)

    # 2. full _factor_equilibrated (equilibration + boost while_loop)
    def f_eq(D, U, b):
        sw = band_cr._factor_equilibrated(D, U)
        return sw(b)[:1]  # includes ONE solve

    timed("equil+boost+factor + 1 solve", loop(f_eq), Dd, Ud, bd)

    # 3. full cr_solve refine=0
    timed("cr_solve refine=0", loop(lambda D, U, b: band_cr.cr_solve(D, U, b, 0)[0]), Dd, Ud, bd)

    # 4. factor + N solves (solve marginal)
    def f_s2(D, U, b):
        sw = band_cr._factor_equilibrated(D, U)
        x = sw(b)
        x = x + sw(b + x * 1e-30)
        return x[:1]

    timed("equil+boost+factor + 2 solves", loop(f_s2), Dd, Ud, bd)

    # 5. multi-RHS solve cost: 1 vs 96 columns
    def f_mr(D, U, b, R):
        def fn(D, U, b):
            sw = band_cr._factor_equilibrated(D, U)
            bm = jnp.broadcast_to(b[:, None], (b.shape[0], R)) * (
                1.0 + jnp.arange(R, dtype=jnp.float32) * 1e-3
            )
            return sw(bm).ravel()[:1]
        return fn

    timed("factor + solve 96 RHS", loop(f_mr(Dd, Ud, bd, 96)), Dd, Ud, bd)
    timed("factor + solve 384 RHS", loop(f_mr(Dd, Ud, bd, 384)), Dd, Ud, bd)


if __name__ == "__main__":
    main()
