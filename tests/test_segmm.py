"""Unit tests for the one-hot segment-matmul Pallas kernels (ops/segmm.py),
run in interpreter mode so they work on CPU.  These kernels replace the
reference's atomicAdd scatters (reference: src/cuda_block_solver.cu:147-148,
:818-837) on TPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cuba_tpu.ops import segmm


def _rand_ids(rng, n, s, frac_invalid=0.1, sort=False):
    ids = rng.integers(0, s, n).astype(np.int32)
    inv = rng.random(n) < frac_invalid
    ids[inv] = -1
    if sort:
        order = np.argsort(np.where(ids < 0, np.int64(1) << 40, ids), kind="stable")
        ids = ids[order]
    return ids


class TestAccumSegsum:
    def test_matches_xla(self):
        rng = np.random.default_rng(0)
        D, N, S = 7, 2048, 300
        vals = jnp.asarray(rng.standard_normal((D, N)), jnp.float32)
        ids = jnp.asarray(_rand_ids(rng, N, S))
        out = segmm.accum_segsum(vals, ids, S, chunk=512, interpret=True)
        ref = segmm.accum_segsum_xla(vals, ids, S)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_all_invalid(self):
        vals = jnp.ones((3, 256), jnp.float32)
        ids = jnp.full((256,), -1, jnp.int32)
        out = segmm.accum_segsum(vals, ids, 10, chunk=256, interpret=True)
        assert float(jnp.abs(out).max()) == 0.0


class TestTiledSegsum:
    def test_matches_xla_sorted(self):
        rng = np.random.default_rng(1)
        D, N, S = 5, 4096, 1000
        ids_np = np.sort(rng.integers(0, S, N).astype(np.int32))
        plan = segmm.plan_tiles(ids_np, S, tile=256, block=512, max_blocks=8)
        assert plan.ok
        vals_np = rng.standard_normal((D, N)).astype(np.float32)
        pad = plan.n_pad - N
        vals = jnp.asarray(np.pad(vals_np, ((0, 0), (0, pad))))
        ids = jnp.asarray(np.concatenate([ids_np, np.full(pad, -1, np.int32)]))
        out = segmm.tiled_segsum(
            vals, ids, S, plan, jnp.asarray(plan.base_block), interpret=True
        )
        ref = segmm.tiled_segsum_xla(vals, ids, S)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_plan_rejects_bad_locality(self):
        # alternating far-apart ids -> every tile needs the whole input
        ids = np.tile(np.array([0, 100_000], np.int32), 5000)
        plan = segmm.plan_tiles(ids, 100_001, tile=256, block=512, max_blocks=4)
        assert not plan.ok


class TestTiledGather:
    def test_matches_xla_sorted_ids(self):
        rng = np.random.default_rng(2)
        D, S, N = 6, 2000, 4096
        ids_np = np.sort(rng.integers(0, S, N).astype(np.int32))
        plan = segmm.plan_gather_tiles(ids_np, S, tile=256, block=512, max_blocks=8)
        assert plan.ok
        src_np = rng.standard_normal((D, S)).astype(np.float32)
        src = jnp.asarray(np.pad(src_np, ((0, 0), (0, plan.n_pad - S))))
        idp = np.concatenate(
            [ids_np, np.full(plan.num_tiles * plan.tile - N, -1, np.int32)]
        )
        out = segmm.tiled_gather(
            src, jnp.asarray(idp), plan, jnp.asarray(plan.base_block),
            num_out=N, interpret=True,
        )
        ref = segmm.tiled_gather_xla(src, jnp.asarray(idp), num_out=N)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)

    def test_small_source_unsorted(self):
        # unsorted ids but the whole source fits one window
        rng = np.random.default_rng(3)
        D, S, N = 4, 700, 2048
        ids_np = rng.integers(0, S, N).astype(np.int32)
        plan = segmm.plan_gather_tiles(ids_np, S, tile=512, block=1024, max_blocks=2)
        assert plan.ok  # source (700 cols) spans <= 2 blocks from any tile
        src = jnp.asarray(rng.standard_normal((D, plan.n_pad)), jnp.float32)
        out = segmm.tiled_gather(
            src, jnp.asarray(ids_np), plan, jnp.asarray(plan.base_block),
            num_out=N, interpret=True,
        )
        ref = segmm.tiled_gather_xla(src, jnp.asarray(ids_np), num_out=N)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


class TestSchurFused:
    def test_matches_xla(self):
        rng = np.random.default_rng(4)
        # landmark-major synthetic triplets: 200 landmarks, 2-5 slots each
        n_slots_per = rng.integers(2, 6, 200)
        slot_of = np.repeat(np.arange(200), n_slots_per)
        n_hpl = slot_of.size
        pose_of_slot = np.sort(rng.integers(0, 40, n_hpl))  # rows within col sorted-ish
        mul_i, mul_j = [], []
        start = 0
        for c in n_slots_per:
            for a in range(c):
                for b in range(a, c):
                    mul_i.append(start + a)
                    mul_j.append(start + b)
            start += c
        mul_i = np.asarray(mul_i, np.int64)
        mul_j = np.asarray(mul_j, np.int64)
        key = pose_of_slot[mul_i] * 40 + pose_of_slot[mul_j]
        uniq, mul_k = np.unique(key, return_inverse=True)
        n_hsc = uniq.size

        plan = segmm.plan_schur(mul_i, mul_j, mul_k, n_hpl, n_hsc,
                                chunk=256, slot_block=512, max_kwin=256)
        assert plan.ok
        W = rng.standard_normal((18, plan.n_slot_pad)).astype(np.float32)
        G = rng.standard_normal((18, plan.n_slot_pad)).astype(np.float32)
        W[:, n_hpl:] = 0
        G[:, n_hpl:] = 0
        Wd, Gd = jnp.asarray(W), jnp.asarray(G)
        win = segmm.schur_fused(
            Wd, Gd, plan,
            jnp.asarray(plan.sb),
            jnp.asarray(plan.li), jnp.asarray(plan.lj), jnp.asarray(plan.lk),
            interpret=True,
        )
        # combine the per-chunk windows (second stage, as in solver/mxu.py)
        pplan = segmm.plan_tiles(plan.gid, n_hsc, tile=256, block=512)
        assert pplan.ok
        wpad = max(pplan.n_pad, win.shape[1])
        winp = jnp.asarray(np.pad(np.asarray(win), ((0, 0), (0, wpad - win.shape[1]))))
        gidp = jnp.asarray(np.pad(plan.gid, (0, wpad - plan.gid.size), constant_values=-1))
        out = segmm.tiled_segsum(winp, gidp, n_hsc, pplan,
                                 jnp.asarray(pplan.base_block), interpret=True)
        ref = segmm.schur_fused_xla(Wd, Gd, jnp.asarray(mul_i), jnp.asarray(mul_j),
                                    jnp.asarray(mul_k), n_hsc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestSchurPlanNativeParity:
    def test_cpp_matches_numpy(self):
        from cuba_tpu import native

        if native.get_lib() is None:
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(9)
        # landmark-major synthetic triplets
        n_slots_per = rng.integers(1, 7, 300)
        start = 0
        mul_i, mul_j = [], []
        pose_of_slot = np.sort(rng.integers(0, 50, int(n_slots_per.sum())))
        for c in n_slots_per:
            for a in range(c):
                for b in range(a, c):
                    mul_i.append(start + a)
                    mul_j.append(start + b)
            start += c
        mul_i = np.asarray(mul_i, np.int64)
        mul_j = np.asarray(mul_j, np.int64)
        key = pose_of_slot[mul_i] * 50 + pose_of_slot[mul_j]
        uniq, mul_k = np.unique(key, return_inverse=True)
        n_hpl, n_hsc = start, uniq.size

        cpp = segmm.plan_schur(mul_i, mul_j, mul_k.astype(np.int64), n_hpl, n_hsc,
                               chunk=128, slot_block=256)
        orig = __import__("cuba_tpu.native", fromlist=["native"]).schur_plan
        import cuba_tpu.native as nat
        nat_fn = nat.schur_plan
        nat.schur_plan = lambda *a, **k: None
        try:
            ref = segmm.plan_schur(mul_i, mul_j, mul_k.astype(np.int64), n_hpl, n_hsc,
                                   chunk=128, slot_block=256)
        finally:
            nat.schur_plan = nat_fn
        assert cpp.ok == ref.ok and cpp.kwin == ref.kwin
        assert cpp.num_chunks == ref.num_chunks
        assert (cpp.n_slot_pad, cpp.n_hsc_pad) == (ref.n_slot_pad, ref.n_hsc_pad)
        np.testing.assert_array_equal(cpp.sb, ref.sb)
        np.testing.assert_array_equal(cpp.li, ref.li)
        np.testing.assert_array_equal(cpp.lj, ref.lj)
        np.testing.assert_array_equal(cpp.lk, ref.lk)
        np.testing.assert_array_equal(cpp.gid, ref.gid)

    def test_cpp_rechunk_matches_numpy(self, monkeypatch):
        """Tight slot windows force the landmark-granular re-chunk: the C++
        baked plan (ba_symbolic_compile), the standalone C++ planner
        (ba_schur_plan) and the NumPy _chunk_by_landmark path must agree
        bit-for-bit."""
        from cuba_tpu import native
        from cuba_tpu.io import synthetic
        from cuba_tpu.solver import mxu
        from cuba_tpu.solver.structure import build_structure_from_arrays

        if native.get_lib() is None:
            pytest.skip("native toolchain unavailable")
        monkeypatch.setenv("CUBA_TPU_SC_SB", "64")
        num_p, num_l = 220, 6000
        prob = synthetic.generate(
            num_poses=num_p, num_landmarks=num_l, mean_obs_per_landmark=5.5,
            stereo_fraction=0.25, seed=2, loop_closure=True,
        )
        cams = np.tile(prob.cam, (num_p, 1))
        fixed_p = np.zeros(num_p, bool)
        fixed_p[prob.fixed_poses] = True
        fixed_l = np.zeros(num_l, bool)
        s = build_structure_from_arrays(
            prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
            prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
            prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
        )
        assert s.schur_native is not None
        assert s.schur_native[0] == (1024, 64, 1024)  # self-describing geometry
        baked = mxu.plan_schur_for(s)
        standalone = segmm.plan_schur(
            s.mul_i, s.mul_j, s.mul_k, s.n_hpl, s.n_hsc,
            chunk=1024, slot_block=64, col=s.hpl_col,
        )
        import cuba_tpu.native as nat
        nat_fn = nat.schur_plan
        nat.schur_plan = lambda *a, **k: None
        try:
            ref = segmm.plan_schur(
                s.mul_i, s.mul_j, s.mul_k, s.n_hpl, s.n_hsc,
                chunk=1024, slot_block=64, col=s.hpl_col,
            )
        finally:
            nat.schur_plan = nat_fn
        # the re-chunk actually happened (interior chunk-tail padding)
        li2 = np.asarray(ref.li).reshape(ref.num_chunks, ref.chunk)
        assert bool(np.any((li2 < 0)[:-1].sum(1) > 0))
        for plan in (baked, standalone):
            assert plan.ok == ref.ok and plan.kwin == ref.kwin
            assert plan.num_chunks == ref.num_chunks
            for f in ("sb", "li", "lj", "lk", "gid"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(plan, f), np.int64).ravel(),
                    np.asarray(getattr(ref, f), np.int64).ravel(), err_msg=f,
                )
