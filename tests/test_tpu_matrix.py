"""On-hardware test matrix: the compiled (non-interpret) kernels and every
engine configuration the CPU suite can only cover in interpret mode.

Covers (VERDICT r1 item 5; reference runs its parity + sanitizer matrix on
real hardware, reference: .gitlab-ci.yml:41-63):
  * segmm Pallas kernels vs their ``_xla`` twins, compiled for the chip
  * plans.ok=False fallback (scattered covisibility -> XLA path) on TPU
  * pose-only / landmark-only degenerate problems on TPU
  * the PCG reduced solver (BAConfig.solver="pcg") on TPU
  * the fp64 XLA path (reference ships USE_FLOAT32 both ways,
    reference: .gitlab-ci.yml:20-39)

Run with ``CUBA_TPU_TEST_ON_TPU=1 pytest tests/test_tpu_matrix.py``;
skipped on CPU (tests/test_segmm.py et al. cover interpret mode there).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cuba_tpu.config import BAConfig
from cuba_tpu.io import synthetic
from cuba_tpu.ops import robust, segmm
from cuba_tpu.solver.engine import BlockSolverEngine
from cuba_tpu.solver.structure import build_structure_from_arrays

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a TPU backend"
)

KERNELS = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))


def _engine(config, num_poses=12, num_landmarks=150, seed=7):
    prob = synthetic.generate(num_poses=num_poses, num_landmarks=num_landmarks, seed=seed)
    cams = np.tile(prob.cam, (num_poses, 1))
    fp = np.zeros(num_poses, bool)
    fp[prob.fixed_poses] = True
    fl = np.zeros(num_landmarks, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fp, fl,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    return BlockSolverEngine(s, KERNELS, config)


def _scattered_structure(num_p=100, num_l=800, edges_per_lm=6, seed=0,
                         fix_all_lm=False, free_poses=None):
    """Mono-only structure with random (non-local) covisibility: defeats the
    windowed tile plans, so plan_mxu returns ok=False and the engine must
    fall back to the XLA path."""
    rng = np.random.default_rng(seed)
    qs = np.tile(np.array([0.0, 0, 0, 1]), (num_p, 1))
    ts = rng.normal(size=(num_p, 3)) * 0.1
    cams = np.tile(np.array([500.0, 500, 320, 240, 0.1]), (num_p, 1))
    Xws = rng.normal(size=(num_l, 3)) + np.array([0, 0, 5.0])
    fp = np.zeros(num_p, bool)
    fp[0] = True
    if free_poses is not None:
        fp[:] = True
        fp[:free_poses] = False
    fl = np.full(num_l, bool(fix_all_lm))
    mp, ml = [], []
    for lm in range(num_l):
        for p in rng.choice(num_p, size=min(edges_per_lm, num_p), replace=False):
            mp.append(p)
            ml.append(lm)
    mp = np.asarray(mp, np.int32)
    ml = np.asarray(ml, np.int32)
    mz = rng.normal(size=(len(mp), 2)) * 10 + np.array([320.0, 240])
    mw = np.ones(len(mp))
    e = np.zeros((0,), np.int32)
    return build_structure_from_arrays(
        qs, ts, cams, Xws, fp, fl, mp, ml, mz, mw,
        e, e, np.zeros((0, 3)), np.zeros(0),
    )


def _assert_descent(res, min_iters=2):
    n = int(res.niters)
    assert n >= min_iters
    chis = np.asarray(res.chis)[:n]
    assert np.all(np.isfinite(chis))
    assert chis[-1] < chis[0]


# ---------------------------------------------------------------------------
# compiled segmm kernels vs their _xla twins
# ---------------------------------------------------------------------------


class TestCompiledKernels:
    def test_accum_segsum(self):
        rng = np.random.default_rng(0)
        D, N, S = 7, 2048, 300
        vals = jnp.asarray(rng.standard_normal((D, N)), jnp.float32)
        ids_np = rng.integers(0, S, N).astype(np.int32)
        ids_np[rng.random(N) < 0.1] = -1
        ids = jnp.asarray(ids_np)
        out = segmm.accum_segsum(vals, ids, S, chunk=512)
        ref = segmm.accum_segsum_xla(vals, ids, S)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_tiled_segsum(self):
        rng = np.random.default_rng(1)
        D, N, S = 5, 4096, 1000
        ids_np = np.sort(rng.integers(0, S, N).astype(np.int32))
        plan = segmm.plan_tiles(ids_np, S, tile=256, block=512, max_blocks=8)
        assert plan.ok
        vals_np = rng.standard_normal((D, N)).astype(np.float32)
        pad = plan.n_pad - N
        vals = jnp.asarray(np.pad(vals_np, ((0, 0), (0, pad))))
        ids = jnp.asarray(np.concatenate([ids_np, np.full(pad, -1, np.int32)]))
        out = segmm.tiled_segsum(vals, ids, S, plan, jnp.asarray(plan.base_block))
        ref = segmm.tiled_segsum_xla(vals, ids, S)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_tiled_gather(self):
        rng = np.random.default_rng(2)
        D, S, N = 6, 2000, 4096
        ids_np = np.sort(rng.integers(0, S, N).astype(np.int32))
        plan = segmm.plan_gather_tiles(ids_np, S, tile=256, block=512, max_blocks=8)
        assert plan.ok
        src_np = rng.standard_normal((D, S)).astype(np.float32)
        src = jnp.asarray(np.pad(src_np, ((0, 0), (0, plan.n_pad - S))))
        idp = np.concatenate([ids_np, np.full(plan.num_tiles * plan.tile - N, -1, np.int32)])
        out = segmm.tiled_gather(
            src, jnp.asarray(idp), plan, jnp.asarray(plan.base_block), num_out=N
        )
        ref = segmm.tiled_gather_xla(src, jnp.asarray(idp), num_out=N)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_resident_gather(self):
        rng = np.random.default_rng(3)
        D, S, N = 12, 512, 2048
        src = jnp.asarray(rng.standard_normal((D, S)), jnp.float32)
        ids_np = rng.integers(0, S, N).astype(np.int32)
        ids_np[rng.random(N) < 0.05] = -1
        ids = jnp.asarray(ids_np)
        out = segmm.resident_gather(src, ids)
        ref = segmm.resident_gather_xla(src, ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_schur_fused(self):
        rng = np.random.default_rng(4)
        n_slots_per = rng.integers(2, 6, 200)
        n_hpl = int(n_slots_per.sum())
        pose_of_slot = np.sort(rng.integers(0, 40, n_hpl))
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
            Wd, Gd, plan, jnp.asarray(plan.sb),
            jnp.asarray(plan.li), jnp.asarray(plan.lj), jnp.asarray(plan.lk),
        )
        pplan = segmm.plan_tiles(plan.gid, n_hsc, tile=256, block=512)
        assert pplan.ok
        wpad = max(pplan.n_pad, win.shape[1])
        winp = jnp.asarray(np.pad(np.asarray(win), ((0, 0), (0, wpad - win.shape[1]))))
        gidp = jnp.asarray(np.pad(plan.gid, (0, wpad - plan.gid.size), constant_values=-1))
        out = segmm.tiled_segsum(winp, gidp, n_hsc, pplan, jnp.asarray(pplan.base_block))
        ref = segmm.schur_fused_xla(Wd, Gd, jnp.asarray(mul_i), jnp.asarray(mul_j),
                                    jnp.asarray(mul_k), n_hsc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# engine configurations on hardware
# ---------------------------------------------------------------------------


class TestEngineFallbacks:
    def test_scattered_covisibility_falls_back_to_xla(self):
        s = _scattered_structure()
        e = BlockSolverEngine(s, KERNELS, BAConfig(dtype=jnp.float32, mxu="on"))
        assert not e.use_mxu, "scattered covisibility should defeat plan_mxu"
        _assert_descent(e.optimize(None, 4))

    def test_pose_only_on_chip(self):
        # all landmarks fixed -> diagonal-only pose solve (no Schur system)
        s = _scattered_structure(num_p=24, num_l=200, edges_per_lm=4, fix_all_lm=True)
        assert s.num_l == 0 and s.num_p > 0
        e = BlockSolverEngine(s, KERNELS, BAConfig(dtype=jnp.float32, mxu="on"))
        assert not e.use_mxu  # plan_mxu rejects degenerate structures
        _assert_descent(e.optimize(None, 4))

    def test_landmark_only_on_chip(self):
        # all poses fixed -> diagonal-only landmark solve
        s = _scattered_structure(num_p=24, num_l=200, edges_per_lm=4, free_poses=0)
        assert s.num_p == 0 and s.num_l > 0
        e = BlockSolverEngine(s, KERNELS, BAConfig(dtype=jnp.float32, mxu="on"))
        assert not e.use_mxu
        _assert_descent(e.optimize(None, 4))


class TestSolverVariants:
    def test_pcg_on_chip_matches_dense(self):
        e_pcg = _engine(BAConfig(dtype=jnp.float32, mxu="on", solver="pcg"))
        e_den = _engine(BAConfig(dtype=jnp.float32, mxu="on"))
        assert e_pcg.use_mxu and e_den.use_mxu
        r_p = e_pcg.optimize(None, 5)
        r_d = e_den.optimize(None, 5)
        n = min(int(r_p.niters), int(r_d.niters))
        assert n >= 3
        cp = np.asarray(r_p.chis)[:n]
        cd = np.asarray(r_d.chis)[:n]
        # same smoke bar as the dense-vs-XLA trajectory (fp32 matmul noise)
        np.testing.assert_allclose(cp, cd, rtol=2e-2)
        assert np.all(np.diff(cp) <= 1e-6 * cp[:-1])

    def test_band_cr_on_chip_matches_dense(self):
        e_b = _engine(BAConfig(dtype=jnp.float32, mxu="on", solver="band_cr"),
                      num_poses=150, num_landmarks=1400)
        e_d = _engine(BAConfig(dtype=jnp.float32, mxu="on", solver="dense_cholesky"),
                      num_poses=150, num_landmarks=1400)
        assert e_b.use_mxu and e_b.mxu_plans.v2 and e_b.band_m >= 3
        r_b = e_b.optimize(None, 5)
        r_d = e_d.optimize(None, 5)
        n = min(int(r_b.niters), int(r_d.niters))
        assert n >= 3
        cb = np.asarray(r_b.chis)[:n]
        cd = np.asarray(r_d.chis)[:n]
        np.testing.assert_allclose(cb, cd, rtol=2e-2)
        assert np.all(np.diff(cb) <= 1e-6 * cb[:-1])

    def test_fp64_xla_path_on_chip(self):
        # the chip executes fp64 via emulation; this is the smoke gate that
        # the parity-grade configuration actually runs on hardware
        e = _engine(BAConfig(dtype=jnp.float64, mxu="off"))
        res = e.optimize(None, 4)
        _assert_descent(res)
        # fp64 trajectory must agree with the CPU fp64 suite's expectations:
        # strict monotone descent, no rejected steps at this benign scale
        chis = np.asarray(res.chis)[: int(res.niters)]
        assert np.all(np.diff(chis) < 0)


class TestMultiChipOnChip:
    """The multi-chip MXU body compiled for the real chip (1-device mesh —
    the only real-hardware configuration; the 8-device CPU mesh covers
    multi-shard semantics in interpret mode, tests/test_multichip_mxu.py)."""

    def test_multichip_mxu_1dev_mesh_descends(self):
        from jax.sharding import Mesh

        from cuba_tpu.parallel.sharding import AXIS, MultiChipEngine
        from cuba_tpu.solver.structure import build_structure_from_arrays

        num_poses, num_landmarks = 12, 150
        prob = synthetic.generate(
            num_poses=num_poses, num_landmarks=num_landmarks, seed=7
        )
        cams = np.tile(prob.cam, (num_poses, 1))
        fp = np.zeros(num_poses, bool)
        fp[prob.fixed_poses] = True
        s = build_structure_from_arrays(
            prob.qs, prob.ts, cams, prob.Xws, fp, np.zeros(num_landmarks, bool),
            prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
            prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
        )
        ref = BlockSolverEngine(s, KERNELS, BAConfig(dtype=jnp.float32))
        r = ref.optimize(None, 4)
        chis_ref = np.asarray(r.chis)[: int(r.niters)]

        mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
        eng = MultiChipEngine(s, KERNELS, BAConfig(dtype=jnp.float32), mesh)
        assert eng.mxu_sp is not None, "MXU shard plan must engage on TPU"
        chis, *_ = eng.optimize(4)
        n = min(len(chis_ref), len(chis))
        assert n >= 3
        rel = np.abs(chis_ref[:n] - chis[:n]) / np.abs(chis_ref[:n])
        assert np.all(rel < 5e-3), list(zip(chis_ref[:n], chis[:n]))
