"""Multi-chip MXU assembly (parallel/mxu_shard.py + the shard_map MXU body
in parallel/sharding.py) vs the single-chip engine, on the virtual CPU mesh.

The Pallas kernels run in interpreter mode (config.mxu="interpret") so the
one-hot assembly, compact Schur psum reduction and sharded PCG execute with
real shard_map collectives on CPU.  The reference has no multi-GPU path
(SURVEY.md §2); parity target matches the single-chip MXU tests
(tests/test_mxu_path.py: fp32, rtol 5e-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cuba_tpu import BAConfig, EdgeType, RobustKernelType
from cuba_tpu.io import synthetic
from cuba_tpu.parallel import mxu_shard
from cuba_tpu.parallel.sharding import AXIS, MultiChipEngine
from cuba_tpu.solver import mxu


def _graph(prob):
    ba = synthetic.build_graph(prob, config=BAConfig(dtype=jnp.float32))
    ba.set_robust_kernels(
        RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR
    )
    ba.initialize()
    return ba


def _single_chis(prob, iters):
    ba = _graph(prob)
    ba.optimize(iters)
    s = ba._engine.structure
    chis = np.array([st.chi2 for st in ba.batch_statistics()])
    return chis, np.asarray(ba._state.Xws)[: s.num_l]


def test_plan_sharded_unifies_statics():
    """Every shard's plan must trace to the same program: identical static
    signature, stacked consts with a leading shard axis, conserved totals."""
    prob = synthetic.generate(num_poses=8, num_landmarks=64, seed=13)
    ba = _graph(prob)
    s = ba._engine.structure
    from cuba_tpu.solver.engine import _pad_blocks

    for S in (2, 4, 8):
        sp = mxu_shard.plan_sharded(s, S, _pad_blocks(s.num_p), need_dense=True)
        assert sp is not None
        assert sp.plans.ok and sp.plans.rows_ok and sp.plans.v2
        # statics identical across shards by construction (plan_sharded
        # verifies static_sig equality); spot-check the consts stack
        for name in mxu.MXUConsts._fields:
            assert getattr(sp.consts, name).shape[0] == S, name
        assert sum(ss.mono.count for ss in sp.structures) == s.mono.count
        assert sum(ss.n_hpl for ss in sp.structures) == s.n_hpl
        assert sum(ss.n_mul for ss in sp.structures) == s.n_mul
        # landmark-contiguous partition: every shard padded to one size
        assert all(ss.num_l == sp.num_l_s for ss in sp.structures)


@pytest.mark.parametrize("solver", ["dense_cholesky", "pcg"])
@pytest.mark.slow  # heavy sweep: CI slow lane
def test_multichip_mxu_matches_single_chip(solver):
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    prob = synthetic.generate(num_poses=8, num_landmarks=64, seed=13)
    chis_single, Xw_single = _single_chis(prob, 4)

    ba2 = _graph(prob)
    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    cfg = BAConfig(dtype=jnp.float32, mxu="interpret", solver=solver)
    eng = MultiChipEngine(ba2._engine.structure, ba2._kernels, cfg, mesh)
    assert eng.mxu_sp is not None, "MXU shard plan rejected a clean problem"
    chis_multi, qs, ts, _, lam, natt = eng.optimize(4)

    n = min(len(chis_single), len(chis_multi))
    assert n >= 3
    rel = np.abs(chis_single[:n] - chis_multi[:n]) / np.abs(chis_single[:n])
    assert np.all(rel < 5e-3), list(zip(chis_single[:n], chis_multi[:n]))
    np.testing.assert_allclose(
        eng.gathered_landmarks(), Xw_single, atol=5e-3
    )


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_multichip_mxu_band_path():
    """Banded trajectory: the multi-chip MXU body forms the reduced system
    in block-tridiagonal storage from the psum'd compact tables and solves
    by cyclic reduction (band_from_compact + band_cr.cr_solve)."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    prob = synthetic.generate(
        num_poses=100, num_landmarks=500, mean_obs_per_landmark=5.0, seed=7
    )
    chis_single, _ = _single_chis(prob, 3)

    ba2 = _graph(prob)
    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    # explicit band_cr: 100 poses is below the auto gate's m >= 8 (the
    # single-chip crossover — CR pays off on long trajectories only)
    cfg = BAConfig(dtype=jnp.float32, mxu="interpret", solver="band_cr")
    eng = MultiChipEngine(ba2._engine.structure, ba2._kernels, cfg, mesh)
    assert eng.solver == "band_cr", "trajectory graph should band-certify"
    assert eng.mxu_sp is not None
    chis_multi, *_ = eng.optimize(3)

    n = min(len(chis_single), len(chis_multi))
    assert n >= 2
    rel = np.abs(chis_single[:n] - chis_multi[:n]) / np.abs(chis_single[:n])
    assert np.all(rel < 5e-3), list(zip(chis_single[:n], chis_multi[:n]))


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_multichip_mxu_loop_closure_band_lr():
    """Loop-closure covisibility on the mesh path: the MXU body solves
    banded + out-of-band blocks with the CR factor + Woodbury correction
    (band_from_compact with_ob + cr_solve_woodbury) — multi-chip parity
    for the single-chip band_lr solver.  Uses the fold-resistant chord
    graph from test_band_lr (a single seam would be re-banded by the
    cycle-fold ordering and never reach Woodbury).

    The reference is the fp64 engine (ground truth), NOT the fp32 XLA
    twin: this chord graph is fp32-hot, and the fp32 XLA formation's
    reduction order drifts ~1e-2 rel from fp64 (measured round 5 — it
    moved when round 4's 2-D row-layout triplet product changed the
    accumulation order), while the MXU fp32 paths sit at ~1e-4.
    Comparing two noisy fp32 twins made the test flap with formation
    reduction-order changes; comparing against fp64 pins correctness."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    from test_band_lr import KERNELS, _loop_graph

    from cuba_tpu.solver.engine import BlockSolverEngine

    s = _loop_graph(num_p=160, num_l=1000, chords=4, seed=3)
    ref = BlockSolverEngine(
        s, KERNELS, BAConfig(dtype=jnp.float64, mxu="off", solver="band_lr")
    )
    r = ref.optimize(None, 3)
    chis_single = np.asarray(r.chis)[: int(r.niters)]

    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    cfg = BAConfig(dtype=jnp.float32, mxu="interpret", solver="band_lr")
    eng = MultiChipEngine(s, KERNELS, cfg, mesh)
    assert eng.solver == "band_lr", eng.solver
    assert eng.mxu_sp is not None and eng.mxu_sp.plans.lr_nob > 0
    chis_multi, *_ = eng.optimize(3)

    n = min(len(chis_single), len(chis_multi))
    assert n >= 2
    rel = np.abs(chis_single[:n] - chis_multi[:n]) / np.abs(chis_single[:n])
    # fp32 MXU vs fp64 truth measured <= 1.2e-4 on this graph; 1e-3 leaves
    # reduction-order headroom while still catching any real formation bug
    assert np.all(rel < 1e-3), list(zip(chis_single[:n], chis_multi[:n]))


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_multichip_profiled_time_profile():
    """optimize(profile=True) on the mesh path: host-stepped 8-phase
    TimeProfile (reference: cuda_bundle_adjustment.cpp:77-88) with the
    same chi2 trajectory as the fused multi-chip run."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    from cuba_tpu.solver.engine import PROFILE_ITEMS

    prob = synthetic.generate(num_poses=8, num_landmarks=64, seed=13)
    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))

    ba = synthetic.build_graph(prob, config=BAConfig(mesh=mesh))
    ba.set_robust_kernels(
        RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR
    )
    ba.initialize()
    ba.optimize(3, profile=True)
    chis_p = np.array([s.chi2 for s in ba.batch_statistics()])
    tp = ba.time_profile()
    assert set(PROFILE_ITEMS) <= set(tp)
    for k in ("2: Compute Error", "3: Build System",
              "6: Numerical Decomposition", "7: Update Solution"):
        assert tp[k] > 0.0, k

    ba2 = synthetic.build_graph(prob, config=BAConfig(mesh=mesh))
    ba2.set_robust_kernels(
        RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR
    )
    ba2.initialize()
    ba2.optimize(3)
    chis_f = np.array([s.chi2 for s in ba2.batch_statistics()])
    n = min(len(chis_p), len(chis_f))
    assert n >= 2
    np.testing.assert_allclose(chis_p[:n], chis_f[:n], rtol=1e-9)


def test_multichip_mxu_fallback_on_cpu_auto():
    """Default config on CPU keeps the XLA body (mxu='auto' excludes CPU,
    matching the single-chip engine's gate) — no Pallas compile attempts."""
    prob = synthetic.generate(num_poses=8, num_landmarks=64, seed=13)
    ba = _graph(prob)
    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    eng = MultiChipEngine(
        ba._engine.structure, ba._kernels, BAConfig(dtype=jnp.float32), mesh
    )
    assert eng.mxu_sp is None
