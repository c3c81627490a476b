"""Multi-chip (landmark-sharded) engine vs single-chip engine parity, on a
virtual 8-device CPU mesh (conftest sets xla_force_host_platform_device_count)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cuba_tpu import BAConfig, EdgeType, RobustKernelType
from cuba_tpu.io import synthetic
from cuba_tpu.parallel.sharding import AXIS, MultiChipEngine


@pytest.mark.parametrize("ndev", [4, 8])
@pytest.mark.slow  # heavy sweep: CI slow lane
def test_multichip_matches_single_chip(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip(f"need {ndev} devices")
    prob = synthetic.generate(num_poses=8, num_landmarks=64, seed=13)
    ba = synthetic.build_graph(prob)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba.initialize()
    ba.optimize(5)
    chis_single = np.array([s.chi2 for s in ba.batch_statistics()])

    # fresh graph (initialize() mutates vertex state after optimize)
    ba2 = synthetic.build_graph(prob)
    ba2.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba2.initialize()
    mesh = Mesh(np.array(jax.devices()[:ndev]), (AXIS,))
    eng = MultiChipEngine(ba2._engine.structure, ba2._kernels, BAConfig(), mesh)
    chis_multi, qs, ts, _, lam, natt = eng.optimize(5)

    n = min(len(chis_single), len(chis_multi))
    assert n >= 3
    rel = np.abs(chis_single[:n] - chis_multi[:n]) / np.abs(chis_single[:n])
    assert np.all(rel < 1e-6), list(zip(chis_single[:n], chis_multi[:n]))

    # landmark estimates match in global order
    s = ba2._engine.structure
    Xw_multi = eng.gathered_landmarks()
    Xw_single = np.asarray(ba._state.Xws)[: s.num_l]
    np.testing.assert_allclose(Xw_multi, Xw_single, atol=1e-7)


def test_public_api_mesh_config():
    """BAConfig(mesh=...) drives the full multi-chip path through the public
    BundleAdjustment surface: optimize, batch_statistics, write-back into
    vertex objects, and the per-edge chiSquared query."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    prob = synthetic.generate(num_poses=8, num_landmarks=64, seed=13)
    ba = synthetic.build_graph(prob)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba.initialize()
    ba.optimize(5)
    chis_single = np.array([s.chi2 for s in ba.batch_statistics()])
    lm_single = {v.id: np.array(ba.landmark_vertex(v.id).Xw) for v in ba._landmarks.values()}

    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    ba2 = synthetic.build_graph(prob, config=BAConfig(mesh=mesh))
    ba2.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba2.initialize()
    ba2.optimize(5)
    chis_multi = np.array([s.chi2 for s in ba2.batch_statistics()])

    n = min(len(chis_single), len(chis_multi))
    assert n >= 3
    rel = np.abs(chis_single[:n] - chis_multi[:n]) / np.abs(chis_single[:n])
    assert np.all(rel < 1e-6), list(zip(chis_single[:n], chis_multi[:n]))
    # estimates written back through the public surface match
    for vid, xw in lm_single.items():
        np.testing.assert_allclose(ba2.landmark_vertex(vid).Xw, xw, atol=1e-7)
    # per-edge chi2 query works on the mesh path
    e = next(iter(ba2._mono_edges))
    assert np.isfinite(ba2.chi_squared(e))


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_multichip_fused_time_profile():
    """A fused mesh optimize must fill the public TimeProfile: the fused
    while_loop now returns real nattempts/final_lambda and the adapter's
    attribute_phases splits the measured wall time by calibrated stage
    ratios (single-chip twin: BlockSolverEngine.attribute_phases;
    reference: cuda_bundle_adjustment.cpp:545-562)."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    prob = synthetic.generate(num_poses=8, num_landmarks=64, seed=13)
    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    ba = synthetic.build_graph(prob, config=BAConfig(mesh=mesh))
    ba.initialize()
    ba.optimize(4)
    tp = ba.time_profile()
    assert ba.attributed_phases(), "fused mesh run produced no attributed phases"
    for k in ("2: Compute Error", "3: Build System",
              "6: Numerical Decomposition", "7: Update Solution"):
        assert tp[k] > 0.0, (k, dict(tp))
    # attribution preserves the measured total
    attributed = sum(tp[k] for k in ba.attributed_phases())
    total = tp["optimize (fused device loop)"]
    assert abs(attributed - total) < 1e-9 * max(total, 1.0)


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_multichip_with_fixed_landmarks():
    prob = synthetic.generate(num_poses=6, num_landmarks=48, seed=17)
    ba = synthetic.build_graph(prob)
    for j in range(0, 48, 5):
        ba.landmark_vertex(j).fixed = True
    ba.initialize()
    ba.optimize(4)
    chis_single = np.array([s.chi2 for s in ba.batch_statistics()])

    ba2 = synthetic.build_graph(prob)
    for j in range(0, 48, 5):
        ba2.landmark_vertex(j).fixed = True
    ba2.initialize()
    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    eng = MultiChipEngine(ba2._engine.structure, ba2._kernels, BAConfig(), mesh)
    chis_multi, _, _, _, _, _ = eng.optimize(4)
    n = min(len(chis_single), len(chis_multi))
    rel = np.abs(chis_single[:n] - chis_multi[:n]) / np.abs(chis_single[:n])
    assert np.all(rel < 1e-6), list(zip(chis_single[:n], chis_multi[:n]))


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_multichip_band_and_dense_parity():
    """The band-certified multi-chip path (replicated cyclic reduction) and
    the forced dense path must produce the same trajectory; small banded
    problems stay dense under 'auto' (the single-chip m >= 8 gate —
    CR's batched-level overhead only pays off on long trajectories)."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    # >= 129 poses so pad_blocks/64 >= 2 CR blocks (band certification)
    prob = synthetic.generate(num_poses=140, num_landmarks=900, seed=13)
    ba = synthetic.build_graph(prob)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba.initialize()
    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    e_small = MultiChipEngine(ba._engine.structure, ba._kernels, BAConfig(), mesh)
    assert e_small.solver == "dense_cholesky" and 2 <= e_small.band_m < 8
    e_auto = MultiChipEngine(
        ba._engine.structure, ba._kernels, BAConfig(solver="band_cr"), mesh
    )
    assert e_auto.solver == "band_cr" and e_auto.band_m >= 2
    e_dense = MultiChipEngine(
        ba._engine.structure, ba._kernels, BAConfig(solver="dense_cholesky"), mesh
    )
    assert e_dense.solver == "dense_cholesky"
    chis_b, *_ = e_auto.optimize(5)
    chis_d, *_ = e_dense.optimize(5)
    n = min(len(chis_b), len(chis_d))
    assert n >= 3
    rel = np.abs(np.array(chis_b[:n]) - np.array(chis_d[:n])) / np.abs(np.array(chis_d[:n]))
    assert np.all(rel < 1e-5), list(zip(chis_b[:n], chis_d[:n]))


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_multichip_pcg_parity():
    """The sharded matrix-free PCG solver (one [P,6] psum per CG step, no
    replicated factorization) matches the dense multichip path — the
    large-P multichip configuration where per-device solve work must
    SHRINK with the device count."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    prob = synthetic.generate(num_poses=12, num_landmarks=120, seed=19)
    ba = synthetic.build_graph(prob)
    ba.set_robust_kernels(RobustKernelType.HUBER, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
    ba.initialize()
    mesh = Mesh(np.array(jax.devices()[:8]), (AXIS,))
    e_pcg = MultiChipEngine(
        ba._engine.structure, ba._kernels, BAConfig(solver="pcg"), mesh
    )
    assert e_pcg.solver == "pcg"
    e_dense = MultiChipEngine(
        ba._engine.structure, ba._kernels, BAConfig(solver="dense_cholesky"), mesh
    )
    chis_p, *_ = e_pcg.optimize(5)
    chis_d, *_ = e_dense.optimize(5)
    n = min(len(chis_p), len(chis_d))
    assert n >= 3
    rel = np.abs(np.array(chis_p[:n]) - np.array(chis_d[:n])) / np.abs(
        np.array(chis_d[:n])
    )
    assert np.all(rel < 1e-5), list(zip(chis_p[:n], chis_d[:n]))
