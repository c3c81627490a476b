"""Golden-reference parity: TPU engine vs the independent NumPy/SciPy solver.

This is the analogue of the reference's g2o comparison harness
(reference: samples/sample_comparison_with_g2o.cpp + README.md:176-192,
which reports per-iteration chi2 identical to 0.1 and estimate RMSE
~1e-13): both implementations run the same LM control law on the same
graph in fp64 and must agree on per-iteration chi2 to 1e-6 relative and on
final estimates to ~1e-8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuba_tpu import BAConfig, EdgeType, RobustKernelType
from cuba_tpu.io import synthetic
from cuba_tpu.reference.solver import RefProblem, ReferenceSolver

MONO_DELTA = float(np.sqrt(5.991))
STEREO_DELTA = float(np.sqrt(7.815))


def run_engine(ba, niters):
    ba.initialize()
    ba.optimize(niters)
    return np.array([s.chi2 for s in ba.batch_statistics()])


def run_reference(ba, niters):
    """Build the RefProblem from the engine's compiled structure so both see
    the identical internal-index problem."""
    s = ba._engine.structure
    ref = ReferenceSolver(RefProblem.from_structure(s, ba._kernels))
    chis = ref.optimize(niters)
    return np.array(chis), ref


@pytest.mark.parametrize("robust", [False, True])
def test_chi2_parity(robust):
    prob = synthetic.generate(num_poses=10, num_landmarks=90, seed=7)
    ba = synthetic.build_graph(prob)
    if robust:
        ba.set_robust_kernels(RobustKernelType.HUBER, MONO_DELTA, EdgeType.MONOCULAR)
        ba.set_robust_kernels(RobustKernelType.HUBER, STEREO_DELTA, EdgeType.STEREO)
    niters = 8
    chis_tpu = run_engine(ba, niters)
    chis_ref, ref = run_reference(ba, niters)

    n = min(len(chis_tpu), len(chis_ref))
    assert n >= 5, f"too few iterations to compare: {len(chis_tpu)} vs {len(chis_ref)}"
    rel = np.abs(chis_tpu[:n] - chis_ref[:n]) / np.abs(chis_ref[:n])
    assert np.all(rel < 1e-6), f"chi2 mismatch: {list(zip(chis_tpu[:n], chis_ref[:n]))}"

    # final estimates: RMSE between the two implementations
    s = ba._engine.structure
    qs_t = np.asarray(ba._state.qs)[: s.num_p]
    ts_t = np.asarray(ba._state.ts)[: s.num_p]
    Xw_t = np.asarray(ba._state.Xws)[: s.num_l]
    q_rmse = np.sqrt(np.mean((qs_t - ref.p.qs[: s.num_p]) ** 2))
    t_rmse = np.sqrt(np.mean((ts_t - ref.p.ts[: s.num_p]) ** 2))
    x_rmse = np.sqrt(np.mean((Xw_t - ref.p.Xws[: s.num_l]) ** 2))
    assert q_rmse < 1e-8, q_rmse
    assert t_rmse < 1e-7, t_rmse
    assert x_rmse < 1e-7, x_rmse


def test_chi2_parity_with_fixed_landmarks():
    """Mixed fixed/free landmarks exercises the flag-gated assembly paths."""
    prob = synthetic.generate(num_poses=8, num_landmarks=80, seed=11)
    ba = synthetic.build_graph(prob)
    for j in range(0, 80, 7):
        ba.landmark_vertex(j).fixed = True
    ba.set_robust_kernels(RobustKernelType.HUBER, MONO_DELTA, EdgeType.MONOCULAR)
    chis_tpu = run_engine(ba, 6)
    chis_ref, _ = run_reference(ba, 6)
    n = min(len(chis_tpu), len(chis_ref))
    rel = np.abs(chis_tpu[:n] - chis_ref[:n]) / np.abs(chis_ref[:n])
    assert np.all(rel < 1e-6), f"chi2 mismatch: {list(zip(chis_tpu[:n], chis_ref[:n]))}"


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_checkpoint_roundtrip(tmp_path):
    """save_checkpoint/load_checkpoint restore estimates + stats by id."""
    import numpy as np
    from cuba_tpu.io import synthetic

    prob = synthetic.generate(num_poses=8, num_landmarks=50, seed=7)
    ba = synthetic.build_graph(prob)
    ba.initialize()
    ba.optimize(3)
    ck = str(tmp_path / "ck.npz")
    ba.save_checkpoint(ck)
    q_ref = {i: ba.pose_vertex(i).q.copy() for i in sorted(ba._poses)}
    chis_ref = [s.chi2 for s in ba.batch_statistics()]

    # fresh graph with unoptimized estimates, same ids
    ba2 = synthetic.build_graph(prob)
    ba2.load_checkpoint(ck)
    for i, q in q_ref.items():
        np.testing.assert_allclose(ba2.pose_vertex(i).q, q)
    assert [s.chi2 for s in ba2.batch_statistics()] == chis_ref
    # resuming continues the descent
    ba2.initialize()
    ba2.optimize(2)
    assert ba2.batch_statistics()[-1].chi2 <= chis_ref[-1] * 1.0001
