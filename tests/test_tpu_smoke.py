"""Real-TPU smoke tests: run the compiled (non-interpret) Pallas path and
check it against the XLA path.  Skipped on CPU — the rest of the suite
covers kernels in interpret mode; this file is the on-hardware gate the
benchmarks would otherwise be the only ones to exercise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cuba_tpu.config import BAConfig
from cuba_tpu.io import synthetic
from cuba_tpu.ops import robust
from cuba_tpu.solver.engine import BlockSolverEngine
from cuba_tpu.solver.structure import build_structure_from_arrays

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a TPU backend"
)


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
    k = ((robust.HUBER, float(np.sqrt(5.991))), (robust.HUBER, float(np.sqrt(7.815))))
    return BlockSolverEngine(s, k, config)


def test_mxu_trajectory_matches_xla_on_chip():
    e_mxu = _engine(BAConfig(dtype=jnp.float32, mxu="on"))
    e_xla = _engine(BAConfig(dtype=jnp.float32, mxu="off"))
    assert e_mxu.use_mxu, "MXU plans rejected the smoke problem on TPU"
    r_m = e_mxu.optimize(None, 5)
    r_x = e_xla.optimize(None, 5)
    n = min(int(r_m.niters), int(r_x.niters))
    assert n >= 3
    # both chips' fp32 paths carry bf16-pass matmul noise (XLA's default
    # TPU precision included) — 2% trajectory agreement + monotone descent
    # is the hardware smoke bar; parity-grade equality is the fp64 suite's
    # job (tests/test_parity.py)
    cm = np.asarray(r_m.chis)[:n]
    cx = np.asarray(r_x.chis)[:n]
    np.testing.assert_allclose(cm, cx, rtol=2e-2)
    assert np.all(np.diff(cm) <= 1e-6 * cm[:-1])


def test_chi_squares_on_chip():
    e_mxu = _engine(BAConfig(dtype=jnp.float32, mxu="on"))
    e_xla = _engine(BAConfig(dtype=jnp.float32, mxu="off"))
    a = e_mxu.chi_squares(None)
    b = e_xla.chi_squares(None)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
