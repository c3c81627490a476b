"""Fused-path 8-phase TimeProfile attribution.

The reference prints its phase table after every normal optimize()
(reference: src/cuda_bundle_adjustment.cpp:545-562).  Our default path is
one fused device loop, so time_profile() fills the reference keys via a
one-time per-spec calibration + measured-ratio attribution
(engine.attribute_phases); the exact total stays under its own key.
"""

import numpy as np
import pytest

from cuba_tpu import BAConfig
from cuba_tpu.io import synthetic
from cuba_tpu.solver.engine import PROFILE_ITEMS


@pytest.mark.slow  # heavy sweep: CI slow lane


def test_fused_profile_attribution():
    prob = synthetic.generate(num_poses=8, num_landmarks=60, seed=5)
    ba = synthetic.build_graph(prob)
    ba.initialize()
    ba.optimize(4)  # normal fused run — no profile=True
    prof = ba.time_profile()

    assert set(PROFILE_ITEMS) <= set(prof.keys())
    # init phases measured exactly on the host
    assert prof["0: Initialize Optimizer"] > 0
    assert prof["1: Build Structure"] > 0
    # per-iteration phases attributed from calibration
    for k in (
        "2: Compute Error",
        "3: Build System",
        "4: Schur Complement",
        "6: Numerical Decomposition",
        "7: Update Solution",
    ):
        assert prof[k] > 0, k
    # dense solver: no symbolic pass by design
    assert prof["5: Symbolic Decomposition"] == 0.0
    # attribution conserves the measured fused total
    total = prof["optimize (fused device loop)"]
    attributed = sum(
        prof[k]
        for k in PROFILE_ITEMS
        if k not in ("0: Initialize Optimizer", "1: Build Structure")
    )
    assert attributed == pytest.approx(total, rel=1e-6)
    # attribution is idempotent — a second call must not re-add
    prof2 = ba.time_profile()
    assert prof2["2: Compute Error"] == prof["2: Compute Error"]


def test_fused_profile_attribution_off():
    prob = synthetic.generate(num_poses=6, num_landmarks=40, seed=9)
    ba = synthetic.build_graph(prob)
    ba.config = BAConfig(phase_attribution=False)
    ba.initialize()
    ba.optimize(3)
    prof = ba.time_profile()
    assert prof["2: Compute Error"] == 0.0
    assert prof["optimize (fused device loop)"] > 0


def test_profiled_driver_still_exact():
    prob = synthetic.generate(num_poses=6, num_landmarks=40, seed=2)
    ba = synthetic.build_graph(prob)
    ba.initialize()
    ba.optimize(3, profile=True)
    prof = ba.time_profile()
    assert prof["2: Compute Error"] > 0
    assert prof["6: Numerical Decomposition"] > 0
    # profiled runs leave nothing pending for attribution
    assert ba._pending_attr == []


def test_attributed_phases_marked():
    """Attributed rows are distinguishable from measured ones (the sample
    prints them with a '*' marker — attribution is an estimate, not a
    measurement)."""
    prob = synthetic.generate(num_poses=8, num_landmarks=60, seed=5)
    ba = synthetic.build_graph(prob)
    ba.initialize()
    ba.optimize(3)
    assert ba.attributed_phases() == set()  # nothing attributed until queried
    prof = ba.time_profile()
    marked = ba.attributed_phases()
    assert "2: Compute Error" in marked and "6: Numerical Decomposition" in marked
    # init phases are host-measured, never attributed
    assert "0: Initialize Optimizer" not in marked
    assert "1: Build Structure" not in marked
    assert marked <= set(prof.keys())

    # the host-stepped profiled driver measures everything exactly
    ba2 = synthetic.build_graph(prob)
    ba2.initialize()
    ba2.optimize(3, profile=True)
    ba2.time_profile()
    assert ba2.attributed_phases() == set()
