"""Test configuration: run on CPU with 8 virtual devices (multi-chip sharding
tests) and fp64 enabled (parity-grade numerics, the role g2o's CPU fp64 plays
for the reference, reference: samples/sample_comparison_with_g2o.cpp)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# force CPU: the session env presets JAX_PLATFORMS=axon (the TPU tunnel) and
# the axon plugin wins over the env var — the config update does not.
# CUBA_TPU_TEST_ON_TPU=1 keeps the real backend (tests/test_tpu_smoke.py).
if not os.environ.get("CUBA_TPU_TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the fast lane is compile-bound on a 1-core box
# (~4x the device time); the disk cache drops warm-run wall from ~5 to ~2.5
# minutes.  Keyed by HLO hash, so stale hits are impossible; cold runs just
# pay the old cost once.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("CUBA_TPU_TEST_CACHE",
                       os.path.expanduser("~/.cache/cuba_tpu/jax")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # older jax without the knob: compile uncached
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
