"""Persistent Pallas blocked Cholesky (solver/pallas_chol.py), interpret mode.

Note: Pallas interpret mode executes every dot_general with bf16 operand
rounding regardless of the requested precision (the same quirk that made
astype(bfloat16) a relabel, see ops/segmm.py `_trunc_bf16`), so tolerances
here are bf16-grade.  Real-chip accuracy is fp32-grade (HIGHEST streams);
the LM trajectory tests exercise that path on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuba_tpu.solver import dense_cholesky, pallas_chol


def _spd(n, seed=0, rank=32):
    rng = np.random.default_rng(seed)
    G = rng.standard_normal((n, rank)).astype(np.float32)
    return G @ G.T + n * np.eye(n, dtype=np.float32)


class TestPallasChol:
    def test_factor_matches_numpy(self):
        n = 768
        A = _spd(n)
        L, invd = pallas_chol.cholesky_with_inv(jnp.asarray(A), interpret=True)
        L = np.asarray(L)
        Lref = np.linalg.cholesky(A.astype(np.float64))
        scale = np.abs(Lref).max()
        assert np.abs(L - Lref).max() / scale < 5e-3
        assert np.abs(np.triu(L, 1)).max() == 0.0
        B = pallas_chol.B
        for k in range(n // B):
            blk = Lref[k * B : (k + 1) * B, k * B : (k + 1) * B]
            err = np.abs(np.asarray(invd)[k] @ blk - np.eye(B)).max()
            assert err < 5e-3, (k, err)

    def test_zero_pivot_propagates_nan(self):
        n = 768
        A = _spd(n)
        A[500, 500] = -1e6  # indefinite -> sqrt of a negative somewhere
        L, _ = pallas_chol.cholesky_with_inv(jnp.asarray(A), interpret=True)
        assert not bool(jnp.isfinite(jnp.sum(jnp.asarray(L)[-1])))

    def test_cholesky_solve_integration(self, monkeypatch):
        # CUBA_TPU_PALLAS_CHOL=1 routes through pallas_chol + blocked
        # trisolve at block=pallas_chol.B; refinement against the true A
        # recovers interpret mode's bf16 factor error on this
        # well-conditioned system
        monkeypatch.setenv("CUBA_TPU_PALLAS_CHOL", "1")
        n = 768
        A = _spd(n, seed=3)
        b = np.random.default_rng(4).standard_normal(n).astype(np.float32)
        x, ok = dense_cholesky.cholesky_solve(
            jnp.asarray(A), jnp.asarray(b), refinement_steps=4,
            use_pallas=True, interpret=True,
        )
        assert bool(ok)
        xref = np.linalg.solve(A.astype(np.float64), b)
        rel = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
        assert rel < 1e-2, rel
