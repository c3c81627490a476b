"""Wire-packing round-trip tests for the packed constant upload.

The upload machinery (solver/engine.py:_pack_group/_unpack_group and the
early-blob _EarlyRef padding) replaces the reference's per-buffer
cudaMemcpy uploads (reference: src/cuda_bundle_adjustment.cpp:268-311,
device_buffer.h) with one compressed int32 transfer per phase; these tests
pin the encode/decode inverse and the pad-growth semantics the early
overlap relies on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuba_tpu.solver.engine import (
    _EarlyRef,
    _pack_group,
    _packed_device_put,
    _unpack_group,
)


def _roundtrip(items):
    blob, meta = _pack_group(items)
    out = jax.jit(lambda b: _unpack_group(b, meta))(jnp.asarray(blob))
    return {k: np.asarray(v) for k, v in out.items()}


def test_pack_group_roundtrip_modes(rng):
    items = [
        # f32 bitcast (incl. negatives, zeros, denormal-ish values)
        ("f", rng.standard_normal(513).astype(np.float32)),
        # plain int32 (values too wild for delta encoding)
        ("i", rng.integers(-(2**30), 2**30, 4097).astype(np.int32)),
        # int16 shift-pack, odd length
        ("h", rng.integers(-32768, 32767, 1001).astype(np.int16)),
        # sorted int32 -> int8 deltas + bases
        ("d8", np.sort(rng.integers(0, 3_000_000, 8192)).astype(np.int32)),
        # strided int32 -> int16 deltas
        ("d16", (np.arange(8192, dtype=np.int32) * 200)),
        # int16 sorted -> int8 deltas from an int16 source
        ("hd8", np.sort(rng.integers(0, 30000, 8192)).astype(np.int16)),
        # trailing pad run (delta path must preserve the pad tail exactly)
        ("pad", np.concatenate(
            [np.sort(rng.integers(0, 100000, 6000)), np.full(2192, -1)]
        ).astype(np.int32)),
    ]
    out = _roundtrip(items)
    for key, arr in items:
        np.testing.assert_array_equal(
            out[key], np.asarray(arr).ravel(), err_msg=key
        )


def test_pack_group_empty_and_tiny():
    out = _roundtrip([("a", np.zeros(1, np.int32)), ("b", np.zeros(0, np.int32))])
    assert out["a"].size == 1 and out["b"].size == 0


def test_early_ref_pad_growth():
    """A leaf whose plan shape grew beyond the early guess is rebuilt from
    the early part and padded with its pad value (the fixpoint-growth case
    the kitti00 bench hits)."""
    e_int = np.concatenate([np.arange(5000, dtype=np.int32), np.full(1000, -1, np.int32)])
    e_f = np.arange(12, dtype=np.float32).reshape(2, 6)
    eblob, emeta = _pack_group([("ids", e_int), ("rows", e_f)])
    # ``early`` is a sequence of (device_blob, meta) groups (the engine
    # ships two: floats-first, then delta-encoded ints)
    early = ((jax.device_put(jnp.asarray(eblob)), emeta),)

    tree = {
        "ids": _EarlyRef("ids", (6000,), (8192,), -1),
        "rows": _EarlyRef("rows", (2, 6), (2, 10), 0),
        "plain": np.arange(7, dtype=np.int32),
    }
    blobs, unpack, key = _packed_device_put(tree, early=early, defer=True)
    out = jax.jit(unpack)(*blobs)
    ids = np.asarray(out["ids"])
    assert ids.shape == (8192,)
    np.testing.assert_array_equal(ids[:5000], np.arange(5000))
    assert np.all(ids[5000:] == -1)
    rows = np.asarray(out["rows"])
    assert rows.shape == (2, 10)
    np.testing.assert_array_equal(rows[:, :6], e_f)
    assert np.all(rows[:, 6:] == 0.0)
    np.testing.assert_array_equal(np.asarray(out["plain"]), np.arange(7))


def test_two_group_early_unpack():
    """The split early upload ships TWO (blob, meta) groups (floats first,
    then delta-encoded ints); the unpack must merge evals across groups and
    rebuild every _EarlyRef from whichever group holds its key — a swapped
    pairing or wrong arg indexing would only surface on the kitti00 bench
    otherwise (the 4 MB split gate keeps small tests single-group)."""
    f_a = np.arange(24, dtype=np.float32).reshape(4, 6)
    f_b = np.linspace(-1, 1, 5000).astype(np.float32)
    blob_f, meta_f = _pack_group([("rows", f_a), ("vals", f_b)])
    e_int = np.concatenate([np.arange(5000, dtype=np.int32), np.full(200, -1, np.int32)])
    blob_i, meta_i = _pack_group([("ids", e_int)])
    early = (
        (jax.device_put(jnp.asarray(blob_f)), meta_f),
        (jax.device_put(jnp.asarray(blob_i)), meta_i),
    )
    tree = {
        "rows": _EarlyRef("rows", (4, 6), (4, 8), 0),
        "vals": _EarlyRef("vals", (5000,), (5000,), 0),
        "ids": _EarlyRef("ids", (5200,), (6000,), -1),
        "plain": np.arange(3, dtype=np.int32),
    }
    blobs, unpack, key = _packed_device_put(tree, early=early, defer=True)
    out = jax.jit(unpack)(*blobs)
    rows = np.asarray(out["rows"])
    assert rows.shape == (4, 8)
    np.testing.assert_array_equal(rows[:, :6], f_a)
    assert np.all(rows[:, 6:] == 0)
    np.testing.assert_allclose(np.asarray(out["vals"]), f_b, rtol=0, atol=0)
    ids = np.asarray(out["ids"])
    assert ids.shape == (6000,)
    np.testing.assert_array_equal(ids[:5000], np.arange(5000))
    assert np.all(ids[5000:] == -1)
    np.testing.assert_array_equal(np.asarray(out["plain"]), np.arange(3))


def test_early_engages_at_scale():
    """The engine's early blob must actually be consumed by the unpack
    (VERDICT r1: the round-1 pad-match condition silently failed at kitti00
    scale, re-uploading ~9MB)."""
    from cuba_tpu.config import BAConfig
    from cuba_tpu.io import synthetic
    from cuba_tpu.ops import robust
    from cuba_tpu.solver.engine import BlockSolverEngine
    from cuba_tpu.solver.structure import build_structure_from_arrays

    prob = synthetic.generate(num_poses=10, num_landmarks=200, seed=5)
    n_p, n_l = 10, 200
    cams = np.tile(prob.cam, (n_p, 1))
    fixed_p = np.zeros(n_p, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(n_l, bool)
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    kernels = ((robust.HUBER, 2.45), (robust.HUBER, 2.8))
    eng = BlockSolverEngine(s, kernels, BAConfig(dtype=jnp.float32, mxu="interpret"))
    assert eng.use_mxu
    assert eng._early is not None
    # the unpacked consts carry the early-shipped tables
    c = eng.consts
    np.testing.assert_allclose(np.asarray(c.cams), cams, rtol=1e-7)
    raw = s.edge2hpl[: s.mono.count]
    np.testing.assert_array_equal(
        np.asarray(c.mxu.e2h_m)[: s.mono.count],
        np.where(raw < s.n_hpl, raw, -1),  # >= n_hpl means "no Hpl slot"
    )
