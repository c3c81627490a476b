"""Unit tests for the problem compiler (symbolic pass): index assignment,
edge gathering, Hpl CSC pattern, Hsc co-observation pattern, mul triplets.
Reference semantics: src/cuda_bundle_adjustment.cpp:115-261 (partition +
gather), sparse_block_matrix.cpp:55-133 (Hsc pattern)."""

import numpy as np
import pytest

from cuba_tpu.models.types import CameraParams, LandmarkVertex, MonoEdge, PoseVertex, StereoEdge
from cuba_tpu.models.graph import BundleAdjustment
from cuba_tpu.solver.structure import build_structure, build_structure_from_arrays


def tiny_graph():
    cam = CameraParams(700, 700, 320, 240, 100)
    ba = BundleAdjustment()
    # pose ids deliberately out of order; pose 5 fixed
    for pid, fixed in ((5, True), (2, False), (9, False)):
        ba.add_pose_vertex(PoseVertex(pid, [0, 0, 0, 1], [pid, 0, 0], cam, fixed))
    # landmark 3 fixed
    for lid, fixed in ((3, True), (1, False), (7, False), (4, False)):
        ba.add_landmark_vertex(LandmarkVertex(lid, [lid, 0, 5], fixed))
    P, L = ba.pose_vertex, ba.landmark_vertex
    edges = [
        MonoEdge([1, 2], 1.0, P(2), L(1)),
        MonoEdge([3, 4], 2.0, P(9), L(1)),
        MonoEdge([5, 6], 3.0, P(2), L(7)),
        MonoEdge([0, 0], 9.0, P(5), L(3)),  # both fixed -> dropped
        StereoEdge([7, 8, 9], 4.0, P(9), L(4)),
        StereoEdge([1, 1, 1], 5.0, P(5), L(4)),  # fixed pose, free lm -> kept
        MonoEdge([2, 2], 6.0, P(2), L(3)),  # free pose, fixed lm -> kept
    ]
    for e in edges:
        if e.dim() == 2:
            ba.add_monocular_edge(e)
        else:
            ba.add_stereo_edge(e)
    return ba


def compiled(ba):
    return build_structure(
        sorted(ba._poses), ba._poses, sorted(ba._landmarks), ba._landmarks,
        ba._mono_edges, ba._stereo_edges,
    )


class TestStructure:
    def test_partition_active_first(self):
        s = compiled(tiny_graph())
        assert (s.num_p, s.total_p) == (2, 3)  # poses 2,9 active; 5 fixed
        assert (s.num_l, s.total_l) == (3, 4)  # lms 1,4,7 active; 3 fixed
        # active in ascending id order: pose 2 -> iP 0, pose 9 -> iP 1, pose 5 -> iP 2
        np.testing.assert_array_equal(s.ts[:, 0], [2, 9, 5])
        # active landmarks are ordered by min observing pose (locality
        # renumbering for the MXU window plans), ties by id:
        # lm1 (pose iP0), lm7 (pose iP0), lm4 (pose iP1) -> [1, 7, 4]; fixed after
        np.testing.assert_array_equal(s.Xws[:, 0], [1, 7, 4, 3])

    def test_edge_gather_drops_both_fixed(self):
        s = compiled(tiny_graph())
        assert s.mono.count == 4  # one mono edge dropped
        assert s.stereo.count == 2
        # mono omegas in insertion order minus the dropped one
        np.testing.assert_array_equal(s.mono.omegas, [1, 2, 3, 6])

    def test_hpl_pattern(self):
        s = compiled(tiny_graph())
        # landmark renumbering: lm1->0, lm7->1, lm4->2.  Both-free pairs:
        # (p2,l1)=(0,0), (p9,l1)=(1,0), (p2,l7)=(0,1), (p9,l4)=(1,2)
        assert s.n_hpl == 4
        # sorted by (col, row)
        np.testing.assert_array_equal(s.hpl_col, [0, 0, 1, 2])
        np.testing.assert_array_equal(s.hpl_row, [0, 1, 0, 1])
        # edge2hpl follows the internal (landmark, pose)-sorted edge order
        e2h = s.edge2hpl
        assert e2h[0] == 0 and e2h[1] == 1 and e2h[2] == 2
        assert e2h[3] == s.n_hpl  # fixed-lm edge: no slot
        assert e2h[4] == 3
        assert e2h[5] == s.n_hpl  # fixed-pose edge: no slot

    def test_hsc_pattern_and_triplets(self):
        s = compiled(tiny_graph())
        # lm col 0 seen by poses {0,1} -> pairs (0,0),(0,1),(1,1)
        # lm col 1 (old lm7) seen by {0} -> (0,0); col 2 (old lm4) by {1} -> (1,1)
        assert s.n_hsc == 3
        np.testing.assert_array_equal(s.hsc_row, [0, 0, 1])
        np.testing.assert_array_equal(s.hsc_col, [0, 1, 1])
        assert s.n_mul == 5
        # triplets in landmark-major generation order: mul_i non-decreasing,
        # i <= j within each pair (the layout the fused Schur kernel plans on)
        assert np.all(s.mul_i[:-1] <= s.mul_i[1:])
        assert np.all(s.mul_i <= s.mul_j)
        np.testing.assert_array_equal(s.hpl_col[s.mul_i], s.hpl_col[s.mul_j])
        assert np.all(s.hpl_row[s.mul_i] == s.hsc_row[s.mul_k])
        assert np.all(s.hpl_row[s.mul_j] == s.hsc_col[s.mul_k])

    def test_duplicate_pose_landmark_pair_shares_slot(self):
        cam = CameraParams(700, 700, 320, 240, 100)
        ba = BundleAdjustment()
        ba.add_pose_vertex(PoseVertex(0, [0, 0, 0, 1], [0, 0, 0], cam))
        ba.add_landmark_vertex(LandmarkVertex(0, [0, 0, 5]))
        P, L = ba.pose_vertex(0), ba.landmark_vertex(0)
        ba.add_monocular_edge(MonoEdge([1, 1], 1.0, P, L))
        ba.add_stereo_edge(StereoEdge([1, 1, 1], 1.0, P, L))
        s = compiled(ba)
        assert s.n_hpl == 1  # deduplicated
        assert s.edge2hpl[0] == 0 and s.edge2hpl[1] == 0

    def test_from_arrays_matches_object_path(self):
        ba = tiny_graph()
        s1 = compiled(ba)
        # reconstruct via arrays (ids 2,5,9 -> order by id: [2,5,9])
        pose_ids = sorted(ba._poses)
        lm_ids = sorted(ba._landmarks)
        pid_to_idx = {p: i for i, p in enumerate(pose_ids)}
        lid_to_idx = {l: i for i, l in enumerate(lm_ids)}
        qs = np.stack([ba.pose_vertex(p).q for p in pose_ids])
        ts = np.stack([ba.pose_vertex(p).t for p in pose_ids])
        cams = np.stack([ba.pose_vertex(p).camera.to_array() for p in pose_ids])
        Xws = np.stack([ba.landmark_vertex(l).Xw for l in lm_ids])
        fp = np.array([ba.pose_vertex(p).fixed for p in pose_ids])
        fl = np.array([ba.landmark_vertex(l).fixed for l in lm_ids])
        m = ba._mono_edges
        st = ba._stereo_edges
        s2 = build_structure_from_arrays(
            qs, ts, cams, Xws, fp, fl,
            [pid_to_idx[e.vertexP.id] for e in m],
            [lid_to_idx[e.vertexL.id] for e in m],
            [e.measurement for e in m],
            [e.information for e in m],
            [pid_to_idx[e.vertexP.id] for e in st],
            [lid_to_idx[e.vertexL.id] for e in st],
            [e.measurement for e in st],
            [e.information for e in st],
        )
        assert s1.shape_signature() == s2.shape_signature()
        np.testing.assert_array_equal(s1.hpl_row, s2.hpl_row)
        np.testing.assert_array_equal(s1.hpl_col, s2.hpl_col)
        np.testing.assert_array_equal(s1.edge2hpl, s2.edge2hpl)
        np.testing.assert_array_equal(s1.mul_k, s2.mul_k)
        np.testing.assert_allclose(s1.qs, s2.qs)
        np.testing.assert_allclose(s1.Xws, s2.Xws)
        np.testing.assert_allclose(s1.mono.measurements, s2.mono.measurements)


class TestJsonIO:
    def test_roundtrip(self, tmp_path):
        from cuba_tpu.io import json_io, synthetic

        prob = synthetic.generate(num_poses=5, num_landmarks=20, seed=2)
        ba = synthetic.build_graph(prob)
        path = str(tmp_path / "g.json")
        json_io.write_graph(ba, path)
        ba2 = json_io.read_graph(path)
        assert ba2.nposes() == ba.nposes()
        assert ba2.nlandmarks() == ba.nlandmarks()
        assert ba2.nedges() == ba.nedges()
        s1 = compiled(ba)
        s2 = compiled(ba2)
        assert s1.shape_signature() == s2.shape_signature()
        np.testing.assert_allclose(s1.qs, s2.qs)
        np.testing.assert_allclose(s1.mono.measurements, s2.mono.measurements)
        np.testing.assert_allclose(s1.stereo.omegas, s2.stereo.omegas)


class TestNativeParity:
    """The C++ symbolic compiler (cuba_tpu/native/symbolic.cpp) must produce
    the exact same structure as the NumPy fallback."""

    def _both(self, e_pi, e_li, num_p, num_l):
        """Run _finish_structure twice — with the C++ compiler and with the
        NumPy fallback — on identical inputs and return both structures."""
        from cuba_tpu import native
        from cuba_tpu.solver import structure as st

        if native.get_lib() is None:
            pytest.skip("native toolchain unavailable")

        def run():
            mono = st.EdgeArrays(np.zeros((len(e_pi), 2)), np.ones(len(e_pi)),
                                 np.asarray(e_pi, np.int32), np.asarray(e_li, np.int32))
            stereo = st.EdgeArrays(np.zeros((0, 3)), np.zeros(0),
                                   np.zeros(0, np.int32), np.zeros(0, np.int32))
            return st._finish_structure(num_p, num_l, num_p, num_l,
                                        np.zeros((num_p, 4)), np.zeros((num_p, 3)),
                                        np.zeros((num_p, 5)), np.zeros((num_l, 3)),
                                        mono, stereo)

        s_native = run()
        orig = native.symbolic_compile
        native.symbolic_compile = lambda *a, **k: None
        try:
            s_numpy = run()
        finally:
            native.symbolic_compile = orig
        return s_native, s_numpy

    def test_random_graph_parity(self):
        rng = np.random.default_rng(42)
        num_p, num_l, E = 17, 61, 400
        e_pi = rng.integers(0, num_p + 3, E).astype(np.int32)  # some >= num_p (fixed)
        e_li = rng.integers(0, num_l + 5, E).astype(np.int32)
        n, s = self._both(e_pi, e_li, num_p, num_l)
        assert np.array_equal(n.hpl_row, s.hpl_row)
        assert np.array_equal(n.hpl_col, s.hpl_col)
        assert np.array_equal(n.edge2hpl, s.edge2hpl)
        assert np.array_equal(n.hsc_row, s.hsc_row)
        assert np.array_equal(n.hsc_col, s.hsc_col)
        assert np.array_equal(n.mul_k, s.mul_k)
        a = np.stack([n.mul_k, n.mul_i, n.mul_j])
        b = np.stack([s.mul_k, s.mul_i, s.mul_j])
        assert np.array_equal(a[:, np.lexsort(a[::-1])], b[:, np.lexsort(b[::-1])])
        assert np.array_equal(n.mono_perm, s.mono_perm)
        assert np.array_equal(n.lm_rank, s.lm_rank)

    def test_empty_and_degenerate(self):
        for num_p, num_l, E in ((5, 0, 0), (0, 5, 0), (3, 4, 0)):
            e_pi = np.zeros(E, np.int32)
            e_li = np.zeros(E, np.int32)
            n, s = self._both(e_pi, e_li, num_p, num_l)
            assert n.hpl_row.size == s.hpl_row.size == 0


def test_canonical_ntri_native_matches_numpy():
    """C++ canonical-enumeration check (native.canonical_ntri) vs the NumPy
    twin in mxu._canonical_schur_ntri: same count on the canonical stream,
    both reject a perturbed one."""
    import cuba_tpu.native as N
    from cuba_tpu import native
    from cuba_tpu.io import synthetic
    from cuba_tpu.solver import mxu
    from cuba_tpu.solver.structure import build_structure_from_arrays

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    prob = synthetic.generate(num_poses=40, num_landmarks=400, seed=3)
    cams = np.tile(prob.cam, (40, 1))
    fp = np.zeros(40, bool)
    fp[prob.fixed_poses] = True
    s = build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fp, np.zeros(400, bool),
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )
    sc = mxu.plan_schur_for(s)
    col = np.asarray(s.hpl_col, np.int64)

    def numpy_ref(plan):
        orig = N.canonical_ntri
        N.canonical_ntri = lambda *a, **k: None
        try:
            return mxu._canonical_schur_ntri(plan, col)
        finally:
            N.canonical_ntri = orig

    nat = native.canonical_ntri(sc.li, sc.lj, sc.sb, sc.chunk, sc.slot_block, col)
    ref = numpy_ref(sc)
    assert nat == ref and nat > 0, (nat, ref)

    li = np.asarray(sc.li).copy()
    v = np.flatnonzero(li >= 0)
    i = next(k for k in range(len(v) - 1) if li[v[k]] != li[v[k + 1]])
    li[v[i]], li[v[i + 1]] = li[v[i + 1]], li[v[i]]
    sc2 = sc.__class__(sc.chunk, sc.slot_block, sc.kwin, sc.num_chunks, sc.sb,
                       li, sc.lj, sc.lk, sc.gid, sc.n_slot_pad, sc.n_hsc_pad,
                       sc.ok)
    nat2 = native.canonical_ntri(li, sc2.lj, sc2.sb, sc2.chunk,
                                 sc2.slot_block, col)
    assert nat2 == -1 and numpy_ref(sc2) == -1


def test_native_abi_gate_rejects_stale_library(monkeypatch):
    """get_lib() hard-gates on ba_abi_version: a library whose exported
    symbols resolve but whose ABI differs (stale build product, copied-in
    .so) must not be used — its buffer contracts may differ (an old 5-arg
    ba_symbolic_compile would overflow the geometry-sized fused-plan
    buffers).  The bad file is removed so the NEXT process rebuilds."""
    import os

    from cuba_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    # fresh gate evaluation with a wrong-ABI report
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib_abi", lambda lib: native._ABI_VERSION + 1)
    assert native.get_lib() is None
    assert not os.path.exists(native._LIB_PATH)  # bad file removed
    # restore: next get_lib() rebuilds from source and passes the real gate
    monkeypatch.undo()
    native._lib, native._tried = None, False
    lib = native.get_lib()
    assert lib is not None and native._lib_abi(lib) == native._ABI_VERSION
