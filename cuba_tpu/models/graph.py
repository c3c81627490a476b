"""Public optimizer API — the TPU counterpart of ``cuba::CudaBundleAdjustment``
(reference: include/cuda_bundle_adjustment.h:34-125, implementation
src/cuda_bundle_adjustment.cpp:677-903).

The method surface is identical (snake_case, with camelCase aliases for
drop-in familiarity): add/remove vertices and edges, lookups, counts,
set_robust_kernels, initialize, optimize, clear, batch_statistics,
time_profile, chi_squared.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from cuba_tpu.config import BAConfig
from cuba_tpu.models.types import (
    BaseEdge,
    BatchInfo,
    EdgeType,
    LandmarkVertex,
    MonoEdge,
    PoseVertex,
    RobustKernelType,
    StereoEdge,
)
from cuba_tpu.solver.engine import PROFILE_ITEMS, BlockSolverEngine, State
from cuba_tpu.solver.structure import build_structure


class BundleAdjustment:
    """Sparse bundle-adjustment optimizer (BlockSolver_6_3 + LM).

    Usage mirrors the reference: construct, add vertices/edges, optionally
    set robust kernels, ``initialize()``, then ``optimize(n)``.  Optimized
    estimates are written back into the vertex objects.
    """

    def __init__(self, config: Optional[BAConfig] = None):
        self.config = config or BAConfig()
        self._poses: Dict[int, PoseVertex] = {}
        self._landmarks: Dict[int, LandmarkVertex] = {}
        # dicts as insertion-ordered sets: O(1) add/remove/contains.  The
        # reference keeps id-maps + per-vertex edge sets for the same
        # reason (cuda_bundle_adjustment.cpp:681-764); a list here made
        # remove_edge O(E) — quadratic for sliding-window SLAM maintenance.
        self._mono_edges: Dict[BaseEdge, None] = {}
        self._stereo_edges: Dict[BaseEdge, None] = {}
        self._kernels = [
            (int(RobustKernelType.NONE), 0.0),
            (int(RobustKernelType.NONE), 0.0),
        ]
        self._engine: Optional[BlockSolverEngine] = None
        self._state: Optional[State] = None
        self._stats = []
        self._time_profile = {k: 0.0 for k in PROFILE_ITEMS}
        self._pending_attr = []
        self._attributed_phases: set = set()
        self._chi_sqs: Dict[BaseEdge, float] = {}

    # --- graph construction (cpp:681-764) --------------------------------

    @classmethod
    def create(cls, config: Optional[BAConfig] = None) -> "BundleAdjustment":
        return cls(config)

    def add_pose_vertex(self, v: PoseVertex) -> None:
        """Register a pose vertex.  Unlike the reference's C++ types (which
        make several invalid states unrepresentable at compile time,
        cuda_bundle_adjustment_types.h:73-131), a Python graph can carry
        malformed objects deep into initialize() — validate at the API edge
        so errors name the actual problem."""
        if v.camera is None:
            raise ValueError(f"PoseVertex id={v.id}: camera must be set")
        if not np.all(np.isfinite(v.q)) or not np.all(np.isfinite(v.t)):
            raise ValueError(f"PoseVertex id={v.id}: non-finite q/t estimate")
        self._poses[v.id] = v

    def add_landmark_vertex(self, v: LandmarkVertex) -> None:
        if not np.all(np.isfinite(v.Xw)):
            raise ValueError(f"LandmarkVertex id={v.id}: non-finite Xw estimate")
        self._landmarks[v.id] = v

    def _check_edge(self, e: BaseEdge, dim: int) -> None:
        if e.dim() != dim:
            raise TypeError(
                f"edge measurement dim {e.dim()} does not match the add_*_edge "
                f"method used (expected {dim})"
            )
        if e.vertexP is None or e.vertexL is None:
            raise ValueError("edge endpoints vertexP/vertexL must both be set")
        if self._poses.get(e.vertexP.id) is not e.vertexP:
            raise ValueError(
                f"edge.vertexP (id={e.vertexP.id}) is not a registered pose "
                "vertex — add_pose_vertex it first"
            )
        if self._landmarks.get(e.vertexL.id) is not e.vertexL:
            raise ValueError(
                f"edge.vertexL (id={e.vertexL.id}) is not a registered landmark "
                "vertex — add_landmark_vertex it first"
            )
        if not (e.information >= 0.0):  # also rejects NaN
            raise ValueError(f"edge.information must be >= 0, got {e.information}")

    def add_monocular_edge(self, e: MonoEdge) -> None:
        self._check_edge(e, 2)
        self._mono_edges[e] = None
        e.vertexP.edges.add(e)
        e.vertexL.edges.add(e)

    def add_stereo_edge(self, e: StereoEdge) -> None:
        self._check_edge(e, 3)
        self._stereo_edges[e] = None
        e.vertexP.edges.add(e)
        e.vertexL.edges.add(e)

    def pose_vertex(self, vid: int) -> PoseVertex:
        return self._poses[vid]

    def landmark_vertex(self, vid: int) -> LandmarkVertex:
        return self._landmarks[vid]

    def remove_pose_vertex(self, v: PoseVertex) -> None:
        found = self._poses.pop(v.id, None)
        if found is None:
            return
        for e in list(found.edges):
            self.remove_edge(e)

    def remove_landmark_vertex(self, v: LandmarkVertex) -> None:
        found = self._landmarks.pop(v.id, None)
        if found is None:
            return
        for e in list(found.edges):
            self.remove_edge(e)

    def remove_edge(self, e: BaseEdge) -> None:
        e.vertexP.edges.discard(e)
        e.vertexL.edges.discard(e)
        self._mono_edges.pop(e, None)
        self._stereo_edges.pop(e, None)

    def nposes(self) -> int:
        return len(self._poses)

    def nlandmarks(self) -> int:
        return len(self._landmarks)

    def nedges(self) -> int:
        return len(self._mono_edges) + len(self._stereo_edges)

    def set_robust_kernels(
        self, kernel_type: RobustKernelType, delta: float, edge_type: EdgeType
    ) -> None:
        """One robust kernel per edge *type* (reference README.md:47, cpp:781-784)."""
        self._kernels[int(edge_type)] = (int(kernel_type), float(delta))

    # --- optimization (cpp:786-857) ---------------------------------------

    def initialize(self) -> None:
        """Compile the graph into a static problem structure (cpp:115-261)."""
        t0 = time.perf_counter()
        structure = build_structure(
            sorted(self._poses.keys()),
            self._poses,
            sorted(self._landmarks.keys()),
            self._landmarks,
            self._mono_edges,
            self._stereo_edges,
        )
        t_structure = time.perf_counter() - t0
        if self.config.mesh is not None:
            from cuba_tpu.parallel.sharding import MultiChipSolverAdapter

            self._engine = MultiChipSolverAdapter(
                structure, self._kernels, self.config, self.config.mesh
            )
        else:
            self._engine = BlockSolverEngine(structure, self._kernels, self.config)
        # None = "pristine initial state still packed in the upload blobs":
        # the first optimize() unpacks it inside the LM dispatch (engine
        # fast path); materialized lazily by anything else that needs it
        self._state = None
        self._stats = []
        self._time_profile = {k: 0.0 for k in PROFILE_ITEMS}
        # phase split mirrors the reference's initialize
        # (cuda_bundle_adjustment.cpp:115-261): graph->arrays compilation is
        # "Build Structure", solver construction/upload is "Initialize
        # Optimizer".  "5: Symbolic Decomposition" stays 0 by design: the
        # dense blocked Cholesky has no symbolic pass (SURVEY.md §6).
        self._time_profile["1: Build Structure"] = t_structure
        self._time_profile["0: Initialize Optimizer"] = (
            time.perf_counter() - t0 - t_structure
        )
        self._pending_attr = []
        self._attributed_phases = set()

    def optimize(self, niterations: int, profile: bool = False) -> None:
        """Run the LM loop.  With profile=True, uses the host-stepped driver
        that reproduces the reference's 8-phase TimeProfile."""
        if self._engine is None:
            raise RuntimeError("call initialize() before optimize()")
        t0 = time.perf_counter()
        if profile:
            result, prof = self._engine.optimize_profiled(self._state, niterations)
            for k, v in prof.items():
                self._time_profile[k] += v
        else:
            result = jax.block_until_ready(self._engine.optimize(self._state, niterations))
        total = time.perf_counter() - t0

        self._state = result.state
        n = int(result.niters)
        chis = np.asarray(result.chis)[:n]
        self._stats = [BatchInfo(i, float(c)) for i, c in enumerate(chis)]
        if not profile:
            # exact measured total under a dedicated key; the reference
            # phase keys are filled lazily by time_profile() via the
            # per-spec calibration (config.phase_attribution)
            self._time_profile["optimize (fused device loop)"] = (
                self._time_profile.get("optimize (fused device loop)", 0.0) + total
            )
            self._pending_attr.append((total, n, int(result.nattempts)))

        self._finalize()
        self._update_chi_squares()

    def _finalize(self) -> None:
        """Write optimized estimates back into vertex objects (cpp:512-526)."""
        s = self._engine.structure
        qs = np.asarray(self._state.qs, dtype=np.float64)
        ts = np.asarray(self._state.ts, dtype=np.float64)
        Xws = np.asarray(self._state.Xws, dtype=np.float64)
        for v in self._poses.values():
            if 0 <= v.iP < s.total_p and v.edges:
                v.q = qs[v.iP].copy()
                v.t = ts[v.iP].copy()
        for v in self._landmarks.values():
            if 0 <= v.iL < s.total_l and v.edges:
                v.Xw = Xws[v.iL].copy()

    def _update_chi_squares(self) -> None:
        """Per-edge unrobustified chi2 query support (cpp:528-543)."""
        values = self._engine.chi_squares(self._state)
        self._chi_sqs = {}
        i = 0
        for e in self._active_edges():
            self._chi_sqs[e] = float(values[i])
            i += 1

    def _active_edges(self):
        for e in self._mono_edges:
            if not (e.vertexP.fixed and e.vertexL.fixed):
                yield e
        for e in self._stereo_edges:
            if not (e.vertexP.fixed and e.vertexL.fixed):
                yield e

    def clear(self) -> None:
        self._poses.clear()
        self._landmarks.clear()
        self._mono_edges.clear()
        self._stereo_edges.clear()
        self._stats = []
        self._engine = None
        self._state = None
        self._pending_attr = []

    # --- checkpoint / resume ----------------------------------------------
    # New capability vs the reference, which only push/pops LM trial state
    # in device memory (cuda_bundle_adjustment.cpp:502-510): persist the
    # current vertex estimates (+ per-iteration statistics) to disk and
    # restore them into a graph with the same vertex ids — long
    # optimizations can resume across processes.

    def save_checkpoint(self, path: str) -> None:
        """Persist current estimates and statistics to an .npz file."""
        pids = sorted(self._poses)
        lids = sorted(self._landmarks)
        np.savez(
            path,
            pose_ids=np.asarray(pids, np.int64),
            qs=np.stack([self._poses[i].q for i in pids]) if pids else np.zeros((0, 4)),
            ts=np.stack([self._poses[i].t for i in pids]) if pids else np.zeros((0, 3)),
            lm_ids=np.asarray(lids, np.int64),
            Xws=np.stack([self._landmarks[i].Xw for i in lids]) if lids else np.zeros((0, 3)),
            stats_iter=np.asarray([s.iteration for s in self._stats], np.int64),
            stats_chi2=np.asarray([s.chi2 for s in self._stats], np.float64),
        )

    def load_checkpoint(self, path: str) -> None:
        """Restore estimates saved by :meth:`save_checkpoint`.

        Vertices are matched by id; ids present in the file but not in the
        graph are ignored, graph vertices missing from the file keep their
        current estimates.  Call before ``initialize()`` (or re-initialize
        afterwards) so the solver picks up the restored state."""
        data = np.load(path)
        for i, pid in enumerate(data["pose_ids"]):
            v = self._poses.get(int(pid))
            if v is not None:
                v.q = data["qs"][i].copy()
                v.t = data["ts"][i].copy()
        for i, lid in enumerate(data["lm_ids"]):
            v = self._landmarks.get(int(lid))
            if v is not None:
                v.Xw = data["Xws"][i].copy()
        self._stats = [
            BatchInfo(int(it), float(c))
            for it, c in zip(data["stats_iter"], data["stats_chi2"])
        ]

    saveCheckpoint = save_checkpoint
    loadCheckpoint = load_checkpoint

    def batch_statistics(self):
        return self._stats

    def time_profile(self):
        """Reference 8-phase TimeProfile (cuda_bundle_adjustment.cpp:545-562).

        After a normal (fused) ``optimize()``, the per-phase entries are
        measured-ratio attributions: the first call runs a one-time
        per-phase calibration (cached per compiled problem spec, may JIT a
        few phase kernels) and splits each fused run's measured wall time
        by the calibrated ratios; the exact total stays under
        "optimize (fused device loop)".  ``optimize(n, profile=True)``
        gives host-timed exact phases instead."""
        pending = getattr(self, "_pending_attr", None)
        if (
            pending
            and self.config.phase_attribution
            and hasattr(self._engine, "attribute_phases")
        ):
            for total, n, natt in pending:
                for k, v in self._engine.attribute_phases(total, n, natt).items():
                    self._time_profile[k] += v
                    self._attributed_phases.add(k)
            self._pending_attr = []
        return self._time_profile

    def attributed_phases(self) -> set:
        """Phase keys of :meth:`time_profile` whose values are calibrated
        attributions of a fused run's wall time rather than direct host
        measurements (the fused path cannot host-time interior phases).
        Empty after ``optimize(n, profile=True)``, which times every phase
        exactly.  Printers should mark these rows (see
        samples/sample_ba_from_file.py)."""
        return set(self._attributed_phases)

    def chi_squared(self, e: BaseEdge) -> float:
        return self._chi_sqs.get(e, 0.0)

    # --- camelCase parity aliases (cuda_bundle_adjustment.h:42-120) -------
    addPoseVertex = add_pose_vertex
    addLandmarkVertex = add_landmark_vertex
    addMonocularEdge = add_monocular_edge
    addStereoEdge = add_stereo_edge
    poseVertex = pose_vertex
    landmarkVertex = landmark_vertex
    removePoseVertex = remove_pose_vertex
    removeLandmarkVertex = remove_landmark_vertex
    removeEdge = remove_edge
    setRobustKernels = set_robust_kernels
    batchStatistics = batch_statistics
    timeProfile = time_profile
    chiSquared = chi_squared
