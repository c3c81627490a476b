"""cuba_tpu — a TPU-native bundle-adjustment framework (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of fixstars/cuda-bundle-adjustment
for TPU hardware.  The public API mirrors ``cuba::CudaBundleAdjustment``
(reference: include/cuda_bundle_adjustment.h:34-125) so ORB-SLAM-style graphs
drop in unchanged, while the compute path is idiomatic JAX:

* symbolic/structural work happens once at ``initialize()`` (NumPy),
* all numeric work is jitted, static-shaped JAX,
* scatter contention (CUDA atomics) becomes deterministic ``segment_sum``,
* the reduced pose system solves via padded dense blocked Cholesky on the MXU
  (with a block-Jacobi PCG fallback for very large pose counts),
* the whole Levenberg-Marquardt loop runs on device with zero per-iteration
  host synchronisation.
"""

from cuba_tpu import native as _native  # noqa: F401  (applies malloc tuning)
from cuba_tpu.config import BAConfig
from cuba_tpu.models.types import (
    CameraParams,
    PoseVertex,
    LandmarkVertex,
    MonoEdge,
    StereoEdge,
    EdgeType,
    RobustKernelType,
    BatchInfo,
)
from cuba_tpu.models.graph import BundleAdjustment

# Reference-compatible aliases (cuba::CudaBundleAdjustment, types.h:242-245).
CudaBundleAdjustment = BundleAdjustment
VertexP = PoseVertex
VertexL = LandmarkVertex
Edge2D = MonoEdge
Edge3D = StereoEdge

__version__ = "0.1.0"

__all__ = [
    "BAConfig",
    "BundleAdjustment",
    "CudaBundleAdjustment",
    "CameraParams",
    "PoseVertex",
    "LandmarkVertex",
    "MonoEdge",
    "StereoEdge",
    "EdgeType",
    "RobustKernelType",
    "BatchInfo",
    "VertexP",
    "VertexL",
    "Edge2D",
    "Edge3D",
]
