"""TPU-native SfM core: fixed-shape track stores, batched bundle adjustment
(damped Gauss-Newton with dense Schur complement), Sim3 chunk alignment.

Replaces the reference's PyTheia/Ceres C++ backend
(utils/chunk_reconstruction.py, utils/reconstruction_alignment.py) with
jit-compiled JAX solvers over padded static shapes.
"""

from .ba import BAProblem, bundle_adjust, reprojection_errors
from .reconstruction import ChunkReconstruction, build_chunk_reconstruction
from .alignment import align_chunks, AlignmentResult
from .posegraph import optimize_sim3_pose_graph, PoseGraphResult
from .loops import close_loops, detect_loop_closures, LoopEdge
from .localize import (
    ransac_pnp,
    localize_by_descriptors,
    register_reconstruction,
    triangulate_points,
    build_query_tracks,
    LocalizationResult,
    RegistrationResult,
)

__all__ = [
    "BAProblem",
    "bundle_adjust",
    "reprojection_errors",
    "ChunkReconstruction",
    "build_chunk_reconstruction",
    "align_chunks",
    "AlignmentResult",
    "optimize_sim3_pose_graph",
    "PoseGraphResult",
    "close_loops",
    "detect_loop_closures",
    "LoopEdge",
    "ransac_pnp",
    "localize_by_descriptors",
    "register_reconstruction",
    "triangulate_points",
    "build_query_tracks",
    "LocalizationResult",
    "RegistrationResult",
]
