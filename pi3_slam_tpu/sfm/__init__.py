"""TPU-native SfM core: fixed-shape track stores, batched bundle adjustment
(damped Gauss-Newton with dense Schur complement), Sim3 chunk alignment.

Replaces the reference's PyTheia/Ceres C++ backend
(utils/chunk_reconstruction.py, utils/reconstruction_alignment.py) with
jit-compiled JAX solvers over padded static shapes.
"""

from .ba import BAProblem, bundle_adjust, reprojection_errors
from .reconstruction import ChunkReconstruction, build_chunk_reconstruction
from .alignment import align_chunks, AlignmentResult

__all__ = [
    "BAProblem",
    "bundle_adjust",
    "reprojection_errors",
    "ChunkReconstruction",
    "build_chunk_reconstruction",
    "align_chunks",
    "AlignmentResult",
]
