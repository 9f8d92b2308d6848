"""Pure-JAX geometry core: SE3/Sim3 transforms, rotation parametrizations,
depth-map utilities, and camera/focal recovery.

All functions are jit/vmap-friendly (static shapes, no Python branching on
traced values) and run on CPU or TPU.
"""

from .transforms import (
    se3_inverse,
    homogenize_points,
    transform_points,
    quaternion_to_rotation_matrix,
    rotation_matrix_to_quaternion,
    svd_orthogonalize,
    skew,
    so3_exp,
    so3_log,
)
from .sim3 import (
    Sim3,
    umeyama,
    sim3_matrix,
    sim3_apply,
    sim3_inverse,
    sim3_compose,
    sim3_exp,
    sim3_log,
    robust_umeyama,
)
from .maps import (
    depth_edge,
    normalized_view_plane_uv,
    nearest_resize,
)
from .focal import (
    recover_focal_shift,
    estimate_camera_parameters,
    intrinsics_from_focal_center,
)

__all__ = [
    "se3_inverse",
    "homogenize_points",
    "transform_points",
    "quaternion_to_rotation_matrix",
    "rotation_matrix_to_quaternion",
    "svd_orthogonalize",
    "skew",
    "so3_exp",
    "so3_log",
    "Sim3",
    "umeyama",
    "robust_umeyama",
    "sim3_matrix",
    "sim3_apply",
    "sim3_inverse",
    "sim3_compose",
    "sim3_exp",
    "sim3_log",
    "depth_edge",
    "normalized_view_plane_uv",
    "nearest_resize",
    "recover_focal_shift",
    "estimate_camera_parameters",
    "intrinsics_from_focal_center",
]
