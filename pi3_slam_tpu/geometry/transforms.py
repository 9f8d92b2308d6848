"""SE3 / SO3 transform primitives.

Semantics match the reference pipeline (see /root/reference):
  * ``se3_inverse``       — pi3/utils/geometry.py:5-40 (batched 4x4 inverse by
                            transpose/rotate, not jnp.linalg.inv)
  * ``homogenize_points`` — pi3/utils/geometry.py:116-120
  * ``svd_orthogonalize`` — pi3/models/layers/camera_head.py:77-96 (9D -> SO3)

Everything is pure jnp, batched over arbitrary leading dims, jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmul


def homogenize_points(points: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last dim: (..., D) -> (..., D+1)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


@f32_matmul
def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 4, 4) rigid transforms: inv([R t; 0 1]) = [R^T -R^T t; 0 1]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    t_new = -Rt @ t
    top = jnp.concatenate([Rt, t_new], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


@f32_matmul
def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) transforms to (..., N, 3) points -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


@f32_matmul
def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Uses Taylor-safe coefficients so it is differentiable through w = 0.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map: (..., 3, 3) rotation -> (..., 3) axis-angle.

    Standard branch for theta in (0, pi); safe at identity. Not intended for
    theta == pi exactly (measure-zero; BA updates never land there).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = theta < 1e-6
    # theta / (2 sin theta), Taylor ~ 1/2 + theta^2/12
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * jnp.sin(theta), 1e-24),
    )
    return v * scale[..., None]


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) in (w, x, y, z) order -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotation_matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) (w, x, y, z).

    Branchless Shepperd's method: compute all four candidate quaternions and
    select the one keyed by the largest of (trace, R00, R11, R22) — numerically
    stable for every rotation, vmap/jit friendly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # candidate 0: trace-dominant
    s0 = _safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # candidate 1: R00 dominant
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # candidate 2: R11 dominant
    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # candidate 3: R22 dominant
    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


@f32_matmul
def svd_orthogonalize(m: jnp.ndarray) -> jnp.ndarray:
    """Project 9D/3x3 matrices onto SO(3) via SVD.

    Mirrors the reference CameraHead (pi3/models/layers/camera_head.py:77-96):
    rows are L2-normalized, then the closest rotation (det=+1) to the
    transposed matrix is computed and returned.
    """
    m = m.reshape(m.shape[:-1] + (3, 3)) if m.shape[-1] == 9 else m
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    mt = jnp.swapaxes(m, -1, -2)
    u, s, vt = jnp.linalg.svd(mt, full_matrices=False)
    v = jnp.swapaxes(vt, -1, -2)
    det = jnp.linalg.det(v @ jnp.swapaxes(u, -1, -2))
    v_fix = jnp.concatenate([v[..., :, :-1], v[..., :, -1:] * det[..., None, None]], axis=-1)
    return v_fix @ jnp.swapaxes(u, -1, -2)
