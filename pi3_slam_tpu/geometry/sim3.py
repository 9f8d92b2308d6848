"""Sim3 similarity transforms and Umeyama point-set alignment.

Replaces the reference's PyTheia ``OptimizeAlignmentSim3`` /
``pt.math.Sim3d`` / ``TransformReconstruction4`` C++ path
(utils/reconstruction_alignment.py:89-105) with a closed-form weighted
Umeyama fit plus a Huber-IRLS refinement — fixed iteration count, jittable,
vmappable over many alignments at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmul



class Sim3(NamedTuple):
    """Similarity transform x -> scale * R @ x + t."""

    scale: jnp.ndarray  # ()
    rotation: jnp.ndarray  # (3, 3)
    translation: jnp.ndarray  # (3,)


def sim3_matrix(s: Sim3) -> jnp.ndarray:
    """4x4 matrix [sR t; 0 1]."""
    top = jnp.concatenate(
        [s.scale[..., None, None] * s.rotation, s.translation[..., :, None]], axis=-1
    )
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


@f32_matmul
def sim3_apply(s: Sim3, points: jnp.ndarray) -> jnp.ndarray:
    """Apply to (..., 3) points."""
    return s.scale * (points @ jnp.swapaxes(s.rotation, -1, -2)) + s.translation


def sim3_inverse(s: Sim3) -> Sim3:
    """Inverse; batched over leading dims (scale (...,), rotation (..., 3, 3))."""
    Rt = jnp.swapaxes(s.rotation, -1, -2)
    inv_scale = 1.0 / jnp.asarray(s.scale)
    return Sim3(
        scale=inv_scale,
        rotation=Rt,
        translation=-inv_scale[..., None]
        * jnp.einsum("...ij,...j->...i", Rt, s.translation),
    )


@f32_matmul
def sim3_compose(a: Sim3, b: Sim3) -> Sim3:
    """Composition (a o b)(x) = a(b(x)); batched over leading dims."""
    return Sim3(
        scale=a.scale * b.scale,
        rotation=a.rotation @ b.rotation,
        translation=jnp.asarray(a.scale)[..., None]
        * jnp.einsum("...ij,...j->...i", a.rotation, b.translation)
        + a.translation,
    )


def sim3_identity(dtype=jnp.float32) -> Sim3:
    return Sim3(
        scale=jnp.ones((), dtype), rotation=jnp.eye(3, dtype=dtype), translation=jnp.zeros(3, dtype)
    )


def _sim3_w_coeffs(theta2: jnp.ndarray, sigma: jnp.ndarray):
    """Coefficients (A, B, C) of the Sim3 left-Jacobian-style matrix
    W = C*I + A*K + B*K^2 (K = skew(phi)) with t = W @ rho, derived from
    W = integral_0^1 e^(sigma*u) exp(u*K) du. Taylor-safe at theta = 0 and
    sigma = 0 (double-where guards), so sim3_exp is differentiable through
    the identity tangent — required by the pose-graph retraction."""
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small_t = theta2 < 1e-12
    sigma2 = sigma * sigma
    small_s = sigma2 < 1e-12
    s = jnp.exp(sigma)

    sigma_safe = jnp.where(small_s, 1.0, sigma)
    sigma2_safe = jnp.where(small_s, 1.0, sigma2)
    theta_safe = jnp.where(small_t, 1.0, theta)
    theta2_safe = jnp.where(small_t, 1.0, theta2)
    c_safe = theta2_safe + sigma2  # >= theta2 >= 1e-12 on the general branch

    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    a_ = s * sin_t
    b_ = s * cos_t

    # C = (e^sigma - 1) / sigma
    C = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma2 / 6.0, (s - 1.0) / sigma_safe)

    # A = (1/theta) * int e^(sigma u) sin(u theta) du
    A_gen = (a_ * sigma + (1.0 - b_) * theta) / (theta_safe * c_safe)
    A_small = jnp.where(
        small_s,
        0.5 + sigma / 3.0 + sigma2 / 8.0,
        (s * (sigma - 1.0) + 1.0) / sigma2_safe,
    )
    A = jnp.where(small_t, A_small, A_gen)

    # B = (C - int e^(sigma u) cos(u theta) du) / theta^2
    B_gen = (C - ((b_ - 1.0) * sigma + a_ * theta) / c_safe) / theta2_safe
    B_small = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0 + sigma2 / 20.0,
        (s * (sigma2 - 2.0 * sigma + 2.0) - 2.0) / (2.0 * sigma2_safe * sigma_safe),
    )
    B = jnp.where(small_t, B_small, B_gen)
    return A, B, C


@f32_matmul
def sim3_exp(xi: jnp.ndarray) -> Sim3:
    """Exponential map: tangent (..., 7) [rho(3), phi(3), sigma] -> Sim3.

    Matches expm of the 4x4 algebra matrix [[sigma*I + skew(phi), rho], [0, 0]]
    (tested against scipy.linalg.expm). Batched over leading dims; Taylor-safe
    and differentiable at xi = 0 (the pose-graph linearization point)."""
    from .transforms import skew, so3_exp

    rho, phi, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, C = _sim3_w_coeffs(theta2, sigma)
    K = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    W = C[..., None, None] * eye + A[..., None, None] * K + B[..., None, None] * (K @ K)
    return Sim3(
        scale=jnp.exp(sigma),
        rotation=so3_exp(phi),
        translation=jnp.einsum("...ij,...j->...i", W, rho),
    )


@f32_matmul
def sim3_log(s: Sim3) -> jnp.ndarray:
    """Log map: Sim3 -> tangent (..., 7) [rho, phi, sigma]; inverse of
    sim3_exp (roundtrip-tested). Inherits so3_log's domain (theta < pi);
    not intended to be differentiated at the theta = pi cut."""
    from .transforms import skew, so3_log

    sigma = jnp.log(s.scale)
    phi = so3_log(s.rotation)
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, C = _sim3_w_coeffs(theta2, sigma)
    K = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    W = C[..., None, None] * eye + A[..., None, None] * K + B[..., None, None] * (K @ K)
    rho = jnp.linalg.solve(W, s.translation[..., None])[..., 0]
    return jnp.concatenate(
        [rho, phi, jnp.asarray(sigma)[..., None]], axis=-1
    )


@f32_matmul
def umeyama(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = True,
) -> Sim3:
    """Weighted Umeyama alignment: find Sim3 minimizing sum w |s R src + t - dst|^2.

    src, dst: (N, 3); weights: (N,) nonnegative (zeros = ignored points).
    Closed-form SVD solution (Umeyama 1991), the same estimator PyTheia's
    POINT_TO_POINT Sim3 alignment converges to.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_src = jnp.sum(w[:, None] * src, axis=0)
    mu_dst = jnp.sum(w[:, None] * dst, axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst
    # covariance of dst w.r.t. src
    cov = (w[:, None] * dst_c).T @ src_c  # (3, 3)
    var_src = jnp.sum(w * jnp.sum(src_c * src_c, axis=-1))
    u, d, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    sgn = jnp.where(det < 0, -1.0, 1.0)
    u_fix = jnp.concatenate([u[:, :-1], u[:, -1:] * sgn], axis=1)
    R = u_fix @ vt
    if with_scale:
        # trace(R cov^T) computed as a direct data correlation: numerically much
        # tighter in fp32 than summing SVD singular values.
        scale = jnp.sum(w * jnp.sum(dst_c * (src_c @ R.T), axis=-1)) / jnp.maximum(
            var_src, 1e-12
        )
    else:
        scale = jnp.ones((), dtype=src.dtype)
    t = mu_dst - scale * R @ mu_src
    return Sim3(scale=scale, rotation=R, translation=t)


@f32_matmul
def sim3_from_camera_poses(
    ref_rot_cw: jnp.ndarray,
    ref_centers: jnp.ndarray,
    q_rot_cw: jnp.ndarray,
    q_centers: jnp.ndarray,
    rot_weight: jnp.ndarray | None = None,
) -> Sim3:
    """Sim3 aligning query camera poses onto reference poses of the same
    frames: minimizes sum |s R c_q + t - c_ref|^2 - lambda tr((R R_wc,q)^T
    R_wc,ref) over Sim3.

    Camera centers of a forward-moving chunk are nearly collinear, which
    leaves Umeyama's rotation free about the motion axis — the chordal
    rotation term (world rotations R_wc = R_cw^T of the shared frames)
    resolves it. lambda defaults to the mean squared center spread so both
    terms carry comparable weight. Used as the alignment fallback when no
    common tracks survive (the reference has no fallback and simply leaves
    the chunk in its own gauge)."""
    mu_q = jnp.mean(q_centers, axis=0)
    mu_r = jnp.mean(ref_centers, axis=0)
    qc = q_centers - mu_q
    rc = ref_centers - mu_r
    cov_pts = rc.T @ qc  # sum dst src^T
    var_q = jnp.sum(qc * qc) / qc.shape[0]
    if rot_weight is None:
        rot_weight = jnp.maximum(var_q, 1e-8)
    r_wc_ref = jnp.swapaxes(ref_rot_cw, -1, -2)
    r_wc_q = jnp.swapaxes(q_rot_cw, -1, -2)
    cov_rot = jnp.einsum("nij,nkj->ik", r_wc_ref, r_wc_q)
    cov = cov_pts / qc.shape[0] + rot_weight * cov_rot / q_rot_cw.shape[0]
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    u_fix = jnp.concatenate([u[:, :-1], u[:, -1:] * jnp.where(det < 0, -1.0, 1.0)], axis=1)
    R = u_fix @ vt
    # scale from centers only; guard the near-stationary case
    num = jnp.sum(rc * (qc @ R.T)) / qc.shape[0]
    scale = jnp.where(var_q > 1e-10, num / jnp.maximum(var_q, 1e-10), 1.0)
    scale = jnp.where(scale > 1e-6, scale, 1.0)
    t = mu_r - scale * R @ mu_q
    return Sim3(scale=scale, rotation=R, translation=t)


@f32_matmul
def robust_umeyama(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    huber_delta: float = 1.0,
    iterations: int = 5,
    with_scale: bool = True,
    trim_multiplier: float | None = 3.0,
) -> Sim3:
    """Huber-IRLS Umeyama: mirrors PyTheia OptimizeAlignmentSim3 defaults
    (5 iterations, Huber loss width 1.0 — utils/reconstruction_alignment.py:89-97).

    Each iteration reweights points by the Huber weight of their current
    residual norm and re-solves the closed-form problem. A final trimmed
    re-solve drops points with residual > trim_multiplier * huber_delta,
    removing the residual Huber bias of gross outliers (a strict improvement
    over the reference's plain-Huber alignment). Fixed trip count, so the
    whole solve jits to one XLA computation.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)

    def body(_, w_robust):
        s = umeyama(src, dst, weights * w_robust, with_scale=with_scale)
        r = jnp.linalg.norm(sim3_apply(s, src) - dst, axis=-1)
        w_new = jnp.where(r <= huber_delta, 1.0, huber_delta / jnp.maximum(r, 1e-12))
        return w_new

    w_robust = jax.lax.fori_loop(
        0, iterations, body, jnp.ones(src.shape[0], dtype=src.dtype)
    )
    if trim_multiplier is not None:
        s = umeyama(src, dst, weights * w_robust, with_scale=with_scale)
        r = jnp.linalg.norm(sim3_apply(s, src) - dst, axis=-1)
        w_robust = jnp.where(r <= trim_multiplier * huber_delta, w_robust, 0.0)
    return umeyama(src, dst, weights * w_robust, with_scale=with_scale)
