"""Focal-length / z-shift recovery from pointmaps, and intrinsics estimation.

Replaces the reference's per-frame scipy Levenberg-Marquardt loop
(utils/geometry_numpy.py:79-112, utils/geometry_torch.py:114-169) with a
fixed-iteration damped Gauss-Newton over the scalar shift, vmapped over
frames and fully jittable — no host round-trip.

The problem: given a pointmap P = (x, y, z) per pixel with normalized view
plane uv, solve  min_{shift, f} | f * xy / (z + shift) - uv |^2  where f has
a closed form given shift. The reference solves with scipy ``least_squares``
(ftol=1e-3, method='lm') from x0=0; we run 30 GN iterations with adaptive
step damping, which reaches a tighter optimum.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .maps import nearest_resize, normalized_view_plane_uv


def _masked_residual_sq(shift, xy, z, uv, w):
    """Weighted SSE of (f(shift) * xy/(z+shift) - uv), f in closed form."""
    denom = z + shift
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    xy_proj = xy / denom[..., None]
    f = jnp.sum(w[..., None] * xy_proj * uv) / jnp.maximum(
        jnp.sum(w[..., None] * xy_proj * xy_proj), 1e-12
    )
    err = (f * xy_proj - uv) * w[..., None]
    return jnp.sum(err * err), f


def _solve_shift_single(
    points: jnp.ndarray, uv: jnp.ndarray, weight: jnp.ndarray, iterations: int = 30
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scalar damped-GN solve for one frame.

    points: (M, 3) downsampled pointmap; uv: (M, 2); weight: (M,) in {0,1}.
    Returns (focal, shift) — focal relative to the half image diagonal.
    """
    xy = points[..., :2]
    z = points[..., 2]
    w = weight.astype(points.dtype)

    loss_fn = lambda s: _masked_residual_sq(s, xy, z, uv, w)[0]
    grad_fn = jax.grad(loss_fn)

    def body(carry, _):
        shift, lm_lambda = carry
        g = grad_fn(shift)
        # second derivative via forward-over-reverse
        h = jax.jacfwd(grad_fn)(shift)
        h_safe = jnp.where(jnp.abs(h) < 1e-12, 1e-12, h)
        step = -g / (h_safe + lm_lambda * jnp.abs(h_safe))
        new_shift = shift + step
        improved = loss_fn(new_shift) < loss_fn(shift)
        shift = jnp.where(improved, new_shift, shift)
        lm_lambda = jnp.where(improved, jnp.maximum(lm_lambda * 0.5, 1e-6), lm_lambda * 4.0)
        return (shift, lm_lambda), None

    init = (jnp.zeros((), dtype=points.dtype), jnp.asarray(1e-3, dtype=points.dtype))
    (shift, _), _ = jax.lax.scan(body, init, None, length=iterations)
    _, focal = _masked_residual_sq(shift, xy, z, uv, w)
    # degenerate frame (fewer than 2 valid pixels): focal=1, shift=0 like the reference
    valid = jnp.sum(w) >= 2
    return jnp.where(valid, focal, 1.0), jnp.where(valid, shift, 0.0)


def recover_focal_shift(
    points: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    downsample_size: Tuple[int, int] = (64, 64),
    iterations: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover (focal, shift) per frame from (..., H, W, 3) pointmaps.

    focal is relative to the half diagonal; shift translates z into camera
    space. Mirrors utils/geometry_torch.py:114-169 but batched + jitted.
    """
    shape = points.shape
    H, W = shape[-3], shape[-2]
    lead = shape[:-3]
    points_flat = points.reshape((-1,) + shape[-3:])
    uv = normalized_view_plane_uv(W, H, dtype=points.dtype)  # (H, W, 2)

    points_lr = nearest_resize(points_flat, downsample_size)
    uv_lr = nearest_resize(uv, downsample_size).reshape(-1, 2)
    if mask is None:
        weight = jnp.ones(points_lr.shape[:-1], dtype=points.dtype)
    else:
        mask_flat = mask.reshape((-1,) + shape[-3:-1]).astype(points.dtype)
        weight = nearest_resize(mask_flat[..., None], downsample_size)[..., 0]
    points_lr = points_lr.reshape(points_lr.shape[0], -1, 3)
    weight = weight.reshape(weight.shape[0], -1)

    focal, shift = jax.vmap(lambda p, w: _solve_shift_single(p, uv_lr, w, iterations))(
        points_lr, weight
    )
    return focal.reshape(lead), shift.reshape(lead)


def intrinsics_from_focal_center(fx, fy, cx, cy) -> jnp.ndarray:
    """Build (..., 3, 3) pinhole intrinsics from focal lengths and center."""
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zeros, cx], axis=-1)
    row1 = jnp.stack([zeros, fy, cy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def estimate_camera_parameters(
    local_points: jnp.ndarray,
    conf: jnp.ndarray,
    downsample_size: Tuple[int, int] = (64, 64),
) -> dict:
    """Estimate per-frame pinhole intrinsics from Pi3 local points + confidence.

    Mirrors utils/camera_estimation.py:12-98: mask = sigmoid(conf) > 0.1,
    recover (focal, shift), then
        fx = focal/2 * sqrt(1+ar^2)/ar * W,   fy = focal/2 * sqrt(1+ar^2) * H,
        cx = W // 2, cy = H // 2.

    local_points: (..., H, W, 3); conf: (..., H, W, 1) raw logits.
    """
    masks = jax.nn.sigmoid(conf[..., 0]) > 0.1
    H, W = local_points.shape[-3], local_points.shape[-2]
    ar = W / H
    focal, shift = recover_focal_shift(local_points, masks, downsample_size=downsample_size)
    fx = focal / 2 * (1 + ar**2) ** 0.5 / ar * W
    fy = focal / 2 * (1 + ar**2) ** 0.5 * H
    cx = jnp.full_like(fx, W // 2)
    cy = jnp.full_like(fy, H // 2)
    return {
        "intrinsics": intrinsics_from_focal_center(fx, fy, cx, cy),
        "focal": focal,
        "shift": shift,
        "fx": fx,
        "fy": fy,
        "cx": cx,
        "cy": cy,
    }
