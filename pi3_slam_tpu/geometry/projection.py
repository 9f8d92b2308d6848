"""Camera projection / unprojection / warping helpers.

Equivalents of pi3/utils/geometry.py's depthmap utilities (:55-344):
``geotrf`` (batched transform application), ``depthmap_to_camera_points``,
``depthmap_to_world_points``, ``warp_keypoints`` (project 3D into another
view), and OpenCV-camera Pluecker-ray embedding. Pure jnp, batched.
"""

from __future__ import annotations

import jax.numpy as jnp

from .transforms import homogenize_points


def geotrf(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) or (..., 3, 3) transforms to (..., N, 3|2) points."""
    d = pts.shape[-1]
    if T.shape[-1] == d + 1:
        h = homogenize_points(pts)
        out = jnp.einsum("...ij,...nj->...ni", T, h)
        return out[..., :d] / jnp.where(
            jnp.abs(out[..., d:]) < 1e-12, 1e-12, out[..., d:]
        ) if T.shape[-2] == d + 1 else out[..., :d]
    return jnp.einsum("...ij,...nj->...ni", T, pts)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) pixel-center (x, y) coordinates."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([xx, yy], axis=-1)


def depthmap_to_camera_points(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) depth + (..., 3, 3) intrinsics -> (..., H, W, 3) camera-frame
    points (z = depth at each pixel)."""
    H, W = depth.shape[-2], depth.shape[-1]
    uv = pixel_grid(H, W, depth.dtype)
    fx = K[..., 0, 0][..., None, None]
    fy = K[..., 1, 1][..., None, None]
    cx = K[..., 0, 2][..., None, None]
    cy = K[..., 1, 2][..., None, None]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def depthmap_to_world_points(
    depth: jnp.ndarray, K: jnp.ndarray, cam2world: jnp.ndarray
) -> jnp.ndarray:
    """Unproject and transform into world frame. cam2world: (..., 4, 4)."""
    cam_pts = depthmap_to_camera_points(depth, K)
    R = cam2world[..., None, None, :3, :3]
    t = cam2world[..., None, None, :3, 3]
    return jnp.einsum("...ij,...j->...i", R, cam_pts) + t


def project_points(
    points_world: jnp.ndarray, K: jnp.ndarray, world2cam: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., N, 3) world points -> ((..., N, 2) pixels, (..., N) depth)."""
    R = world2cam[..., :3, :3]
    t = world2cam[..., :3, 3]
    cam = jnp.einsum("...ij,...nj->...ni", R, points_world) + t[..., None, :]
    z = cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = K[..., 0, 0, None] * cam[..., 0] / z_safe + K[..., 0, 2, None]
    v = K[..., 1, 1, None] * cam[..., 1] / z_safe + K[..., 1, 2, None]
    return jnp.stack([u, v], axis=-1), z


def warp_keypoints(
    kpts: jnp.ndarray,
    depth_at_kpts: jnp.ndarray,
    K_src: jnp.ndarray,
    K_dst: jnp.ndarray,
    src2dst: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """warp_kpts equivalent: lift (N, 2) source keypoints with per-kp depth,
    transform by (4, 4) src->dst, project into the destination camera.

    Returns ((N, 2) dst pixels, (N,) bool valid in-front mask)."""
    x = (kpts[..., 0] - K_src[..., 0, 2]) / K_src[..., 0, 0] * depth_at_kpts
    y = (kpts[..., 1] - K_src[..., 1, 2]) / K_src[..., 1, 1] * depth_at_kpts
    pts = jnp.stack([x, y, depth_at_kpts], axis=-1)
    R = src2dst[..., :3, :3]
    t = src2dst[..., :3, 3]
    dst = pts @ jnp.swapaxes(R, -1, -2) + t
    z = dst[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = K_dst[..., 0, 0] * dst[..., 0] / z_safe + K_dst[..., 0, 2]
    v = K_dst[..., 1, 1] * dst[..., 1] / z_safe + K_dst[..., 1, 2]
    return jnp.stack([u, v], axis=-1), z > 0


def camera_rays_plucker(K: jnp.ndarray, cam2world: jnp.ndarray, height: int, width: int):
    """Pluecker-ray embedding of every pixel (opencv_camera_to_plucker
    equivalent): returns (H, W, 6) = (direction, moment)."""
    uv = pixel_grid(height, width)
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    R = cam2world[:3, :3]
    origin = cam2world[:3, 3]
    d_world = d_cam @ R.T
    moment = jnp.cross(jnp.broadcast_to(origin, d_world.shape), d_world)
    return jnp.concatenate([d_world, moment], axis=-1)
