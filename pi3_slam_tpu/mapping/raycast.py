"""TSDF raycasting: render depth / normal maps from a fused volume.

KinectFusion-style sphere tracing mapped onto XLA: all H*W rays advance
in lockstep under a fixed-length ``lax.scan`` (no data-dependent control
flow), each step trilinearly interpolating the truncated SDF (8 flat
gathers) and advancing by the truncation-scaled SDF value clamped to at
least one voxel. The zero crossing is refined by linear interpolation
between the last positive and first negative sample.

Uses: debug renders of the final fused model, frame-to-model consistency
checks, and synthetic depth for tests. No reference equivalent (the
reference has no dense-mapping subsystem at all).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _trilinear(tsdf_flat, dims, g):
    """Trilinear TSDF sample at grid coords g (N, 3); out-of-grid clamps.

    Returns (value (N,), inside (N,) bool)."""
    X, Y, Z = dims
    lim = jnp.asarray([X - 1, Y - 1, Z - 1], jnp.float32)
    inside = ((g >= 0.0) & (g <= lim)).all(axis=1)
    gc = jnp.clip(g, 0.0, lim - 1e-4)
    base = jnp.floor(gc).astype(jnp.int32)
    base = jnp.minimum(base, jnp.asarray([X - 2, Y - 2, Z - 2]))
    t = gc - base
    val = jnp.zeros(g.shape[0], jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (t[:, 0] if dx else 1 - t[:, 0])
                    * (t[:, 1] if dy else 1 - t[:, 1])
                    * (t[:, 2] if dz else 1 - t[:, 2])
                )
                lin = ((base[:, 0] + dx) * Y + base[:, 1] + dy) * Z + base[:, 2] + dz
                val = val + w * jnp.take(tsdf_flat, lin)
    return val, inside


@partial(jax.jit, static_argnames=("dims", "height", "width", "max_steps"))
def _raycast(
    tsdf_flat,
    origin,
    voxel_size,
    trunc_dist,
    intr,
    rot,
    center,
    dims,
    height,
    width,
    max_steps,
):
    """depth (H, W) in camera z (0 = miss), hit mask, hit points (H, W, 3)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1).reshape(-1)
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0).reshape(-1)
    # world-space unit ray directions; rays leave the camera center
    d_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=1)
    # R^T rows applied to each d_cam (R is world->cam); HIGHEST precision —
    # the TPU bf16 matmul default would perturb ray directions by ~0.2%
    # (~voxel-size lateral error at room scale; CLAUDE.md geometry rule)
    d_world = jnp.matmul(d_cam, rot, precision=jax.lax.Precision.HIGHEST)
    inv_norm = 1.0 / jnp.linalg.norm(d_world, axis=1, keepdims=True)
    d_world = d_world * inv_norm
    # z-depth per unit ray distance (depth = t * dz_cam)
    dz = d_cam[:, 2] * inv_norm[:, 0]

    inv_vs = 1.0 / voxel_size
    t0 = jnp.full(u.shape, voxel_size, jnp.float32)

    def sample(t):
        p = center[None, :] + d_world * t[:, None]
        g = (p - origin[None, :]) * inv_vs
        return _trilinear(tsdf_flat, dims, g)

    def step(carry, _):
        t, t_hit, prev_sdf, prev_t, done = carry
        sdf, inside = sample(t)
        crossed = inside & (prev_sdf > 0.0) & (sdf <= 0.0) & ~done
        # linear zero-crossing refinement between (prev_t, t)
        denom = jnp.where(jnp.abs(prev_sdf - sdf) > 1e-12, prev_sdf - sdf, 1.0)
        t_cross = prev_t + (t - prev_t) * prev_sdf / denom
        t_hit = jnp.where(crossed, t_cross, t_hit)
        done = done | crossed
        # advance: sphere-trace by the truncation-scaled SDF, at least one
        # voxel; outside the grid stride 4 voxels toward it
        adv = jnp.where(
            inside,
            jnp.maximum(sdf * trunc_dist, voxel_size),
            4.0 * voxel_size,
        )
        new_t = jnp.where(done, t, t + adv)
        return (new_t, t_hit, jnp.where(inside, sdf, prev_sdf), t, done), None

    init = (
        t0,
        jnp.zeros_like(t0),
        jnp.ones_like(t0),  # prev sdf: free space
        t0,
        jnp.zeros(t0.shape, bool),
    )
    (t, t_hit, _, _, done), _ = jax.lax.scan(step, init, None, length=max_steps)

    depth = jnp.where(done, t_hit * dz, 0.0).reshape(height, width)
    points = (center[None, :] + d_world * t_hit[:, None]).reshape(height, width, 3)
    return depth, done.reshape(height, width), points


def raycast_depth(
    volume,
    intrinsics,
    rotation: np.ndarray,
    center: np.ndarray,
    height: int,
    width: int,
    max_steps: int = 192,
):
    """Render a virtual depth map of a TSDFVolume from a pinhole camera.

    intrinsics: (4,) fx fy cx cy; rotation: (3, 3) world->camera;
    center: (3,) camera center (world). Returns a dict with
    depth (H, W) float32 z-depth (0 where the ray missed), mask (H, W)
    bool, points (H, W, 3) world hit points, and normals (H, W, 3)
    (SDF-gradient, zero where missed).
    """
    depth, mask, points = _raycast(
        volume.device_tsdf_flat(),  # uploaded once, cached across views
        jnp.asarray(np.asarray(volume.origin, np.float32)),
        jnp.float32(volume.voxel_size),
        jnp.float32(volume.trunc_dist),
        jnp.asarray(np.asarray(intrinsics, np.float32).reshape(4)),
        jnp.asarray(np.asarray(rotation, np.float32).reshape(3, 3)),
        jnp.asarray(np.asarray(center, np.float32).reshape(3)),
        tuple(volume.shape),
        height,
        width,
        max_steps,
    )
    depth = np.asarray(depth)
    mask = np.asarray(mask)
    pts = np.asarray(points)
    from .surface_nets import sdf_vertex_normals

    normals = sdf_vertex_normals(
        volume.tsdf, pts.reshape(-1, 3), origin=volume.origin,
        voxel_size=volume.voxel_size, grad=volume.sdf_gradient(),
    ).reshape(height, width, 3)
    normals = np.where(mask[..., None], normals, 0.0)
    return {"depth": depth, "mask": mask, "points": pts, "normals": normals}
