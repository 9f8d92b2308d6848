"""Projection/unprojection/warp helpers + cross-attention block tests."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.geometry.projection import (
    geotrf,
    depthmap_to_camera_points,
    depthmap_to_world_points,
    project_points,
    warp_keypoints,
    camera_rays_plucker,
)


def make_pose(rng):
    T = np.eye(4)
    T[:3, :3] = Rotation.random(random_state=np.random.RandomState(rng.integers(1 << 31))).as_matrix()
    T[:3, 3] = rng.normal(size=3)
    return T


def test_unproject_project_roundtrip(rng):
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = rng.uniform(1, 5, size=(48, 64)).astype(np.float64)
    cam2world = make_pose(rng)
    world = np.asarray(depthmap_to_world_points(jnp.asarray(depth), jnp.asarray(K), jnp.asarray(cam2world)))
    world2cam = np.linalg.inv(cam2world)
    uv, z = project_points(
        jnp.asarray(world.reshape(-1, 3)), jnp.asarray(K), jnp.asarray(world2cam)
    )
    uv = np.asarray(uv).reshape(48, 64, 2)
    from pi3_slam_tpu.geometry.projection import pixel_grid

    expected = np.asarray(pixel_grid(48, 64))
    np.testing.assert_allclose(uv, expected, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z).reshape(48, 64), depth, atol=1e-5)


def test_camera_points_z_is_depth(rng):
    K = np.array([[80.0, 0, 16], [0, 80.0, 12], [0, 0, 1]])
    depth = rng.uniform(1, 3, size=(24, 32))
    pts = np.asarray(depthmap_to_camera_points(jnp.asarray(depth), jnp.asarray(K)))
    np.testing.assert_allclose(pts[..., 2], depth)


def test_warp_keypoints_identity(rng):
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    kpts = rng.uniform(5, 90, size=(20, 2))
    depth = rng.uniform(1, 4, size=20)
    uv, valid = warp_keypoints(
        jnp.asarray(kpts), jnp.asarray(depth), jnp.asarray(K), jnp.asarray(K), jnp.eye(4)
    )
    np.testing.assert_allclose(np.asarray(uv), kpts, atol=1e-4)
    assert np.asarray(valid).all()


def test_warp_keypoints_translation(rng):
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    kpts = np.array([[50.0, 40.0]])  # principal point -> on-axis ray
    depth = np.array([2.0])
    T = np.eye(4)
    T[0, 3] = -0.5  # camera moves +x <=> point moves -x in dst frame
    uv, valid = warp_keypoints(
        jnp.asarray(kpts), jnp.asarray(depth), jnp.asarray(K), jnp.asarray(K), jnp.asarray(T)
    )
    # x_dst = -0.5 at z=2 -> u = 100*(-0.25)+50 = 25
    np.testing.assert_allclose(np.asarray(uv)[0], [25.0, 40.0], atol=1e-4)


def test_plucker_rays(rng):
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    c2w = make_pose(rng)
    rays = np.asarray(camera_rays_plucker(jnp.asarray(K), jnp.asarray(c2w), 8, 10))
    d, m = rays[..., :3], rays[..., 3:]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    # moment orthogonal to direction
    np.testing.assert_allclose(np.sum(d * m, axis=-1), 0.0, atol=1e-6)


def test_geotrf_matches_manual(rng):
    T = make_pose(rng)
    pts = rng.normal(size=(12, 3))
    out = np.asarray(geotrf(jnp.asarray(T), jnp.asarray(pts)))
    expected = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_cross_block_runs(rng):
    from pi3_slam_tpu.models.cross_attention import cross_attention, cross_block

    C, H = 32, 4
    d = C

    def lin(rng, i, o):
        return rng.normal(size=(i, o)).astype(np.float32) * 0.05

    ca_params = {
        "q_kernel": lin(rng, d, d), "q_bias": np.zeros(d, np.float32),
        "k_kernel": lin(rng, d, d), "k_bias": np.zeros(d, np.float32),
        "v_kernel": lin(rng, d, d), "v_bias": np.zeros(d, np.float32),
        "proj_kernel": lin(rng, d, d), "proj_bias": np.zeros(d, np.float32),
    }
    x = jnp.asarray(rng.normal(size=(2, 9, C)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 14, C)).astype(np.float32))
    out = cross_attention(x, y, y, ca_params, H)
    assert out.shape == x.shape

    block_params = {
        "norm1_scale": np.ones(C, np.float32), "norm1_bias": np.zeros(C, np.float32),
        "norm2_scale": np.ones(C, np.float32), "norm2_bias": np.zeros(C, np.float32),
        "norm3_scale": np.ones(C, np.float32), "norm3_bias": np.zeros(C, np.float32),
        "norm_y_scale": np.ones(C, np.float32), "norm_y_bias": np.zeros(C, np.float32),
        "self_attn": {
            "qkv_kernel": lin(rng, d, 3 * d), "qkv_bias": np.zeros(3 * d, np.float32),
            "proj_kernel": lin(rng, d, d), "proj_bias": np.zeros(d, np.float32),
        },
        "cross_attn": ca_params,
        "mlp": {
            "fc1_kernel": lin(rng, d, 4 * d), "fc1_bias": np.zeros(4 * d, np.float32),
            "fc2_kernel": lin(rng, 4 * d, d), "fc2_bias": np.zeros(d, np.float32),
        },
    }
    out = cross_block(x, y, block_params, H)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
