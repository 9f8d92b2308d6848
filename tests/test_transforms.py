"""Geometry transform unit tests against scipy / closed-form references."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.geometry import (
    se3_inverse,
    homogenize_points,
    transform_points,
    quaternion_to_rotation_matrix,
    rotation_matrix_to_quaternion,
    svd_orthogonalize,
    so3_exp,
    so3_log,
    skew,
)


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(rng.integers(1 << 31))).as_matrix()


def test_homogenize(rng):
    p = rng.normal(size=(4, 5, 3))
    h = np.asarray(homogenize_points(jnp.asarray(p)))
    assert h.shape == (4, 5, 4)
    np.testing.assert_allclose(h[..., :3], p)
    np.testing.assert_allclose(h[..., 3], 1.0)


def test_se3_inverse(rng):
    R = random_rotations(rng, 6).reshape(2, 3, 3, 3)
    t = rng.normal(size=(2, 3, 3))
    T = np.zeros((2, 3, 4, 4))
    T[..., :3, :3] = R
    T[..., :3, 3] = t
    T[..., 3, 3] = 1
    Ti = np.asarray(se3_inverse(jnp.asarray(T)))
    prod = np.einsum("...ij,...jk->...ik", T, Ti)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-6)


def test_transform_points(rng):
    R = random_rotations(rng, 1)[0]
    t = rng.normal(size=3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    pts = rng.normal(size=(10, 3))
    out = np.asarray(transform_points(jnp.asarray(T), jnp.asarray(pts)))
    expected = pts @ R.T + t
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_quaternion_roundtrip(rng):
    R = random_rotations(rng, 32)
    q = np.asarray(rotation_matrix_to_quaternion(jnp.asarray(R)))
    # against scipy (xyzw order)
    q_scipy = Rotation.from_matrix(R).as_quat()  # x y z w
    q_scipy_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
    sign = np.where(q_scipy_wxyz[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q, q_scipy_wxyz * sign, atol=1e-5)
    R2 = np.asarray(quaternion_to_rotation_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quaternion_edge_cases():
    # identity, and 180-degree rotations about each axis (trace = -1 branch)
    mats = [np.eye(3)]
    for axis in range(3):
        v = np.zeros(3)
        v[axis] = np.pi
        mats.append(Rotation.from_rotvec(v).as_matrix())
    R = np.stack(mats)
    q = np.asarray(rotation_matrix_to_quaternion(jnp.asarray(R)))
    R2 = np.asarray(quaternion_to_rotation_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    # exp matches scipy for any magnitude
    w_any = rng.normal(size=(16, 3)) * 2.0
    R = np.asarray(so3_exp(jnp.asarray(w_any)))
    R_scipy = Rotation.from_rotvec(w_any).as_matrix()
    np.testing.assert_allclose(R, R_scipy, atol=1e-6)
    # log round-trips only within the principal domain |w| < pi
    direction = rng.normal(size=(16, 3))
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    w = direction * rng.uniform(0.01, 3.0, size=(16, 1))
    R = np.asarray(so3_exp(jnp.asarray(w)))
    w2 = np.asarray(so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_exp_at_zero():
    R = np.asarray(so3_exp(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-8)
    w = np.asarray(so3_log(jnp.eye(3)))
    np.testing.assert_allclose(w, 0.0, atol=1e-8)


def test_skew(rng):
    v = rng.normal(size=(5, 3))
    K = np.asarray(skew(jnp.asarray(v)))
    u = rng.normal(size=(5, 3))
    cross = np.cross(v, u)
    np.testing.assert_allclose(np.einsum("nij,nj->ni", K, u), cross, atol=1e-6)


def test_svd_orthogonalize(rng):
    # noisy rotations project back to SO(3)
    R = random_rotations(rng, 8)
    noisy = R + rng.normal(size=R.shape) * 0.05
    out = np.asarray(svd_orthogonalize(jnp.asarray(noisy)))
    eye = np.einsum("nij,nkj->nik", out, out)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-5)
    # 9D input path
    out9 = np.asarray(svd_orthogonalize(jnp.asarray(noisy.reshape(8, 9))))
    np.testing.assert_allclose(out9, out, atol=1e-6)


def test_svd_orthogonalize_matches_torch_reference(rng):
    """Parity with the reference CameraHead svd_orthogonalize (torch)."""
    import torch
    import torch.nn.functional as F

    m = rng.normal(size=(6, 3, 3)).astype(np.float32)
    mt = torch.from_numpy(m)
    m_transpose = torch.transpose(F.normalize(mt, p=2, dim=-1), dim0=-1, dim1=-2)
    u, s, v = torch.svd(m_transpose)
    det = torch.det(torch.matmul(v, u.transpose(-2, -1)))
    r_ref = torch.matmul(
        torch.cat([v[:, :, :-1], v[:, :, -1:] * det.view(-1, 1, 1)], dim=2),
        u.transpose(-2, -1),
    ).numpy()
    r_jax = np.asarray(svd_orthogonalize(jnp.asarray(m)))
    # SVD sign conventions can differ but the projected rotation is unique
    np.testing.assert_allclose(r_jax, r_ref, atol=1e-5)
