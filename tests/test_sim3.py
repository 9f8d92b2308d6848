"""Sim3 / Umeyama alignment tests."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.geometry import (
    Sim3,
    umeyama,
    robust_umeyama,
    sim3_apply,
    sim3_matrix,
    sim3_inverse,
    sim3_compose,
)


def make_sim3(rng, scale=None):
    R = Rotation.random(random_state=np.random.RandomState(rng.integers(1 << 31))).as_matrix()
    s = scale if scale is not None else float(rng.uniform(0.3, 3.0))
    t = rng.normal(size=3)
    return Sim3(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t))


def test_umeyama_exact(rng):
    gt = make_sim3(rng)
    src = jnp.asarray(rng.normal(size=(50, 3)))
    dst = sim3_apply(gt, src)
    est = umeyama(src, dst)
    np.testing.assert_allclose(float(est.scale), float(gt.scale), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(est.rotation), np.asarray(gt.rotation), atol=1e-5)
    np.testing.assert_allclose(np.asarray(est.translation), np.asarray(gt.translation), atol=1e-5)


def test_umeyama_no_scale(rng):
    gt = make_sim3(rng, scale=1.0)
    src = jnp.asarray(rng.normal(size=(40, 3)))
    dst = sim3_apply(gt, src)
    est = umeyama(src, dst, with_scale=False)
    assert float(est.scale) == 1.0
    np.testing.assert_allclose(np.asarray(est.rotation), np.asarray(gt.rotation), atol=1e-5)


def test_umeyama_weights_ignore_outliers(rng):
    gt = make_sim3(rng)
    src = rng.normal(size=(60, 3))
    dst = np.asarray(sim3_apply(gt, jnp.asarray(src))).copy()
    dst[:10] += 100.0  # corrupt first 10
    w = np.ones(60)
    w[:10] = 0.0
    est = umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(float(est.scale), float(gt.scale), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(est.translation), np.asarray(gt.translation), atol=1e-4)


def test_robust_umeyama_rejects_outliers(rng):
    gt = make_sim3(rng)
    src = rng.normal(size=(200, 3)) * 5
    dst = np.asarray(sim3_apply(gt, jnp.asarray(src))).copy()
    dst[:30] += rng.normal(size=(30, 3)) * 50  # 15% outliers
    est = robust_umeyama(jnp.asarray(src), jnp.asarray(dst), huber_delta=1.0, iterations=8)
    np.testing.assert_allclose(float(est.scale), float(gt.scale), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(est.rotation), np.asarray(gt.rotation), atol=1e-3)


def test_sim3_matrix_inverse_compose(rng):
    a = make_sim3(rng)
    b = make_sim3(rng)
    pts = jnp.asarray(rng.normal(size=(10, 3)))
    # matrix form agrees with apply
    h = np.asarray(sim3_matrix(a))
    p_h = (np.concatenate([np.asarray(pts), np.ones((10, 1))], axis=1) @ h.T)[:, :3]
    np.testing.assert_allclose(p_h, np.asarray(sim3_apply(a, pts)), atol=1e-6)
    # inverse
    back = sim3_apply(sim3_inverse(a), sim3_apply(a, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)
    # compose
    ab = sim3_compose(a, b)
    np.testing.assert_allclose(
        np.asarray(sim3_apply(ab, pts)),
        np.asarray(sim3_apply(a, sim3_apply(b, pts))),
        atol=1e-5,
    )
