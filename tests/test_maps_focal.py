"""depth_edge / nearest_resize / focal recovery tests (vs torch + scipy refs)."""

import numpy as np
import jax.numpy as jnp

from pi3_slam_tpu.geometry import (
    depth_edge,
    normalized_view_plane_uv,
    nearest_resize,
    recover_focal_shift,
    estimate_camera_parameters,
)


def test_depth_edge_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    depth = rng.uniform(0.5, 5.0, size=(2, 3, 24, 32)).astype(np.float32)
    # inject a sharp edge
    depth[..., 10:, :] += 3.0

    for rtol, atol in [(0.03, None), (None, 0.5), (0.03, 0.5)]:
        ours = np.asarray(depth_edge(jnp.asarray(depth), atol=atol, rtol=rtol))
        d = torch.from_numpy(depth).reshape(-1, 1, 24, 32)
        diff = F.max_pool2d(d, 3, stride=1, padding=1) + F.max_pool2d(-d, 3, stride=1, padding=1)
        edge = torch.zeros_like(d, dtype=torch.bool)
        if atol is not None:
            edge |= diff > atol
        if rtol is not None:
            edge |= (diff / d).nan_to_num_() > rtol
        theirs = edge.reshape(2, 3, 24, 32).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_nearest_resize_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(2, 37, 53, 3)).astype(np.float32)
    ours = np.asarray(nearest_resize(jnp.asarray(x), (16, 16)))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (16, 16), mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs)


def test_normalized_view_plane_uv_matches_reference():
    w, h = 64, 48
    uv = np.asarray(normalized_view_plane_uv(w, h))
    assert uv.shape == (h, w, 2)
    diag = np.hypot(w, h)
    span_x = w / diag
    span_y = h / diag
    np.testing.assert_allclose(uv[0, 0], [-span_x * (w - 1) / w, -span_y * (h - 1) / h], atol=1e-6)
    np.testing.assert_allclose(uv[-1, -1], [span_x * (w - 1) / w, span_y * (h - 1) / h], atol=1e-6)


def synth_pointmap(rng, h, w, focal_rel, shift):
    """Build a pointmap that exactly satisfies the focal/shift model:
    xy = uv * (z + shift) / focal, observed points are (xy, z)."""
    uv = np.asarray(normalized_view_plane_uv(w, h))
    z_true = rng.uniform(1.0, 4.0, size=(h, w)).astype(np.float32)
    z_obs = z_true - shift
    xy = uv * (z_true / focal_rel)[..., None]
    return np.concatenate([xy, z_obs[..., None]], axis=-1).astype(np.float32)


def test_recover_focal_shift_exact(rng):
    pts = synth_pointmap(rng, 48, 64, focal_rel=1.2, shift=0.3)
    focal, shift = recover_focal_shift(jnp.asarray(pts)[None])
    assert abs(float(focal[0]) - 1.2) < 1e-3
    assert abs(float(shift[0]) - 0.3) < 1e-3


def test_recover_focal_shift_masked(rng):
    pts = synth_pointmap(rng, 48, 64, focal_rel=0.8, shift=-0.2)
    corrupted = pts.copy()
    corrupted[:10] = 1e3  # garbage rows, masked out
    mask = np.ones((48, 64), dtype=bool)
    mask[:10] = False
    focal, shift = recover_focal_shift(jnp.asarray(corrupted)[None], jnp.asarray(mask)[None])
    assert abs(float(focal[0]) - 0.8) < 5e-3
    assert abs(float(shift[0]) + 0.2) < 5e-3


def test_recover_focal_shift_matches_scipy(rng):
    """Same answer as the reference scipy-LM solver on noisy data."""
    from functools import partial
    from scipy.optimize import least_squares

    pts = synth_pointmap(rng, 32, 32, focal_rel=1.0, shift=0.15)
    pts = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.01

    # reference solver (utils/geometry_numpy.py:79-97) reimplemented inline
    uv = np.asarray(normalized_view_plane_uv(32, 32)).reshape(-1, 2)
    xy = pts[..., :2].reshape(-1, 2)
    z = pts[..., 2].reshape(-1)

    def fn(shift):
        xy_proj = xy / (z + shift)[:, None]
        f = (xy_proj * uv).sum() / np.square(xy_proj).sum()
        return (f * xy_proj - uv).ravel()

    sol = least_squares(lambda s: fn(s[0]), x0=[0.0], ftol=1e-3, method="lm")
    ref_shift = float(sol["x"][0])
    xy_proj = xy / (z + ref_shift)[:, None]
    ref_focal = float((xy_proj * uv).sum() / np.square(xy_proj).sum())

    focal, shift = recover_focal_shift(jnp.asarray(pts)[None], downsample_size=(32, 32))
    assert abs(float(shift[0]) - ref_shift) < 2e-3
    assert abs(float(focal[0]) - ref_focal) < 2e-3


def test_estimate_camera_parameters(rng):
    h, w = 42, 56
    pts = synth_pointmap(rng, h, w, focal_rel=1.1, shift=0.0)
    conf = np.full((h, w, 1), 5.0, dtype=np.float32)  # sigmoid >> 0.1
    out = estimate_camera_parameters(jnp.asarray(pts)[None], jnp.asarray(conf)[None])
    ar = w / h
    fx_expected = 1.1 / 2 * (1 + ar**2) ** 0.5 / ar * w
    fy_expected = 1.1 / 2 * (1 + ar**2) ** 0.5 * h
    np.testing.assert_allclose(float(out["fx"][0]), fx_expected, rtol=1e-3)
    np.testing.assert_allclose(float(out["fy"][0]), fy_expected, rtol=1e-3)
    K = np.asarray(out["intrinsics"][0])
    assert K.shape == (3, 3)
    np.testing.assert_allclose(K[0, 2], w // 2)
    np.testing.assert_allclose(K[2, 2], 1.0)
