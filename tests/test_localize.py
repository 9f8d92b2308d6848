"""Second-camera localization tests: DLT/RANSAC PnP, descriptor
localization, Sim3 registration, and the localize_camera.py CLI."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.geometry.sim3 import Sim3, sim3_apply, sim3_exp
from pi3_slam_tpu.sfm.localize import (
    dlt_pose,
    localize_by_descriptors,
    ransac_pnp,
    register_reconstruction,
)
from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction

INTR = np.array([500.0, 480.0, 320.0, 240.0], np.float32)


def _synthetic_view(rng, n=200):
    """Random camera observing points 2-8 units in front of it."""
    R = Rotation.random(random_state=np.random.RandomState(rng.integers(1 << 31))).as_matrix()
    c = rng.normal(size=3)
    x_cam = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 8, n)], axis=1
    )
    X = x_cam @ R + c  # world points: X = R^T x_cam + c
    u = INTR[0] * x_cam[:, 0] / x_cam[:, 2] + INTR[2]
    v = INTR[1] * x_cam[:, 1] / x_cam[:, 2] + INTR[3]
    return R, c, X, np.stack([u, v], axis=1)


def test_dlt_pose_exact(rng):
    R, c, X, uv = _synthetic_view(rng, n=8)
    xn = np.stack([(uv[:, 0] - INTR[2]) / INTR[0], (uv[:, 1] - INTR[3]) / INTR[1]], axis=1)
    R_e, c_e = dlt_pose(jnp.asarray(X, jnp.float32), jnp.asarray(xn, jnp.float32))
    np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_e), c, atol=1e-3)


def test_ransac_pnp_with_outliers(rng):
    R, c, X, uv = _synthetic_view(rng)
    uv_n = uv + rng.normal(size=uv.shape) * 0.5
    out = rng.random(uv.shape[0]) < 0.3
    uv_n[out] += rng.uniform(30, 200, size=(int(out.sum()), 2))
    res = ransac_pnp(
        jnp.asarray(X, jnp.float32),
        jnp.asarray(uv_n, jnp.float32),
        jnp.asarray(INTR),
        jnp.ones(uv.shape[0]),
        jax.random.PRNGKey(0),
    )
    assert int(res.num_inliers) > 0.5 * (~out).sum()
    np.testing.assert_allclose(np.asarray(res.rotation), R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.center), c, atol=2e-2)
    assert float(res.inlier_rms_px) < 2.0


def _desc_map_recons(rng, seed_points, desc):
    from tests.test_posegraph import _make_desc_chunk

    chunk = _make_desc_chunk(rng, ["m0", "m1", "m2", "m3"], seed_points, desc, start=0)
    return [build_chunk_reconstruction(chunk, run_ba=False)]


def test_localize_by_descriptors(rng):
    """A query view of the mapped points must localize to its GT pose; extra
    unmatched (noise) keypoints must not break it."""
    n_kp = 64
    seed = np.stack(
        [rng.uniform(-2, 2, n_kp), rng.uniform(-1.5, 1.5, n_kp), rng.uniform(4, 7, n_kp)],
        axis=1,
    )
    desc = rng.normal(size=(n_kp, 64))
    desc = (desc / np.linalg.norm(desc, axis=-1, keepdims=True)).astype(np.float32)
    recons = _desc_map_recons(rng, seed, desc)

    # query camera looking at the seed cloud from a new spot
    R_q = Rotation.from_euler("yxz", [15, -5, 3], degrees=True).as_matrix()
    c_q = np.array([0.5, -0.3, 0.8])
    x_cam = (seed - c_q) @ R_q.T
    uv = np.stack(
        [
            INTR[0] * x_cam[:, 0] / x_cam[:, 2] + INTR[2],
            INTR[1] * x_cam[:, 1] / x_cam[:, 2] + INTR[3],
        ],
        axis=1,
    )
    # append noise keypoints with unrelated descriptors
    n_noise = 40
    kp_all = np.concatenate([uv, rng.uniform(0, 600, size=(n_noise, 2))])
    d_noise = rng.normal(size=(n_noise, 64))
    d_noise /= np.linalg.norm(d_noise, axis=-1, keepdims=True)
    desc_all = np.concatenate([desc, d_noise.astype(np.float32)])

    res = localize_by_descriptors(recons, kp_all, desc_all, INTR, min_inliers=12)
    assert res.success and res.num_inliers >= 0.8 * n_kp
    np.testing.assert_allclose(res.rotation, R_q, atol=1e-3)
    np.testing.assert_allclose(res.center, c_q, atol=5e-3)


def test_register_reconstruction_recovers_sim3(rng):
    from tests.test_posegraph import _make_desc_chunk

    n_kp = 48
    seed = np.stack(
        [rng.uniform(-2, 2, n_kp), rng.uniform(-1.5, 1.5, n_kp), rng.uniform(4, 7, n_kp)],
        axis=1,
    )
    desc = rng.normal(size=(n_kp, 64))
    desc = (desc / np.linalg.norm(desc, axis=-1, keepdims=True)).astype(np.float32)
    recons = _desc_map_recons(rng, seed, desc)

    q_chunk = _make_desc_chunk(rng, ["q0", "q1", "q2"], seed, desc, start=1)
    query = build_chunk_reconstruction(q_chunk, run_ba=False)
    # displace the query chunk by a known Sim3 (second camera's own gauge)
    gt = sim3_exp(jnp.asarray([0.4, -0.2, 0.3, 0.1, -0.05, 0.08, 0.15], jnp.float32))
    from pi3_slam_tpu.sfm.alignment import apply_sim3_to_reconstruction

    apply_sim3_to_reconstruction(query, gt)
    res = register_reconstruction(recons, query, min_matches=30, min_inliers=20)
    assert res.success and res.num_inliers >= 40
    # registration must bring the query points back onto the map points
    np.testing.assert_allclose(query.points[:n_kp], seed, atol=1e-3)


def test_localize_camera_cli_pnp_mode(rng, tmp_path):
    """PnP-mode CLI plumbing drive with random ALIKED weights: extraction,
    validity filtering, map-resolution handling, default intrinsics, bucket
    padding, stats export. Random descriptors cannot match the fabricated
    map, so per-image localization correctly FAILS (rc 1) — accuracy of the
    solver is covered by test_localize_by_descriptors."""
    import json as _json

    import localize_camera
    from pi3_slam_tpu.models.aliked import CONFIGS
    from pi3_slam_tpu.models.convert import convert_aliked_state_dict, save_params_npz
    from tests.test_aliked import _torch_layout_state_dict
    from tests.test_posegraph import _make_desc_chunk
    from PIL import Image

    sd = _torch_layout_state_dict(CONFIGS["aliked-n16"], seed=5)
    aliked_path = str(tmp_path / "aliked.npz")
    save_params_npz(aliked_path, convert_aliked_state_dict(sd, model_name="aliked-n16"))

    n_kp = 48
    seed = np.stack(
        [rng.uniform(-2, 2, n_kp), rng.uniform(-1.5, 1.5, n_kp), rng.uniform(4, 7, n_kp)],
        axis=1,
    )
    desc = rng.normal(size=(n_kp, 128))
    desc = (desc / np.linalg.norm(desc, axis=-1, keepdims=True)).astype(np.float32)
    map_dir = str(tmp_path / "map")
    chunk = _make_desc_chunk(rng, ["m0", "m1", "m2"], seed, desc, start=0)
    os.makedirs(map_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(map_dir, "chunk_000000.npz"),
        keypoints=chunk["keypoints"].astype(np.float16),
        points=chunk["points"].astype(np.float16),
        colors=(chunk["colors"] * 255).astype(np.uint8),
        camera_poses=chunk["camera_poses"].astype(np.float64),
        intrinsics=chunk["intrinsics"].astype(np.float32),
        image_paths=np.asarray([str(p) for p in chunk["image_paths"]]),
        original_width=chunk["original_width"],
        original_height=chunk["original_height"],
        descriptors=chunk["descriptors"].astype(np.float16),
    )

    q_dir = tmp_path / "qimgs"
    q_dir.mkdir()
    img = rng.integers(0, 255, (64, 84, 3)).astype(np.uint8)
    for i in range(2):
        Image.fromarray(np.roll(img, 5 * i, axis=1)).save(q_dir / f"{i:04d}.png")

    out = str(tmp_path / "loc_out")
    rc = localize_camera.main(
        [
            "--map-chunks", map_dir,
            "--query-images", str(q_dir),
            "--aliked-path", aliked_path,
            "--max-keypoints", "64",
            "--output", out,
            "--device", "cpu",
            "--ba-iterations", "2",
            "--triangulate",
        ]
    )
    assert rc in (0, 1)
    stats = _json.load(open(os.path.join(out, "localization_stats.json")))
    assert len(stats) == 2
    assert all("num_matches" in s for s in stats)


def test_localize_camera_cli_register_mode(rng, tmp_path):
    """End-to-end CLI drive: fabricated ALIKED-style map + query chunk files,
    register mode; checks outputs and the recovered placement."""
    import localize_camera
    from tests.test_posegraph import _make_desc_chunk

    n_kp = 48
    seed = np.stack(
        [rng.uniform(-2, 2, n_kp), rng.uniform(-1.5, 1.5, n_kp), rng.uniform(4, 7, n_kp)],
        axis=1,
    )
    desc = rng.normal(size=(n_kp, 64))
    desc = (desc / np.linalg.norm(desc, axis=-1, keepdims=True)).astype(np.float32)

    def save_chunk(chunk, directory, idx):
        os.makedirs(directory, exist_ok=True)
        np.savez_compressed(
            os.path.join(directory, f"chunk_{idx:06d}.npz"),
            keypoints=chunk["keypoints"].astype(np.float16),
            points=chunk["points"].astype(np.float16),
            colors=(chunk["colors"] * 255).astype(np.uint8),
            camera_poses=chunk["camera_poses"].astype(np.float64),
            intrinsics=chunk["intrinsics"].astype(np.float32),
            image_paths=np.asarray([str(p) for p in chunk["image_paths"]]),
            original_width=chunk["original_width"],
            original_height=chunk["original_height"],
            descriptors=chunk["descriptors"].astype(np.float16),
        )

    map_dir = str(tmp_path / "map")
    q_dir = str(tmp_path / "query")
    save_chunk(_make_desc_chunk(rng, ["m0", "m1", "m2", "m3"], seed, desc, start=0), map_dir, 0)

    q_chunk = _make_desc_chunk(rng, ["q0", "q1", "q2"], seed, desc, start=1)
    # second camera in its own displaced gauge
    disp = sim3_exp(jnp.asarray([0.3, 0.1, -0.2, 0.05, 0.04, -0.06, 0.1], jnp.float32))
    pts = q_chunk["points"].reshape(-1, 3)
    q_chunk["points"] = np.asarray(
        sim3_apply(disp, jnp.asarray(pts, jnp.float32))
    ).reshape(q_chunk["points"].shape)
    poses = q_chunk["camera_poses"].copy()
    R = np.asarray(disp.rotation)
    poses[:, :3, 3] = np.asarray(
        sim3_apply(disp, jnp.asarray(poses[:, :3, 3], jnp.float32))
    )
    poses[:, :3, :3] = R @ poses[:, :3, :3]
    q_chunk["camera_poses"] = poses
    save_chunk(q_chunk, q_dir, 0)

    out = str(tmp_path / "out")
    rc = localize_camera.main(
        [
            "--map-chunks", map_dir,
            "--query-chunks", q_dir,
            "--output", out,
            "--device", "cpu",
            "--ba-iterations", "2",
        ]
    )
    assert rc == 0
    stats = json.load(open(os.path.join(out, "registration_stats.json")))
    assert stats[0]["success"]
    assert os.path.exists(os.path.join(out, "query_trajectory_tum.txt"))
    assert os.path.exists(os.path.join(out, "combined_points.ply"))


def test_triangulate_points_recovers_geometry(rng):
    from pi3_slam_tpu.sfm.localize import triangulate_points

    v = 4
    Rs = np.stack(
        [Rotation.from_euler("y", 5 * k, degrees=True).as_matrix() for k in range(v)]
    )
    cs = np.stack([np.array([0.4 * k, 0.02 * k, 0.0]) for k in range(v)])
    t = 80
    X = np.stack(
        [rng.uniform(-1.5, 1.5, t), rng.uniform(-1, 1, t), rng.uniform(3, 8, t)], axis=1
    )
    obs = np.zeros((t, v, 2), np.float32)
    val = np.ones((t, v), np.float32)
    for k in range(v):
        xc = (X - cs[k]) @ Rs[k].T
        obs[:, k, 0] = INTR[0] * xc[:, 0] / xc[:, 2] + INTR[2]
        obs[:, k, 1] = INTR[1] * xc[:, 1] / xc[:, 2] + INTR[3]
    obs += rng.normal(size=obs.shape) * 0.3
    val[: t // 4, 2:] = 0  # two-view tracks

    pts, rms, n_front = triangulate_points(
        jnp.asarray(Rs, jnp.float32),
        jnp.asarray(cs, jnp.float32),
        jnp.asarray(INTR),
        jnp.asarray(obs),
        jnp.asarray(val),
    )
    err = np.linalg.norm(np.asarray(pts) - X, axis=1)
    assert err.mean() < 0.05 and err.max() < 0.5
    assert float(np.asarray(rms).mean()) < 1.0
    assert int(np.asarray(n_front).min()) >= 2


def test_pnp_then_triangulate_second_camera(rng):
    """The PnP-mode reconstruction story end-to-end at the library level:
    localize query views against the map by descriptors, chain tracks of
    NEW (unmapped) points across the query views, triangulate them with the
    ESTIMATED poses — the new points must land at their true positions."""
    from pi3_slam_tpu.sfm.localize import build_query_tracks, triangulate_points

    n_map = 64
    seed = np.stack(
        [rng.uniform(-2, 2, n_map), rng.uniform(-1.5, 1.5, n_map), rng.uniform(4, 7, n_map)],
        axis=1,
    )
    desc_map = rng.normal(size=(n_map, 64))
    desc_map = (desc_map / np.linalg.norm(desc_map, axis=-1, keepdims=True)).astype(np.float32)
    recons = _desc_map_recons(rng, seed, desc_map)

    n_new = 40  # second camera's own points, absent from the map
    seed_new = np.stack(
        [rng.uniform(-2, 2, n_new), rng.uniform(-1.5, 1.5, n_new), rng.uniform(3.5, 6.5, n_new)],
        axis=1,
    )
    desc_new = rng.normal(size=(n_new, 64))
    desc_new = (desc_new / np.linalg.norm(desc_new, axis=-1, keepdims=True)).astype(np.float32)

    dets, poses_est, centers_est = [], [], []
    for k in range(3):
        R_q = Rotation.from_euler("yx", [6 * k - 6, 2], degrees=True).as_matrix()
        c_q = np.array([0.3 * k - 0.3, 0.1, 0.2])
        pts_all = np.concatenate([seed, seed_new])
        xc = (pts_all - c_q) @ R_q.T
        uv = np.stack(
            [INTR[0] * xc[:, 0] / xc[:, 2] + INTR[2], INTR[1] * xc[:, 1] / xc[:, 2] + INTR[3]],
            axis=1,
        ).astype(np.float32)
        desc_all = np.concatenate([desc_map, desc_new])
        res = localize_by_descriptors(recons, uv, desc_all, INTR, min_inliers=12, seed=k)
        assert res.success
        np.testing.assert_allclose(res.center, c_q, atol=1e-2)
        dets.append({"keypoints": uv, "descriptors": desc_all})
        poses_est.append(res.rotation)
        centers_est.append(res.center)

    obs_uv, obs_valid = build_query_tracks(dets)
    pts, rms, n_front = triangulate_points(
        jnp.asarray(np.stack(poses_est), jnp.float32),
        jnp.asarray(np.stack(centers_est), jnp.float32),
        jnp.asarray(INTR),
        jnp.asarray(obs_uv),
        jnp.asarray(obs_valid),
    )
    pts = np.asarray(pts)
    # every new point must be reconstructed near its true position by SOME track
    gt_err = np.min(
        np.linalg.norm(pts[None, :, :] - seed_new[:, None, :], axis=-1), axis=1
    )
    assert gt_err.max() < 0.05, gt_err.max()
