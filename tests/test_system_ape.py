"""System test: synthetic multi-chunk scene through the full offline
reconstruction chain, gated on Sim3-aligned APE — the in-repo stand-in for
the 7-Scenes evo_ape gate (which needs dataset + checkpoint access).

Chunks are generated directly from a synthetic trajectory + landmark field
with per-chunk gauge corruption (random Sim3 per chunk, like Pi3's per-chunk
arbitrary frame) and measurement noise; the reconstructor must bundle-adjust
and stitch them back into one consistent trajectory.
"""

import json
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.slam import OfflineReconstructor, ReconstructorConfig
from pi3_slam_tpu.utils.evaluation import ape_translation


def make_synthetic_sequence(rng, n_frames=14, n_landmarks=300, width=640, height=480):
    """Smooth forward trajectory with yaw, landmarks ahead of the cameras."""
    f = 500.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]])
    centers = np.stack(
        [
            0.4 * np.arange(n_frames),
            0.05 * np.sin(np.arange(n_frames) * 0.4),
            0.02 * np.arange(n_frames),
        ],
        axis=1,
    )
    rots = [Rotation.from_euler("y", 0.02 * i).as_matrix() for i in range(n_frames)]
    landmarks = np.stack(
        [
            rng.uniform(-4, 4 + 0.4 * n_frames, n_landmarks),
            rng.uniform(-3, 3, n_landmarks),
            rng.uniform(4, 10, n_landmarks),
        ],
        axis=1,
    )
    return K, centers, np.stack(rots), landmarks


def project(K, R_wc, center, pts):
    """R_wc: cam-to-world rotation. Returns (uv, z)."""
    cam = (pts - center) @ R_wc  # = R_cw @ (p - c)
    z = cam[:, 2]
    uv = np.stack(
        [K[0, 0] * cam[:, 0] / z + K[0, 2], K[1, 1] * cam[:, 1] / z + K[1, 2]], axis=1
    )
    return uv, z


def write_synthetic_chunks(tmp_path, rng, chunk_length=6, overlap=2, noise_px=0.3):
    K, centers, rots, landmarks = make_synthetic_sequence(rng)
    n = len(centers)
    from pi3_slam_tpu.data.datasets import chunk_windows

    windows = chunk_windows(n, chunk_length, overlap)
    chunks_dir = tmp_path / "chunks"
    os.makedirs(chunks_dir, exist_ok=True)
    n_kp = 120

    for ci, (s, e) in enumerate(windows):
        frames = list(range(s, e))
        nf = len(frames)
        # per-chunk gauge corruption: random Sim3 applied to this chunk's world
        g_s = rng.uniform(0.7, 1.4)
        g_R = Rotation.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
        g_t = rng.normal(size=3) * 0.5

        kps = np.zeros((nf, n_kp, 2), np.float32)
        pts = np.zeros((nf, n_kp, 3), np.float32)
        poses = np.tile(np.eye(4), (nf, 1, 1))
        for j, fidx in enumerate(frames):
            uv, z = project(K, rots[fidx], centers[fidx], landmarks)
            vis = (z > 0.5) & (uv[:, 0] > 5) & (uv[:, 0] < 635) & (uv[:, 1] > 5) & (uv[:, 1] < 475)
            # deterministic landmark subset per FRAME INDEX so shared frames in
            # different chunks get identical keypoints (grid-extractor property)
            sel_rng = np.random.default_rng(fidx)
            vis_ids = np.nonzero(vis)[0]
            sel = vis_ids[sel_rng.permutation(len(vis_ids))[:n_kp]]
            sel = np.concatenate([sel, np.repeat(sel[-1:], n_kp - len(sel))])
            kps[j] = uv[sel] + sel_rng.normal(size=(n_kp, 2)) * noise_px
            # world points in the CHUNK's corrupted gauge
            pw = g_s * landmarks[sel] @ g_R.T + g_t
            pts[j] = pw + rng.normal(size=pw.shape) * 0.005
            c_corrupt = g_s * g_R @ centers[fidx] + g_t
            poses[j, :3, :3] = g_R @ rots[fidx]
            poses[j, :3, 3] = c_corrupt

        np.savez_compressed(
            chunks_dir / f"chunk_{ci:06d}.npz",
            keypoints=kps.astype(np.float16),
            points=pts.astype(np.float16),
            colors=np.full((nf, n_kp, 3), 128, np.uint8),
            camera_poses=poses.astype(np.float32),
            camera_poses_cw=np.linalg.inv(poses).astype(np.float32),
            intrinsics=np.tile(K, (nf, 1, 1)).astype(np.float32),
            image_paths=np.asarray([f"frame_{i:04d}.png" for i in frames]),
            original_width=640,
            original_height=480,
            masks=np.ones((nf, n_kp), bool),
            conf=np.ones((nf, n_kp, 1), np.float16),
        )
    with open(tmp_path / "chunk_metadata.json", "w") as fjson:
        json.dump({"chunk_length": chunk_length, "overlap": overlap, "target_size": [480, 640]}, fjson)
    return centers


def test_offline_chain_ape_gate(tmp_path, rng):
    gt_centers = write_synthetic_chunks(tmp_path, rng)
    rec = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=str(tmp_path),
            output_dir=str(tmp_path / "recon"),
            max_observations_per_track=8,
            ba_iterations=10,
        )
    )
    result = rec.run()
    assert all(a.success for a in result["alignment"]), "chunk alignment failed"

    from pi3_slam_tpu.io import read_tum_trajectory

    traj = read_tum_trajectory(result["artifacts"]["trajectory"])
    assert traj["positions"].shape[0] == len(gt_centers)
    ape = ape_translation(gt_centers, traj["positions"], align_sim3=True)
    # trajectory spans ~5.2m; gate well under the reference's 7-Scenes regime
    assert ape.rmse < 0.05, f"system APE RMSE {ape.rmse:.4f} m"
