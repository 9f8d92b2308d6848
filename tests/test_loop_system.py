"""System test: loop closure through the full offline reconstruction chain.

A circular trajectory revisits its starting region after a full turn; the
chunks carry per-landmark descriptors (the ALIKED role). Sequential Sim3
stitching accumulates drift from overlap noise; `--loop-closure` must detect
the revisit between the first and last chunks (descriptor matching +
geometric verification), distribute the drift with the Sim3 pose graph, and
measurably cut the unaligned trajectory error. Runs the real
OfflineReconstructor path end-to-end (config integration included).
"""

import json
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.slam import OfflineReconstructor, ReconstructorConfig
from pi3_slam_tpu.utils.evaluation import ape_translation
from tests.test_system_ape import project


def write_loop_chunks(
    tmp_path,
    rng,
    n_frames=150,
    n_landmarks=2500,
    chunk_length=30,
    overlap=5,
    n_kp=100,
    noise_px=0.4,
    pt_sigma=0.03,
    desc_dim=64,
):
    """Closed circular trajectory (radius 5, cameras facing outward) around
    a landmark ring; chunk files carry per-landmark unit descriptors so the
    revisit is detectable by appearance."""
    w, h, f = 640, 480, 500.0
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    theta = 2 * np.pi * np.arange(n_frames) / n_frames
    centers = np.stack([5 * np.cos(theta), 5 * np.sin(theta), np.zeros(n_frames)], axis=1)
    rots = []
    for th in theta:
        z_cam = np.array([np.cos(th), np.sin(th), 0.0])  # radial outward
        x_cam = np.array([-np.sin(th), np.cos(th), 0.0])  # tangent
        y_cam = np.array([0.0, 0.0, 1.0])
        rots.append(np.stack([x_cam, y_cam, z_cam], axis=1))  # R_wc columns
    rots = np.stack(rots)

    phi = rng.uniform(0, 2 * np.pi, n_landmarks)
    rad = rng.uniform(9, 13, n_landmarks)
    landmarks = np.stack(
        [rad * np.cos(phi), rad * np.sin(phi), rng.uniform(-2.5, 2.5, n_landmarks)],
        axis=1,
    )
    desc = rng.normal(size=(n_landmarks, desc_dim))
    desc = (desc / np.linalg.norm(desc, axis=-1, keepdims=True)).astype(np.float32)

    from pi3_slam_tpu.data.datasets import chunk_windows

    windows = chunk_windows(n_frames, chunk_length, overlap)
    chunks_dir = tmp_path / "chunks"
    os.makedirs(chunks_dir, exist_ok=True)

    for ci, (s, e) in enumerate(windows):
        frames = list(range(s, e))
        nf = len(frames)
        g_s = rng.uniform(0.8, 1.25)
        g_R = Rotation.from_rotvec(rng.normal(size=3) * 0.08).as_matrix()
        g_t = rng.normal(size=3) * 0.4

        kps = np.zeros((nf, n_kp, 2), np.float32)
        pts = np.zeros((nf, n_kp, 3), np.float32)
        descs = np.zeros((nf, n_kp, desc_dim), np.float32)
        poses = np.tile(np.eye(4), (nf, 1, 1))
        for j, fidx in enumerate(frames):
            uv, z = project(K, rots[fidx], centers[fidx], landmarks)
            vis = (z > 1.0) & (uv[:, 0] > 5) & (uv[:, 0] < w - 5) & (uv[:, 1] > 5) & (uv[:, 1] < h - 5)
            sel_rng = np.random.default_rng(fidx)  # frame-deterministic keypoints
            vis_ids = np.nonzero(vis)[0]
            sel = vis_ids[sel_rng.permutation(len(vis_ids))[:n_kp]]
            sel = np.concatenate([sel, np.repeat(sel[-1:], n_kp - len(sel))])
            kps[j] = uv[sel] + sel_rng.normal(size=(n_kp, 2)) * noise_px
            pw = g_s * landmarks[sel] @ g_R.T + g_t
            pts[j] = pw + rng.normal(size=pw.shape) * (pt_sigma * g_s)
            descs[j] = desc[sel]
            poses[j, :3, :3] = g_R @ rots[fidx]
            poses[j, :3, 3] = g_s * g_R @ centers[fidx] + g_t

        np.savez_compressed(
            chunks_dir / f"chunk_{ci:06d}.npz",
            keypoints=kps.astype(np.float16),
            points=pts.astype(np.float16),
            colors=np.full((nf, n_kp, 3), 128, np.uint8),
            camera_poses=poses.astype(np.float32),
            intrinsics=np.tile(K, (nf, 1, 1)).astype(np.float32),
            image_paths=np.asarray([f"frame_{i:04d}.png" for i in frames]),
            original_width=w,
            original_height=h,
            masks=np.ones((nf, n_kp), bool),
            descriptors=descs.astype(np.float16),
        )
    with open(tmp_path / "chunk_metadata.json", "w") as fj:
        json.dump({"chunk_length": chunk_length, "overlap": overlap}, fj)
    return centers


def _run(tmp_path, out_name, loop_closure):
    rec = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=str(tmp_path),
            output_dir=str(tmp_path / out_name),
            max_observations_per_track=6,
            ba_iterations=3,
            align_refine_iterations=5,
            loop_closure=loop_closure,
        )
    )
    return rec.run()


@pytest.mark.slow
def test_loop_closure_cuts_drift(tmp_path, rng):
    gt_centers = write_loop_chunks(tmp_path, rng)

    res_plain = _run(tmp_path, "recon_plain", loop_closure=False)
    res_loop = _run(tmp_path, "recon_loop", loop_closure=True)

    assert all(a.success for a in res_plain["alignment"])
    stats = res_loop["loop_closure"]
    assert stats["num_loop_edges"] >= 1
    # the genuine revisit: first chunk <-> last chunk
    pairs = [(e.i, e.j) for e in stats["edges"]]
    n_chunks = len(res_loop["reconstructions"])
    assert (0, n_chunks - 1) in pairs

    from pi3_slam_tpu.io import read_tum_trajectory

    ape = {}
    for name, res in (("plain", res_plain), ("loop", res_loop)):
        traj = read_tum_trajectory(res["artifacts"]["trajectory"])
        assert traj["positions"].shape[0] == len(gt_centers)
        # no Sim3 re-alignment of the error: loop closure's benefit is
        # exactly the drift a global gauge fit cannot hide
        ape[name] = ape_translation(
            gt_centers, traj["positions"], align_sim3=True
        ).rmse
    # closure must not hurt, and must measurably cut the drift
    assert ape["loop"] < ape["plain"], ape
    assert ape["loop"] < 0.7 * ape["plain"], ape
