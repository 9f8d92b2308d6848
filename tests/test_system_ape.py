"""System test: synthetic multi-chunk scene through the full offline
reconstruction chain, gated on Sim3-aligned APE — the in-repo stand-in for
the 7-Scenes evo_ape gate (which needs dataset + checkpoint access).

Chunks are generated directly from a synthetic trajectory + landmark field
with per-chunk gauge corruption (random Sim3 per chunk, like Pi3's per-chunk
arbitrary frame) and measurement noise; the reconstructor must bundle-adjust
and stitch them back into one consistent trajectory.

Two scales:
  * quick: 14 frames / 3 chunks — smoke-level, runs in seconds.
  * eval-scale: 5 chunks x 100 frames, 400 keypoints, overlap 20,
    confidence-correlated outliers and per-chunk metric-scale perturbation —
    the exact shapes and conditioning of the 7-Scenes protocol
    (reference scripts/eval_7scenes.sh:59-181: chunk_size 100, overlap 20,
    max_keypoints 400). BA/refine iteration counts are reduced to keep CI
    bounded; the Schur solve and track fan run at full eval width.
"""

import json
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.slam import OfflineReconstructor, ReconstructorConfig
from pi3_slam_tpu.utils.evaluation import ape_translation


def make_synthetic_sequence(
    rng, n_frames=14, n_landmarks=300, width=640, height=480, step=0.4,
    yaw_rate=0.02,
):
    """Smooth forward trajectory with yaw, landmarks ahead of the cameras."""
    f = 500.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]])
    centers = np.stack(
        [
            step * np.arange(n_frames),
            0.05 * np.sin(np.arange(n_frames) * 0.4),
            0.05 * step * np.arange(n_frames),
        ],
        axis=1,
    )
    rots = [Rotation.from_euler("y", yaw_rate * i).as_matrix() for i in range(n_frames)]
    landmarks = np.stack(
        [
            rng.uniform(-4, 4 + step * n_frames, n_landmarks),
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


def write_synthetic_chunks(
    tmp_path,
    rng,
    n_frames=14,
    n_landmarks=300,
    chunk_length=6,
    overlap=2,
    n_kp=120,
    noise_px=0.3,
    step=0.4,
    yaw_rate=0.02,
    conf_outliers=False,
    frame_name_fn=None,
    width=640,
    height=480,
):
    """conf_outliers: per-keypoint confidence in [0.2, 1]; pixel and 3D noise
    scale with (1.5 - conf), and low-confidence keypoints occasionally become
    gross outliers (tens of px + corrupted 3D point) — the error structure of
    real Pi3 confidence maps."""
    K, centers, rots, landmarks = make_synthetic_sequence(
        rng, n_frames=n_frames, n_landmarks=n_landmarks, step=step,
        yaw_rate=yaw_rate, width=width, height=height,
    )
    n = len(centers)
    from pi3_slam_tpu.data.datasets import chunk_windows

    windows = chunk_windows(n, chunk_length, overlap)
    chunks_dir = tmp_path / "chunks"
    os.makedirs(chunks_dir, exist_ok=True)

    for ci, (s, e) in enumerate(windows):
        frames = list(range(s, e))
        nf = len(frames)
        # per-chunk gauge corruption: random Sim3 applied to this chunk's
        # world — the scale factor doubles as metric-scale drift between
        # chunks (MoGe ratio noise in the real pipeline)
        g_s = rng.uniform(0.7, 1.4)
        g_R = Rotation.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
        g_t = rng.normal(size=3) * 0.5

        kps = np.zeros((nf, n_kp, 2), np.float32)
        pts = np.zeros((nf, n_kp, 3), np.float32)
        confs = np.ones((nf, n_kp, 1), np.float32)
        poses = np.tile(np.eye(4), (nf, 1, 1))
        for j, fidx in enumerate(frames):
            uv, z = project(K, rots[fidx], centers[fidx], landmarks)
            vis = (
                (z > 0.5)
                & (uv[:, 0] > 5) & (uv[:, 0] < width - 5)
                & (uv[:, 1] > 5) & (uv[:, 1] < height - 5)
            )
            # deterministic landmark subset per FRAME INDEX so shared frames in
            # different chunks get identical keypoints (grid-extractor property)
            sel_rng = np.random.default_rng(fidx)
            vis_ids = np.nonzero(vis)[0]
            sel = vis_ids[sel_rng.permutation(len(vis_ids))[:n_kp]]
            sel = np.concatenate([sel, np.repeat(sel[-1:], n_kp - len(sel))])
            if conf_outliers:
                conf = sel_rng.uniform(0.2, 1.0, n_kp)
                confs[j, :, 0] = conf
                px_sigma = noise_px * (1.5 - conf)[:, None]
                pt_sigma = 0.005 * (1.5 - conf)[:, None]
                gross = (conf < 0.4) & (sel_rng.uniform(size=n_kp) < 0.15)
            else:
                px_sigma = noise_px
                pt_sigma = 0.005
                gross = np.zeros(n_kp, bool)
            kps[j] = uv[sel] + sel_rng.normal(size=(n_kp, 2)) * px_sigma
            # world points in the CHUNK's corrupted gauge
            pw = g_s * landmarks[sel] @ g_R.T + g_t
            pts[j] = pw + rng.normal(size=pw.shape) * pt_sigma
            if gross.any():
                kps[j, gross] += sel_rng.normal(size=(gross.sum(), 2)) * 40.0
                pts[j, gross] += rng.normal(size=(gross.sum(), 3)) * (2.0 * g_s)
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
            image_paths=np.asarray([
                (frame_name_fn or (lambda i: f"frame_{i:04d}.png"))(i)
                for i in frames
            ]),
            original_width=width,
            original_height=height,
            masks=np.ones((nf, n_kp), bool),
            conf=confs.astype(np.float16),
        )
    with open(tmp_path / "chunk_metadata.json", "w") as fjson:
        json.dump({"chunk_length": chunk_length, "overlap": overlap, "target_size": [height, width]}, fjson)
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


def test_offline_chain_ape_gate_unbounded_fan(tmp_path, rng):
    """The reference-style unbounded earlier-frame fan
    (utils/chunk_reconstruction.py:163-185) converges through the same chain;
    eval-scale APE/runtime A/B lives in tools/ablate_observation_fan.py."""
    gt_centers = write_synthetic_chunks(tmp_path, rng)
    rec = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=str(tmp_path),
            output_dir=str(tmp_path / "recon"),
            max_observations_per_track=8,
            observation_fan="unbounded",
            ba_iterations=10,
        )
    )
    result = rec.run()
    assert all(a.success for a in result["alignment"])
    # fan width: chunk_length 6 -> M = 5 earlier + 8//2 after + self = 10
    assert result["reconstructions"][0].obs_frame.shape[1] == 10

    from pi3_slam_tpu.io import read_tum_trajectory

    traj = read_tum_trajectory(result["artifacts"]["trajectory"])
    ape = ape_translation(gt_centers, traj["positions"], align_sim3=True)
    assert ape.rmse < 0.05, f"unbounded-fan APE RMSE {ape.rmse:.4f} m"


@pytest.mark.slow
def test_offline_chain_ape_gate_eval_scale(tmp_path, rng):
    """Eval-shaped system gate: 5 chunks x 100 frames x 400 keypoints,
    overlap 20 — the 100-frame Schur conditioning, 400-kp track fans, and
    20+-frame overlap stitching of the 7-Scenes protocol, with
    confidence-correlated outliers and per-chunk metric-scale drift."""
    n_frames = 420  # chunk_windows(420, 100, 20) -> 5 windows
    gt_centers = write_synthetic_chunks(
        tmp_path,
        rng,
        n_frames=n_frames,
        n_landmarks=5000,
        chunk_length=100,
        overlap=20,
        n_kp=400,
        noise_px=0.4,
        step=0.08,
        yaw_rate=0.0007,  # ~17 deg total pan; keeps the field in view
        conf_outliers=True,
    )
    rec = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=str(tmp_path),
            output_dir=str(tmp_path / "recon"),
            max_observations_per_track=10,
            ba_iterations=3,  # reduced to bound CI runtime; eval uses 10
            align_refine_iterations=10,  # eval uses 50
        )
    )
    result = rec.run()
    n_align = len(result["alignment"])
    assert n_align == len(result["reconstructions"]) - 1 >= 4
    ok = sum(1 for a in result["alignment"] if a.success)
    assert ok == n_align, f"alignment success {ok}/{n_align}"
    # every alignment must find a healthy share of the 20x400 overlap tracks
    for a in result["alignment"]:
        assert a.num_common_tracks > 2000, a

    from pi3_slam_tpu.io import read_tum_trajectory

    traj = read_tum_trajectory(result["artifacts"]["trajectory"])
    assert traj["positions"].shape[0] == n_frames
    ape = ape_translation(gt_centers, traj["positions"], align_sim3=True)
    # ~34 m trajectory; the 7-Scenes gate is mean APE <= 0.07 m on room-scale
    # scenes — hold the same absolute bar at 6x the trajectory span
    assert ape.rmse < 0.07, f"eval-scale system APE RMSE {ape.rmse:.4f} m"


@pytest.mark.slow
def test_online_matches_offline_ape_eval_scale(tmp_path, rng):
    """The streaming pipeline (Pi3SLAMOnline: async two-stage consumer,
    device/host overlap, in-order queue) produces the SAME trajectory as the
    offline chain on the eval-scale scene — the gate that protects the online
    path's correctness as its pipeline gets more aggressive (round-4 verdict
    item 5). The device step is stubbed with the synthetic chunk outputs
    (identical inputs to what the offline chain loads from npz); both chains
    then run the same build/BA + Sim3-align code with identical settings, so
    the merged trajectories must agree to solver determinism."""
    import glob
    import re as _re
    import sys

    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pi3_model import TINY

    from pi3_slam_tpu.io import read_tum_trajectory
    from pi3_slam_tpu.slam.online import OnlineConfig, Pi3SLAMOnline

    W, H = 644, 476  # multiples of 14: the dataset resize is then a no-op
    n_frames = 420  # chunk_windows(420, 100, 20): 5 full windows + 20f tail
    gt_centers = write_synthetic_chunks(
        tmp_path, rng,
        n_frames=n_frames, n_landmarks=5000, chunk_length=100, overlap=20,
        n_kp=400, noise_px=0.4, step=0.08, yaw_rate=0.0007,
        conf_outliers=True, width=W, height=H,
    )

    # --- offline chain (reduced iterations, as the eval-scale gate) ---
    rec = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=str(tmp_path), output_dir=str(tmp_path / "recon"),
            max_observations_per_track=10, ba_iterations=3,
            align_refine_iterations=10,
        )
    )
    off = rec.run()
    assert all(a.success for a in off["alignment"])
    traj_off = read_tum_trajectory(off["artifacts"]["trajectory"])["positions"]

    # --- online chain over the same data, same settings ---
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    flat = np.full((H, W, 3), 127, np.uint8)  # content unused by the stub
    im = Image.fromarray(flat)
    paths = []
    for i in range(n_frames):
        p = str(img_dir / f"frame_{i:04d}.png")
        im.save(p)
        paths.append(p)

    chunk_files = sorted(glob.glob(str(tmp_path / "chunks" / "chunk_*.npz")))
    by_start = {}
    for f in chunk_files:
        d = np.load(f, allow_pickle=True)
        start = int(_re.search(r"(\d+)", str(d["image_paths"][0])).group(1))
        by_start[start] = {
            "kps": d["keypoints"].astype(np.float32),
            "pts": d["points"],
            "colors": d["colors"],
            "poses": d["camera_poses"],
            "intr": d["intrinsics"],
        }

    cfg = OnlineConfig(
        chunk_length=100, overlap=20, pixel_limit=W * H,
        use_metric_depth=False, max_keypoints=400, compute_dtype="float32",
        output_dir=str(tmp_path / "online_out"),
        max_observations_per_track=10, ba_iterations=3,
        align_refine_iterations=10,
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)

    def fake_dispatch(batch):
        start = int(
            _re.search(r"(\d+)", os.path.basename(batch["paths"][0])).group(1)
        )
        d = by_start[start]
        # windows include a 20-frame tail (chunk_windows(420,100,20) strides
        # by 80 then appends (400,420)); shapes must match the stored chunk
        assert batch["images"].shape == (d["poses"].shape[0], 3, H, W)
        slam._produced += 1
        return {
            "dev": {
                "camera_poses": d["poses"],
                "points_kp": d["pts"],
                "colors_kp": d["colors"],
                "intrinsics": d["intr"],
            },
            "moge_depth": None, "kps": d["kps"], "det": None, "batch": batch,
        }

    slam._dispatch_device = fake_dispatch
    r = slam.process_image_paths(paths)
    assert r["num_chunks"] == 6  # 5 full windows + the (400,420) tail
    assert all(a.success for a in slam.alignment_results)
    traj_on = slam._merged_trajectory()[0]

    # identical inputs + identical solver settings: the streaming pipeline
    # may not change the math, only the schedule
    assert traj_on.shape == traj_off.shape == (n_frames, 3)
    np.testing.assert_allclose(traj_on, traj_off, atol=1e-6)

    ape_on = ape_translation(gt_centers, traj_on, align_sim3=True)
    ape_off = ape_translation(gt_centers, traj_off, align_sim3=True)
    assert ape_on.rmse < 0.07, f"online eval-scale APE {ape_on.rmse:.4f} m"
    assert abs(ape_on.rmse - ape_off.rmse) < 1e-4
