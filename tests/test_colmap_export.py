"""COLMAP text-model export tests (io/colmap.py).

Verifies the written model against the COLMAP conventions directly: the
stored (qw qx qy qz, t) must reproject each 3D point onto its POINTS2D
entry, and the points3D TRACK[] back-pointers must index the right
POINTS2D slots.
"""

import numpy as np
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.io import write_colmap_text
from pi3_slam_tpu.sfm.reconstruction import ChunkReconstruction


def _make_recon(rng, frame_names, seed_points, width=64, height=48):
    n = len(frame_names)
    t = seed_points.shape[0]
    rotations = Rotation.random(n, random_state=np.random.RandomState(7)).as_matrix()
    centers = rng.normal(size=(n, 3)) * 0.1 + np.array([0.0, 0.0, -5.0])
    intr = np.tile(np.array([80.0, 82.0, width / 2, height / 2]), (n, 1))

    m = 3  # observations per track
    obs_frame = rng.integers(0, n, size=(t, m))
    obs_uv = np.zeros((t, m, 2))
    for ti in range(t):
        for mi in range(m):
            j = obs_frame[ti, mi]
            pc = rotations[j] @ (seed_points[ti] - centers[j])
            obs_uv[ti, mi, 0] = intr[j, 0] * pc[0] / pc[2] + intr[j, 2]
            obs_uv[ti, mi, 1] = intr[j, 1] * pc[1] / pc[2] + intr[j, 3]
    return ChunkReconstruction(
        frame_names=list(frame_names),
        rotations=rotations,
        centers=centers,
        intrinsics=intr,
        points=seed_points,
        colors=rng.uniform(size=(t, 3)),
        track_frame=obs_frame[:, 0].copy(),
        track_kp=np.arange(t),
        track_uv=obs_uv[:, 0].copy(),
        track_valid=np.ones(t),
        obs_frame=obs_frame,
        obs_uv=obs_uv,
        obs_valid=np.ones((t, m)),
        image_width=width,
        image_height=height,
    )


def _parse_model(out_dir):
    cameras = {}
    for line in open(out_dir / "cameras.txt"):
        if line.startswith("#"):
            continue
        parts = line.split()
        cameras[int(parts[0])] = [float(x) for x in parts[4:]]

    images, points2d = {}, {}
    lines = [l for l in open(out_dir / "images.txt") if not l.startswith("#")]
    for pose_line, pts_line in zip(lines[0::2], lines[1::2]):
        parts = pose_line.split()
        img_id = int(parts[0])
        images[img_id] = {
            "q": np.array([float(x) for x in parts[1:5]]),
            "t": np.array([float(x) for x in parts[5:8]]),
            "camera_id": int(parts[8]),
            "name": parts[9],
        }
        vals = pts_line.split()
        points2d[img_id] = [
            (float(vals[k]), float(vals[k + 1]), int(vals[k + 2]))
            for k in range(0, len(vals), 3)
        ]

    points3d = {}
    for line in open(out_dir / "points3D.txt"):
        if line.startswith("#"):
            continue
        parts = line.split()
        pid = int(parts[0])
        track = [
            (int(parts[k]), int(parts[k + 1])) for k in range(8, len(parts), 2)
        ]
        points3d[pid] = {
            "xyz": np.array([float(x) for x in parts[1:4]]),
            "rgb": np.array([int(x) for x in parts[4:7]]),
            "track": track,
        }
    return cameras, images, points2d, points3d


def test_colmap_export_geometry(tmp_path, rng):
    pts_a = rng.normal(size=(12, 3))
    pts_b = rng.normal(size=(9, 3))
    ra = _make_recon(rng, ["f0.png", "f1.png", "f2.png"], pts_a)
    rb = _make_recon(rng, ["f2.png", "f3.png"], pts_b)
    # aligned chunks agree on the shared frame's pose (Sim3 chaining
    # guarantees this in the pipeline); make the fixture consistent and
    # re-project chunk B's observations of f2 with the shared pose
    rb.rotations[0] = ra.rotations[2]
    rb.centers[0] = ra.centers[2]
    for ti in range(rb.num_tracks):
        for mi in range(rb.obs_frame.shape[1]):
            j = rb.obs_frame[ti, mi]
            pc = rb.rotations[j] @ (pts_b[ti] - rb.centers[j])
            rb.obs_uv[ti, mi, 0] = rb.intrinsics[j, 0] * pc[0] / pc[2] + rb.intrinsics[j, 2]
            rb.obs_uv[ti, mi, 1] = rb.intrinsics[j, 1] * pc[1] / pc[2] + rb.intrinsics[j, 3]

    out = tmp_path / "colmap"
    paths = write_colmap_text([ra, rb], str(out))
    assert set(paths) == {"cameras", "images", "points3D"}

    cameras, images, points2d, points3d = _parse_model(out)

    # frame dedup by name: f2.png appears once -> 4 images total
    names = [v["name"] for v in images.values()]
    assert sorted(names) == ["f0.png", "f1.png", "f2.png", "f3.png"]
    assert len(points3d) == 21

    # every TRACK[] entry back-points to a POINTS2D slot tagged with this pid
    for pid, p in points3d.items():
        assert p["track"], "every exported track has observations"
        for img_id, idx in p["track"]:
            x, y, back_pid = points2d[img_id][idx]
            assert back_pid == pid

            # COLMAP convention check: x_cam = R(q) @ X + t projects to (x, y)
            img = images[img_id]
            q = img["q"]  # (w, x, y, z)
            R = Rotation.from_quat(np.r_[q[1:4], q[0]]).as_matrix()
            pc = R @ p["xyz"] + img["t"]
            fx, fy, cx, cy = cameras[img["camera_id"]]
            u = fx * pc[0] / pc[2] + cx
            v = fy * pc[1] / pc[2] + cy
            assert abs(u - x) < 0.01 and abs(v - y) < 0.01


def test_colmap_export_via_reconstructor_flag(tmp_path, rng):
    """--save-colmap wiring: OfflineReconstructor.export writes the model."""
    from pi3_slam_tpu.slam.config import ReconstructorConfig
    from pi3_slam_tpu.slam.offline_reconstructor import OfflineReconstructor

    cfg = ReconstructorConfig(
        chunk_dir=str(tmp_path), output_dir=str(tmp_path), save_colmap=True
    )
    rec = OfflineReconstructor.__new__(OfflineReconstructor)
    rec.config = cfg
    rec.output_dir = str(tmp_path)
    arts = rec.export([_make_recon(rng, ["a.png", "b.png"], rng.normal(size=(5, 3)))])
    assert "colmap" in arts
    assert (tmp_path / "colmap" / "points3D.txt").exists()
