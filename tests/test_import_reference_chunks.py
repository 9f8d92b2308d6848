"""Reference .pt chunk import: build a chunk directory in the reference's
torch-pickle layout (slam/offline_chunk_creator.py:204-328), convert it, and
reconstruct it with our offline reconstructor."""

import json
import sys

import numpy as np
import pytest


@pytest.fixture()
def reference_chunk_dir(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    src = tmp_path / "ref_out"
    (src / "chunks").mkdir(parents=True)

    N, K = 4, 30
    manifest = []
    shared_kp = rng.uniform(5, 50, (N, K, 2)).astype(np.float32)
    for ci in range(2):
        poses = np.tile(np.eye(4, dtype=np.float64), (N, 1, 1))
        poses[:, 0, 3] = np.linspace(0, 1, N) + ci * 0.5
        pts = rng.normal(0, 1, (N, K, 3)) + [0, 0, 5]
        start = ci * (N - 2)
        paths = [f"frame_{start + i:04d}.png" for i in range(N)]
        chunk = {
            "points": torch.from_numpy(pts.astype(np.float16)),
            "local_points": torch.from_numpy(pts.astype(np.float16)),
            "conf": torch.from_numpy(rng.uniform(0.5, 1, (N, K, 1)).astype(np.float16)),
            "masks": torch.from_numpy(np.ones((N, K), bool)),
            "keypoints": torch.from_numpy(shared_kp.astype(np.float16)),
            "colors": torch.from_numpy(rng.uniform(0, 255, (N, K, 3)).astype(np.float16)),
            "camera_poses": torch.from_numpy(poses.astype(np.float32)),
            "camera_params": {
                "intrinsics": torch.from_numpy(
                    np.tile(np.array([[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]], np.float32), (N, 1, 1))
                )
            },
            "intrinsics": torch.from_numpy(
                np.tile(np.array([[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]], np.float32), (N, 1, 1))
            ),
            "image_paths": paths,
            "original_width": 56,
            "original_height": 56,
            "chunk_index": ci,
            "start_idx": start,
            "end_idx": start + N,
        }
        torch.save(chunk, src / "chunks" / f"chunk_{ci:06d}.pt")
        manifest.append(
            {"chunk_index": ci, "file": f"chunk_{ci:06d}.pt", "start_idx": start,
             "end_idx": start + N, "num_frames": N, "image_paths": paths}
        )
    (src / "chunks_manifest.json").write_text(json.dumps(manifest))
    (src / "chunk_metadata.json").write_text(
        json.dumps({"chunk_length": N, "overlap": 2, "target_size": [56, 56]})
    )
    return str(src)


def test_import_and_reconstruct(reference_chunk_dir, tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    try:
        import import_reference_chunks as imp
    finally:
        sys.path.remove("/root/repo/tools")

    out = str(tmp_path / "imported")
    assert imp.main([reference_chunk_dir, out]) == 0

    z = np.load(f"{out}/chunks/chunk_000000.npz")
    assert z["points"].shape == (4, 30, 3)
    assert z["camera_poses"].shape == (4, 4, 4)
    assert "camera_poses_cw" in z.files and "intrinsics" in z.files
    manifest = json.loads(open(f"{out}/chunks_manifest.json").read())
    assert manifest[0]["file"].endswith(".npz")

    from pi3_slam_tpu.slam import OfflineReconstructor, ReconstructorConfig

    rec = OfflineReconstructor(
        ReconstructorConfig(chunk_dir=out, output_dir=str(tmp_path / "rec"), ba_iterations=2)
    )
    result = rec.run()
    assert len(result["reconstructions"]) == 2
    from pi3_slam_tpu.io import read_tum_trajectory

    traj = read_tum_trajectory(result["artifacts"]["trajectory"])
    assert traj["positions"].shape[0] == 6  # 4 + 4 - 2 shared frames
