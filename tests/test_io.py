"""PLY / TUM IO round-trip tests."""

import numpy as np

from pi3_slam_tpu.io import write_ply, read_ply, write_tum_trajectory, read_tum_trajectory


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    write_ply(xyz, rgb, p)
    back = read_ply(p)
    np.testing.assert_allclose(back["xyz"], xyz, atol=1e-6)
    np.testing.assert_allclose(back["rgb"], np.clip(rgb * 255, 0, 255).astype(np.uint8))
    np.testing.assert_allclose(back["normals"], 0.0)


def test_ply_rainbow_and_subsample(tmp_path, rng):
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    write_ply(xyz, None, p, max_points=100, rng=rng)
    back = read_ply(p)
    assert back["xyz"].shape == (100, 3)
    assert back["rgb"].min() >= 0 and back["rgb"].max() <= 255


def test_ply_header_matches_reference_schema(tmp_path, rng):
    """Header must be byte-compatible with plyfile's output for the same dtype."""
    p = str(tmp_path / "c.ply")
    write_ply(rng.normal(size=(3, 3)), rng.uniform(0, 1, (3, 3)), p)
    header = open(p, "rb").read().split(b"end_header")[0].decode()
    for prop in ["x", "y", "z", "nx", "ny", "nz"]:
        assert f"property float {prop}" in header
    for prop in ["red", "green", "blue"]:
        assert f"property uchar {prop}" in header
    assert "binary_little_endian" in header


def test_tum_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    n = 20
    R = Rotation.random(n, random_state=np.random.RandomState(3)).as_matrix()
    t = rng.normal(size=(n, 3))
    p = str(tmp_path / "traj.txt")
    write_tum_trajectory(p, t, R)
    back = read_tum_trajectory(p)
    assert back["positions"].shape == (n, 3)
    np.testing.assert_allclose(back["positions"], t, atol=1e-5)
    np.testing.assert_allclose(back["timestamps"], np.arange(n))
    # quaternions (xyzw in file) reconstruct the same rotations
    R2 = Rotation.from_quat(back["quaternions_xyzw"]).as_matrix()
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_tum_integer_timestamps(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    R = Rotation.random(2, random_state=np.random.RandomState(4)).as_matrix()
    p = str(tmp_path / "traj.txt")
    write_tum_trajectory(p, np.zeros((2, 3)), R, integer_timestamps=True)
    lines = [l for l in open(p) if not l.startswith("#")]
    assert lines[0].split()[0] == "0"
    assert lines[1].split()[0] == "1"
