"""Data layer tests: windowing, target size, keypoints, undistortion."""

import json

import numpy as np
from PIL import Image

from pi3_slam_tpu.data import chunk_windows, calculate_target_size, ChunkDataset, PrefetchLoader
from pi3_slam_tpu.data.undistortion import CalibratedCamera, Undistorter, create_undistorter
from pi3_slam_tpu.utils.keypoints import grid_keypoints, grid_spacing, GridKeypointExtractor


def test_chunk_windows_matches_reference():
    # stride = chunk_length - overlap, >= 2 frames per chunk
    assert chunk_windows(10, 4, 2) == [(0, 4), (2, 6), (4, 8), (6, 10), (8, 10)]
    assert chunk_windows(5, 10, 2) == [(0, 5)]
    # a trailing 1-frame window is dropped
    assert chunk_windows(9, 4, 0) == [(0, 4), (4, 8)]


def test_calculate_target_size(tmp_path):
    p = str(tmp_path / "img.png")
    Image.new("RGB", (640, 480)).save(p)
    h, w = calculate_target_size(p, pixel_limit=255000 // 2)
    assert h % 14 == 0 and w % 14 == 0
    assert h * w <= 255000 // 2
    # aspect preserved approximately
    assert abs((w / h) - (640 / 480)) < 0.1


def test_chunk_dataset_and_prefetch(tmp_path, rng):
    paths = []
    for i in range(7):
        p = str(tmp_path / f"f{i:03d}.png")
        Image.fromarray(rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    ds = ChunkDataset(paths, chunk_length=3, overlap=1, target_size=(28, 28))
    assert len(ds) == 3
    item = ds[0]
    assert item["images"].shape == (3, 3, 28, 28)
    # TPU-first default: raw uint8 bytes ship to the device, the jitted
    # step normalizes (4x less host->device transfer)
    assert item["images"].dtype == np.uint8
    ds_f = ChunkDataset(paths, chunk_length=3, overlap=1, target_size=(28, 28),
                        image_dtype="float32")
    imf = ds_f[0]["images"]
    assert imf.dtype == np.float32
    assert 0.0 <= imf.min() and imf.max() <= 1.0
    np.testing.assert_allclose(imf, item["images"].astype(np.float32) / 255.0)

    out = list(PrefetchLoader(ds, num_workers=3))
    assert [o["chunk_idx"] for o in out] == [0, 1, 2]  # strict order
    np.testing.assert_array_equal(out[0]["images"], ds[0]["images"])


def test_grid_keypoints_deterministic_and_bounded():
    kp1 = grid_keypoints(120, 160, max_num_keypoints=50)
    kp2 = grid_keypoints(120, 160, max_num_keypoints=50)
    np.testing.assert_array_equal(kp1, kp2)  # deterministic per size
    assert kp1.shape[0] <= 50
    margin = min(120, 160) * 0.05
    assert kp1[:, 0].min() >= margin and kp1[:, 0].max() < 160 - margin
    assert kp1[:, 1].min() >= margin and kp1[:, 1].max() < 120 - margin


def test_grid_spacing_clamps():
    assert grid_spacing(100, 100, max_num_keypoints=100000) == 8  # min clamp
    assert grid_spacing(400, 400, max_num_keypoints=4) == 100  # max clamp min/4


def test_keypoint_colors(rng):
    imgs = rng.uniform(size=(2, 3, 56, 70)).astype(np.float32)
    ex = GridKeypointExtractor(max_num_keypoints=20)
    out = ex.extract_with_colors(imgs)
    assert out["keypoints"].shape[0] == 2
    assert out["colors"].shape == out["keypoints"].shape[:2] + (3,)
    assert out["colors"].dtype == np.uint8


def _calib_json(model="PINHOLE_RADIAL_TANGENTIAL"):
    return {
        "image_height": 48,
        "image_width": 64,
        "intrinsic_type": model,
        "intrinsics": {
            "aspect_ratio": 1.0,
            "focal_length": 40.0,
            "principal_pt_x": 32.0,
            "principal_pt_y": 24.0,
            "radial_distortion_1": -0.28,
            "radial_distortion_2": 0.07,
            "radial_distortion_3": 0.0,
            "tangential_distortion_1": 0.0002,
            "tangential_distortion_2": 0.0,
            "div_undist_distortion": -1e-6,
            "skew": 0.0,
        },
    }


def test_undistorter_zero_distortion_is_identity(tmp_path, rng):
    data = _calib_json()
    for k in list(data["intrinsics"]):
        if "distortion" in k:
            data["intrinsics"][k] = 0.0
    cam = CalibratedCamera.from_json(data)
    und = Undistorter(cam)
    # identity mapping (aspect already 1)
    uu, vv = np.meshgrid(np.arange(64, dtype=np.float32), np.arange(48, dtype=np.float32))
    np.testing.assert_allclose(und.map_x, uu, atol=1e-4)
    np.testing.assert_allclose(und.map_y, vv, atol=1e-4)


def test_undistorter_from_file_and_remap(tmp_path, rng):
    p = str(tmp_path / "calib.json")
    with open(p, "w") as f:
        json.dump(_calib_json(), f)
    und = create_undistorter(p)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    out = und.undistort_image(img)
    assert out.shape == img.shape
    # radial distortion k1<0 (barrel): maps must differ from identity off-center
    assert np.abs(und.map_x[0, 0] - 0).max() > 0.5


def test_division_undistortion_roundtrip():
    data = _calib_json("DIVISION_UNDISTORTION")
    data["intrinsics"]["div_undist_distortion"] = -2e-4
    cam = CalibratedCamera.from_json(data)
    # distort then apply the division-undistortion formula -> original
    x = np.linspace(-0.5, 0.5, 11)
    y = np.linspace(-0.4, 0.4, 11)
    xd, yd = cam.distort(x, y)
    lam = -2e-4
    rd2 = xd * xd + yd * yd
    xu = xd / (1 + lam * rd2)
    yu = yd / (1 + lam * rd2)
    np.testing.assert_allclose(xu, x, atol=1e-6)
    np.testing.assert_allclose(yu, y, atol=1e-6)


def test_fisheye_distortion_matches_opencv(rng):
    import cv2

    data = _calib_json("FISHEYE")
    data["intrinsics"].update(
        radial_distortion_1=-0.01, radial_distortion_2=0.002,
        radial_distortion_3=0.0, radial_distortion_4=0.0,
    )
    cam = CalibratedCamera.from_json(data)
    pts = rng.uniform(-0.4, 0.4, size=(20, 2)).astype(np.float64)
    xd, yd = cam.distort(pts[:, 0], pts[:, 1])
    K = np.eye(3)
    D = np.array([-0.01, 0.002, 0.0, 0.0])
    ref = cv2.fisheye.distortPoints(pts.reshape(1, -1, 2), K, D).reshape(-1, 2)
    np.testing.assert_allclose(np.stack([xd, yd], axis=1), ref, atol=1e-8)


def test_frame_dataset_streams_in_order(tmp_path):
    """FrameDataset + PrefetchLoader = the reference's AsyncImageDataset:
    per-frame async loading with strict in-order delivery."""
    from PIL import Image

    from pi3_slam_tpu.data import FrameDataset, PrefetchLoader

    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        p = tmp_path / f"f_{i:03d}.png"
        Image.fromarray(np.full((20, 28, 3), i * 10, np.uint8)).save(p)
        paths.append(str(p))

    ds = FrameDataset(paths, target_size=(20, 28))
    assert len(ds) == 8
    items = list(PrefetchLoader(ds, num_workers=3))
    assert [it["frame_idx"] for it in items] == list(range(8))
    for i, it in enumerate(items):
        assert it["image"].shape == (3, 20, 28)
        # intensity encodes the frame index -> ordering is by content too
        assert abs(float(it["image"].mean()) * 255 - i * 10) < 2
