"""Video decoding path: persistent decoders, sequential bulk reads, O(1)
opens per thread (reference behavior: cached torchcodec decoders + bulk
get_frames_at, pi3/utils/basic.py:462-581)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pi3_slam_tpu.data import image_io


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    """Synthetic clip whose frame index is encoded in the pixel intensity."""
    d = tmp_path_factory.mktemp("vid")
    path = str(d / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
    assert w.isOpened()
    for i in range(120):
        frame = np.full((48, 64, 3), min(i * 2, 255), np.uint8)
        w.write(frame)
    w.release()
    return path


def _frame_value(img):
    """Recover the encoded index intensity (uint8 HWC or CHW float)."""
    if img.dtype == np.uint8:
        return float(img.mean())
    return float(img.mean() * 255.0)


def test_sequential_reads_one_open(video_path):
    image_io._thread_videos.cache = {}
    n0 = image_io.VIDEO_OPEN_COUNT["n"]
    vals = []
    for i in range(0, 60, 2):
        img = image_io.read_video_frame(video_path, i)
        vals.append(_frame_value(img))
    assert image_io.VIDEO_OPEN_COUNT["n"] - n0 == 1  # ONE decoder for 30 reads
    # frames decode in order: intensity must be monotonically increasing
    assert all(b > a for a, b in zip(vals, vals[1:]))
    # values match the encoding (MJPG is lossy; generous tolerance)
    for i, v in zip(range(0, 60, 2), vals):
        assert abs(v - i * 2) < 6, (i, v)


def test_bulk_reads_match_single_and_restore_order(video_path):
    image_io._thread_videos.cache = {}
    idx = [40, 10, 30, 20]
    bulk = image_io.load_video_frames_bulk(video_path, idx, target_hw=(48, 64))
    assert bulk.shape == (4, 3, 48, 64)
    for want, got in zip(idx, bulk):
        assert abs(_frame_value(got) - want * 2) < 6


def test_reader_cache_evicts_lru(video_path, tmp_path):
    """A cache miss at capacity must evict the least-recently-used decoder
    (regression: dict.popitem() evicted the newest entry, so the hot decoder
    was re-opened on every miss while stale ones stayed pinned forever)."""
    def make_clip(name):
        p = str(tmp_path / name)
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
        for i in range(4):
            w.write(np.full((48, 64, 3), 10 * i, np.uint8))
        w.release()
        return p

    cold = [make_clip(f"clip{j}.avi") for j in range(image_io._READER_CACHE_MAX - 1)]
    extra = make_clip("extra.avi")

    image_io._thread_videos.cache = {}
    for p in cold:
        image_io.read_video_frame(p, 0)
    image_io.read_video_frame(video_path, 0)  # hot; cache now at capacity
    n0 = image_io.VIDEO_OPEN_COUNT["n"]
    for i in range(1, 4):
        for p in cold:
            image_io.read_video_frame(p, i)
        image_io.read_video_frame(video_path, i)
    assert image_io.VIDEO_OPEN_COUNT["n"] == n0  # all hits, zero reopens
    image_io.read_video_frame(extra, 0)  # miss at capacity
    cache = image_io._thread_videos.cache
    assert video_path in cache and extra in cache  # hot + newcomer survive
    assert cold[0] not in cache  # the LRU entry was the one evicted


def test_metadata_probe_releases_decoder(video_path):
    """_first_image_dims / list_video_frames must not pin a persistent
    decoder on the calling thread."""
    image_io._thread_videos.cache = {}
    assert image_io._first_image_dims((video_path, 0)) == (64, 48)
    frames = image_io.list_video_frames(video_path, stride=10)
    assert len(frames) == 12
    assert getattr(image_io._thread_videos, "cache", {}) == {}


def test_chunk_loading_uses_bulk_path(video_path):
    image_io._thread_videos.cache = {}
    n0 = image_io.VIDEO_OPEN_COUNT["n"]
    paths = [(video_path, i) for i in range(20)]
    imgs = image_io.load_images(paths, (48, 64))
    assert imgs.shape == (20, 3, 48, 64)
    assert image_io.VIDEO_OPEN_COUNT["n"] - n0 == 1
    vals = [_frame_value(f) for f in imgs]
    assert all(b >= a for a, b in zip(vals, vals[1:]))


def test_backward_seek_still_correct(video_path):
    image_io._thread_videos.cache = {}
    a = _frame_value(image_io.read_video_frame(video_path, 50))
    b = _frame_value(image_io.read_video_frame(video_path, 5))  # backward jump
    assert abs(a - 100) < 6 and abs(b - 10) < 6


def test_video_dataset_end_to_end(video_path):
    """ChunkDataset over video tuples decodes whole chunks via one decoder per
    worker thread."""
    from pi3_slam_tpu.data import ChunkDataset, PrefetchLoader, calculate_target_size

    frames = image_io.list_video_frames(video_path, skip_start=0, skip_end=0, stride=2)
    assert len(frames) == 60
    target = calculate_target_size(frames[0], 2000)
    ds = ChunkDataset(frames, 10, 2, target)
    image_io._thread_videos.cache = {}
    n0 = image_io.VIDEO_OPEN_COUNT["n"]
    batches = list(PrefetchLoader(ds, num_workers=2))
    assert len(batches) == len(ds)
    # opens bounded by worker threads, not frames
    assert image_io.VIDEO_OPEN_COUNT["n"] - n0 <= 2
    for b in batches:
        assert b["images"].shape[1:] == (3, target[0], target[1])


def test_bulk_video_with_undistortion(tmp_path):
    """Undistortion-fused bulk video decode (the reference's
    VideoUndistortionLoader role, pi3/utils/undistortion.py:293-538)."""
    import json

    from pi3_slam_tpu.data.undistortion import create_undistorter

    calib = {
        "image_height": 48, "image_width": 64,
        "intrinsic_type": "PINHOLE_RADIAL_TANGENTIAL",
        "intrinsics": {
            "aspect_ratio": 1.0, "focal_length": 60.0,
            "principal_pt_x": 32.0, "principal_pt_y": 24.0,
            "radial_distortion_1": -0.2, "radial_distortion_2": 0.05,
            "radial_distortion_3": 0.0,
            "tangential_distortion_1": 0.0, "tangential_distortion_2": 0.0,
            "skew": 0.0,
        },
    }
    cpath = tmp_path / "calib.json"
    cpath.write_text(json.dumps(calib))
    und = create_undistorter(str(cpath))

    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
    for i in range(20):
        w.write(np.roll(base, i, axis=1))
    w.release()

    image_io._thread_videos.cache = {}
    n0 = image_io.VIDEO_OPEN_COUNT["n"]
    out = image_io.load_video_frames_bulk(
        path, list(range(10)), target_hw=(48, 64), undistorter=und, dtype="uint8"
    )
    assert out.shape == (10, 3, 48, 64) and out.dtype == np.uint8
    assert image_io.VIDEO_OPEN_COUNT["n"] - n0 == 1  # still one decoder
    # undistortion actually changed the pixels vs the raw decode
    raw = image_io.load_video_frames_bulk(path, [0], target_hw=(48, 64), dtype="uint8")
    assert not np.array_equal(out[0], raw[0])
