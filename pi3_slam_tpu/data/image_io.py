"""Image / video frame loading and sizing.

Mirrors utils/image_utils.py and pi3/utils/basic.py of the reference:
  * ``calculate_target_size`` — scale the first image under the pixel budget,
    snapped to multiples of 14 (utils/image_utils.py:13-50, exact algorithm).
  * images load as float32 (3, H, W) in [0, 1]; video frames via OpenCV
    (torchcodec isn't in this environment; the reference itself falls back to
    OpenCV — pi3/utils/basic.py:548-555).
  * video decoding uses PERSISTENT per-thread decoders with sequential reads
    (grab-ahead for small gaps, seek only for jumps) — the OpenCV equivalent
    of the reference's cached torchcodec decoders + bulk get_frames_at
    (pi3/utils/basic.py:462-581, pi3/utils/undistortion.py:293-538). Opening
    a decoder per frame costs more than decoding it; a 500-frame clip is now
    O(num_threads) opens instead of O(frames).
"""

from __future__ import annotations

import math
import threading
from typing import Sequence, Tuple

import numpy as np

try:
    import cv2

    # disable OpenCV's internal thread pool: the prefetch loader already
    # parallelizes across files, and cv2's own threads running concurrently
    # with TPU-runtime calls correlate with sporadic backend crashes here
    cv2.setNumThreads(0)
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image


def _probe_video(video_path: str, *props) -> list:
    """Read metadata properties via a transient decoder (released
    immediately — metadata probes must not pin a persistent reader on the
    calling thread, which is usually not a loader worker)."""
    cap = cv2.VideoCapture(str(video_path))
    try:
        if not cap.isOpened():
            raise IOError(f"failed to open video {video_path}")
        return [cap.get(p) for p in props]
    finally:
        cap.release()


def _first_image_dims(path) -> Tuple[int, int]:
    """(W, H) of an image path or (video_path, frame_idx) tuple."""
    if isinstance(path, tuple):
        video_path, _ = path
        w, h = _probe_video(
            video_path, cv2.CAP_PROP_FRAME_WIDTH, cv2.CAP_PROP_FRAME_HEIGHT
        )
        return (int(w), int(h))
    with Image.open(path) as im:
        return im.size


def calculate_target_size(first_image_path, pixel_limit: int = 255000) -> Tuple[int, int]:
    """(H, W) target size: scaled under pixel_limit, multiples of 14."""
    W_orig, H_orig = _first_image_dims(first_image_path)
    scale = math.sqrt(pixel_limit / (W_orig * H_orig)) if W_orig * H_orig > 0 else 1
    W_target, H_target = W_orig * scale, H_orig * scale
    k, m = round(W_target / 14), round(H_target / 14)
    while (k * 14) * (m * 14) > pixel_limit:
        if k / m > W_target / H_target:
            k -= 1
        else:
            m -= 1
    return (max(1, m) * 14, max(1, k) * 14)


def _resize(img: np.ndarray, target_hw: Tuple[int, int]) -> np.ndarray:
    """Resize HWC uint8/float image. INTER_AREA when downscaling (antialiased,
    matching torchvision's antialias=True default closely), else linear."""
    h, w = img.shape[:2]
    th, tw = target_hw
    if (h, w) == (th, tw):
        return img
    if _HAS_CV2:
        interp = cv2.INTER_AREA if (th < h or tw < w) else cv2.INTER_LINEAR
        return cv2.resize(img, (tw, th), interpolation=interp)
    return np.asarray(Image.fromarray(img).resize((tw, th), Image.BILINEAR))


# --- persistent video decoders -------------------------------------------

# test/diagnostic hook: counts VideoCapture constructions
VIDEO_OPEN_COUNT = {"n": 0}

# a forward gap this small is cheaper to grab() through than to seek
# (cv2 seeks restart decode from the previous keyframe)
_GRAB_AHEAD_MAX = 64
_READER_CACHE_MAX = 4  # open decoders kept per thread


class _VideoReader:
    """One persistent cv2.VideoCapture with sequential-read optimization."""

    def __init__(self, path: str):
        VIDEO_OPEN_COUNT["n"] += 1
        self.path = path
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"failed to open video {path}")
        self.next_idx = 0

    def read(self, frame_idx: int) -> np.ndarray:
        """Decode frame_idx -> RGB uint8 (H, W, 3)."""
        gap = frame_idx - self.next_idx
        if 0 < gap <= _GRAB_AHEAD_MAX:
            for _ in range(gap):
                self.cap.grab()
        elif gap != 0:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, int(frame_idx))
        ok, frame = self.cap.read()
        if not ok:
            # one retry through an explicit seek (some containers mis-report
            # POS after long grab runs)
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, int(frame_idx))
            ok, frame = self.cap.read()
        if not ok:
            raise IOError(f"failed to read frame {frame_idx} from {self.path}")
        self.next_idx = frame_idx + 1
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def close(self):
        self.cap.release()


_thread_videos = threading.local()


def _video_reader(path: str) -> _VideoReader:
    """Per-thread persistent reader (cv2.VideoCapture is not thread-safe, so
    each loader worker owns its own decoder; opens are O(threads))."""
    cache = getattr(_thread_videos, "cache", None)
    if cache is None:
        cache = _thread_videos.cache = {}
    reader = cache.get(path)
    if reader is None:
        if len(cache) >= _READER_CACHE_MAX:
            # evict least-recently-used (dict insertion order = recency, since
            # hits below re-insert); popitem() would evict the newest
            old = cache.pop(next(iter(cache)))
            old.close()
        cache[path] = reader = _VideoReader(path)
    else:
        # move-to-end marks this reader most-recently-used
        cache.pop(path)
        cache[path] = reader
    return reader


def read_video_frame(video_path: str, frame_idx: int) -> np.ndarray:
    """RGB uint8 frame via the persistent per-thread decoder."""
    return _video_reader(str(video_path)).read(int(frame_idx))


def load_video_frames_bulk(
    video_path: str,
    frame_indices: Sequence[int],
    target_hw: Tuple[int, int] | None = None,
    undistorter=None,
    dtype="float32",
) -> np.ndarray:
    """Bulk-decode frames in one sequential pass -> float32 (N, 3, H, W).

    The torchcodec get_frames_at analog (pi3/utils/basic.py:462-581): indices
    are visited in sorted order on one decoder, then reordered to the
    requested order. Undistortion is fused per frame before the resize, like
    the reference's VideoUndistortionLoader (pi3/utils/undistortion.py:293+).
    """
    order = np.argsort(np.asarray(frame_indices, np.int64), kind="stable")
    reader = _video_reader(str(video_path))
    out = [None] * len(frame_indices)
    for i in order:
        img = reader.read(int(frame_indices[i]))
        if undistorter is not None:
            img = undistorter.undistort_image(img)
        if target_hw is not None:
            img = _resize(img, target_hw)
        if dtype == "uint8":
            out[i] = np.ascontiguousarray(img.transpose(2, 0, 1))
        else:
            out[i] = img.astype(np.float32).transpose(2, 0, 1) / 255.0
    return np.stack(out)


def load_image(
    path, target_hw: Tuple[int, int] | None = None, undistorter=None, dtype="float32"
) -> np.ndarray:
    """Load one image (or (video, frame) tuple) -> (3, H, W).

    dtype 'float32': values in [0,1]. dtype 'uint8': raw bytes — the TPU
    pipeline ships uint8 to the device and normalizes inside the jitted step
    (4x less host->device traffic; the remote-TPU tunnel here moves
    ~30 MB/s, so a 100-frame float32 chunk costs ~5 s of pure upload)."""
    if isinstance(path, tuple):
        video_path, frame_idx = path
        img = read_video_frame(video_path, frame_idx)
    else:
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
    if undistorter is not None:
        img = undistorter.undistort_image(img)
    if target_hw is not None:
        img = _resize(img, target_hw)
    if dtype == "uint8":
        return np.ascontiguousarray(img.transpose(2, 0, 1))
    return img.astype(np.float32).transpose(2, 0, 1) / 255.0


def load_images(
    paths: Sequence, target_hw: Tuple[int, int], undistorter=None, dtype="float32"
) -> np.ndarray:
    """Load a chunk of images -> (N, 3, H, W) float32 [0,1] or uint8. A chunk
    of frames from one video routes through the bulk sequential decoder."""
    if (
        len(paths) > 1
        and all(isinstance(p, tuple) for p in paths)
        and len({p[0] for p in paths}) == 1
    ):
        return load_video_frames_bulk(
            paths[0][0], [p[1] for p in paths], target_hw, undistorter, dtype=dtype
        )
    return np.stack([load_image(p, target_hw, undistorter, dtype=dtype) for p in paths])


def list_video_frames(video_path: str, skip_start: int = 0, skip_end: int = 0, stride: int = 1):
    """[(video_path, frame_idx), ...] like the online CLI's video mode
    (pi3_slam_online_modular.py:15-109)."""
    n = int(_probe_video(video_path, cv2.CAP_PROP_FRAME_COUNT)[0])
    stop = n - skip_end
    return [(str(video_path), i) for i in range(skip_start, stop, stride)]
