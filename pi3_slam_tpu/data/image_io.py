"""Image / video frame loading and sizing.

Mirrors utils/image_utils.py and pi3/utils/basic.py of the reference:
  * ``calculate_target_size`` — scale the first image under the pixel budget,
    snapped to multiples of 14 (utils/image_utils.py:13-50, exact algorithm).
  * images load as float32 (3, H, W) in [0, 1]; video frames via OpenCV
    (torchcodec isn't in this environment; the reference itself falls back to
    OpenCV — pi3/utils/basic.py:548-555).
"""

from __future__ import annotations

import math
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


def _first_image_dims(path) -> Tuple[int, int]:
    """(W, H) of an image path or (video_path, frame_idx) tuple."""
    if isinstance(path, tuple):
        video_path, _ = path
        cap = cv2.VideoCapture(str(video_path))
        try:
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        finally:
            cap.release()
        return w, h
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


def load_image(path, target_hw: Tuple[int, int] | None = None, undistorter=None) -> np.ndarray:
    """Load one image (or (video, frame) tuple) -> float32 (3, H, W) in [0,1]."""
    if isinstance(path, tuple):
        video_path, frame_idx = path
        cap = cv2.VideoCapture(str(video_path))
        try:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(frame_idx))
            ok, frame = cap.read()
        finally:
            cap.release()
        if not ok:
            raise IOError(f"failed to read frame {frame_idx} from {video_path}")
        img = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    else:
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
    if undistorter is not None:
        img = undistorter.undistort_image(img)
    if target_hw is not None:
        img = _resize(img, target_hw)
    return img.astype(np.float32).transpose(2, 0, 1) / 255.0


def load_images(
    paths: Sequence, target_hw: Tuple[int, int], undistorter=None
) -> np.ndarray:
    """Load a chunk of images -> float32 (N, 3, H, W)."""
    return np.stack([load_image(p, target_hw, undistorter) for p in paths])


def list_video_frames(video_path: str, skip_start: int = 0, skip_end: int = 0, stride: int = 1):
    """[(video_path, frame_idx), ...] like the online CLI's video mode
    (pi3_slam_online_modular.py:15-109)."""
    cap = cv2.VideoCapture(str(video_path))
    try:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()
    stop = n - skip_end
    return [(str(video_path), i) for i in range(skip_start, stop, stride)]
