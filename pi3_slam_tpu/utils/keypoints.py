"""Grid keypoint extraction.

Mirrors GridKeypointExtractor (utils/keypoint_extraction.py:53-229): auto
spacing sqrt(effective_area / max_kp) clamped to [8, min(H,W)/4], 5% margins,
subsample to max_kp, colors by bilinear grid-sample. One deliberate
improvement: the subsample is seeded by (H, W), so every frame of every chunk
with the same resolution gets the *same* keypoint set — this makes cross-chunk
common-track matching by keypoint position exact (the reference's unseeded
randperm degrades overlap matching).

ALIKED (the reference's learned alternative) has no JAX implementation; the
eval protocol uses grid keypoints (scripts/eval_7scenes.sh:86-103), which is
what we ship. create_keypoint_extractor mirrors the reference factory with a
grid fallback.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops.interpolate import grid_sample_frames


def grid_spacing(H: int, W: int, max_num_keypoints: int, spacing: int | None = None) -> int:
    if spacing is not None:
        return spacing
    margin = min(H, W) * 0.05
    eff_h = H - 2 * margin
    eff_w = W - 2 * margin
    if eff_h <= 0 or eff_w <= 0:
        return max(H, W)
    s = int(np.sqrt((eff_h * eff_w) / max_num_keypoints))
    return max(8, min(s, min(H, W) // 4))


def grid_keypoints(
    H: int,
    W: int,
    max_num_keypoints: int = 1000,
    spacing: int | None = None,
) -> np.ndarray:
    """(K, 2) float32 (x, y) grid keypoint coordinates for an HxW image."""
    s = grid_spacing(H, W, max_num_keypoints, spacing)
    margin = min(H, W) * 0.05
    xs = np.arange(margin, W - margin, s)
    ys = np.arange(margin, H - margin, s)
    if len(xs) == 0 or len(ys) == 0:
        return np.array([[W // 2, H // 2]], dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    coords = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)
    if len(coords) > max_num_keypoints:
        rng = np.random.default_rng(H * 1_000_003 + W)  # deterministic per size
        idx = rng.permutation(len(coords))[:max_num_keypoints]
        coords = coords[np.sort(idx)]
    return coords


class GridKeypointExtractor:
    """Per-chunk grid keypoints + colors. Deterministic per image size."""

    def __init__(self, max_num_keypoints: int = 1000, spacing: int | None = None):
        self.max_num_keypoints = max_num_keypoints
        self.spacing = spacing

    def extract_with_colors(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """images: (N, 3, H, W) float [0,1] -> {'keypoints': (N,K,2),
        'colors': (N,K,3) uint8}."""
        N, _, H, W = images.shape
        kp = grid_keypoints(H, W, self.max_num_keypoints, self.spacing)
        kps = np.broadcast_to(kp[None], (N, kp.shape[0], 2)).copy()
        maps = jnp.asarray(images.transpose(0, 2, 3, 1))  # (N, H, W, 3)
        cols = np.asarray(grid_sample_frames(maps, jnp.asarray(kps), mode="bilinear"))
        colors = np.clip(cols * 255.0, 0, 255).astype(np.uint8)
        return {"keypoints": kps.astype(np.float32), "colors": colors}


def create_keypoint_extractor(kind: str = "grid", **kwargs) -> GridKeypointExtractor:
    """Factory mirroring utils/keypoint_extraction.py:394-420. 'aliked'
    requests fall back to grid (no JAX ALIKED; the eval default is grid)."""
    if kind not in ("grid", "aliked"):
        raise ValueError(f"unknown keypoint extractor: {kind}")
    kwargs.pop("device", None)
    return GridKeypointExtractor(**kwargs)
