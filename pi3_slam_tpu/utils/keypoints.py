"""Keypoint extraction: grid and ALIKED.

GridKeypointExtractor mirrors the reference grid extractor
(utils/keypoint_extraction.py:53-229): auto spacing
sqrt(effective_area / max_kp) clamped to [8, min(H,W)/4], 5% margins,
subsample to max_kp, colors by bilinear grid-sample. One deliberate
improvement: the subsample is seeded by (H, W), so every frame of every chunk
with the same resolution gets the *same* keypoint set — this makes cross-chunk
common-track matching by keypoint position exact (the reference's unseeded
randperm degrades overlap matching).

ALIKEDExtractor wraps the JAX ALIKED model (models/aliked.py), mirroring the
reference's lightglue-backed extractor (utils/keypoint_extraction.py:258-307)
given a converted checkpoint (tools/convert_checkpoint.py --model aliked).
The factory mirrors the reference's ALIKED -> grid degradation
(keypoint_extraction.py:408-410) when no weights are available — loudly, with
a printed warning, never silently.
"""

from __future__ import annotations

from typing import Dict

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
        """images: (N, 3, H, W) float [0,1] or uint8 -> {'keypoints': (N,K,2),
        'colors': (N,K,3) uint8}."""
        N, _, H, W = images.shape
        kp = grid_keypoints(H, W, self.max_num_keypoints, self.spacing)
        kps = np.broadcast_to(kp[None], (N, kp.shape[0], 2)).copy()
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        maps = jnp.asarray(images.transpose(0, 2, 3, 1))  # (N, H, W, 3)
        cols = np.asarray(grid_sample_frames(maps, jnp.asarray(kps), mode="bilinear"))
        colors = np.clip(cols * 255.0, 0, 255).astype(np.uint8)
        return {"keypoints": kps.astype(np.float32), "colors": colors}


class ALIKEDExtractor:
    """Learned keypoints + descriptors via the JAX ALIKED model.

    Mirrors the reference ALIKEDExtractor (utils/keypoint_extraction.py:
    258-307): extract() returns per-frame keypoints (pixel coords),
    descriptors, scores; extract_with_colors adds bilinear-sampled colors.
    """

    def __init__(
        self,
        checkpoint_path: str,
        max_num_keypoints: int = 1000,
        detection_threshold: float = 0.005,
        frame_batch: int = 8,
    ):
        import dataclasses

        from ..models.aliked import CONFIGS, aliked_extract
        from ..models.convert import load_params_npz

        self.params = load_params_npz(checkpoint_path)
        name = str(self.params.pop("_model_name", "aliked-n16"))
        cfg = CONFIGS.get(name, CONFIGS["aliked-n16"])
        self.cfg = dataclasses.replace(cfg, detection_threshold=detection_threshold)
        self.max_num_keypoints = max_num_keypoints
        # frames are independent; mini-batching bounds the full-resolution
        # multi-scale feature maps in HBM (a whole 100-frame chunk at the
        # eval resolution needs ~30 GB as one program — measured OOM on v5e)
        self.frame_batch = max(1, frame_batch)
        self._extract = aliked_extract

    def extract(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """images (N, 3, H, W) float [0,1] or uint8 -> {'keypoints': (N,K,2),
        'descriptors': (N,K,dim), 'scores': (N,K), 'valid': (N,K)}."""
        N = images.shape[0]
        fb = self.frame_batch
        chunks = []
        for start in range(0, N, fb):
            batch = images[start : start + fb]
            n_real = batch.shape[0]
            if n_real < fb:  # pad to the steady shape: one compile per size
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], fb - n_real, axis=0)]
                )
            out = self._extract(
                self.params, jnp.asarray(batch), self.cfg, self.max_num_keypoints
            )
            chunks.append({k: np.asarray(v)[:n_real] for k, v in out.items()})
        return {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}

    def extract_with_colors(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        out = self.extract(images)
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        maps = jnp.asarray(images.transpose(0, 2, 3, 1))
        cols = np.asarray(
            grid_sample_frames(maps, jnp.asarray(out["keypoints"]), mode="bilinear")
        )
        out["colors"] = np.clip(cols * 255.0, 0, 255).astype(np.uint8)
        return out


def create_keypoint_extractor(kind: str = "grid", **kwargs):
    """Factory mirroring utils/keypoint_extraction.py:394-420: 'grid' or
    'aliked'. ALIKED needs converted weights (aliked_checkpoint_path); when
    missing it degrades to grid with a printed warning — the reference
    degrades the same way when lightglue is unimportable (:408-410)."""
    if kind not in ("grid", "aliked"):
        raise ValueError(f"unknown keypoint extractor: {kind}")
    kwargs.pop("device", None)
    ckpt = kwargs.pop("aliked_checkpoint_path", None)
    threshold = kwargs.pop("detection_threshold", 0.005)
    if kind == "aliked":
        if ckpt:
            return ALIKEDExtractor(
                ckpt,
                max_num_keypoints=kwargs.get("max_num_keypoints", 1000),
                detection_threshold=threshold,
            )
        print(
            "ALIKED weights unavailable (pass --aliked-path with a converted "
            "checkpoint); falling back to grid keypoints"
        )
    return GridKeypointExtractor(**kwargs)
