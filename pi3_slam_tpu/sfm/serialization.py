"""Reconstruction serialization (.sfm-replacement) and debug rendering.

The reference persists per-chunk PyTheia reconstructions via
WriteReconstruction/.sfm + per-chunk PLY (slam/offline_reconstructor.py:80-91)
and renders reprojection-debug GIFs (utils/chunk_reconstruction.py:224-443).
Equivalents here: npz reconstruction containers and matplotlib reprojection
frames/GIF.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .reconstruction import ChunkReconstruction
from .ba import reprojection_errors


def save_reconstruction(recon: ChunkReconstruction, path: str) -> None:
    """Write a ChunkReconstruction to .npz (the .sfm replacement)."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(
        path,
        frame_names=np.asarray(recon.frame_names),
        rotations=recon.rotations,
        centers=recon.centers,
        intrinsics=recon.intrinsics,
        points=recon.points,
        colors=recon.colors,
        track_frame=recon.track_frame,
        track_kp=recon.track_kp,
        track_uv=recon.track_uv,
        track_valid=recon.track_valid,
        obs_frame=recon.obs_frame,
        obs_uv=recon.obs_uv,
        obs_valid=recon.obs_valid,
        image_width=recon.image_width,
        image_height=recon.image_height,
    )


def load_reconstruction(path: str) -> ChunkReconstruction:
    z = np.load(path, allow_pickle=False)
    return ChunkReconstruction(
        frame_names=[str(n) for n in z["frame_names"]],
        rotations=z["rotations"],
        centers=z["centers"],
        intrinsics=z["intrinsics"],
        points=z["points"],
        colors=z["colors"],
        track_frame=z["track_frame"],
        track_kp=z["track_kp"],
        track_uv=z["track_uv"],
        track_valid=z["track_valid"],
        obs_frame=z["obs_frame"],
        obs_uv=z["obs_uv"],
        obs_valid=z["obs_valid"],
        image_width=int(z["image_width"]),
        image_height=int(z["image_height"]),
    )


def render_debug_projections(
    recon: ChunkReconstruction,
    images: np.ndarray,  # (N, 3, H, W) float [0,1]
    out_path: str,
    max_tracks: int = 200,
    fps: int = 1,
) -> None:
    """Reprojection-debug rendering (reference debug_projections equivalent):
    each frame shows observed keypoints (green) vs current-model reprojections
    (red) with connecting error segments; saved as an animated GIF (or a PNG
    per frame if imageio is unavailable)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    err = np.asarray(reprojection_errors(recon.to_problem()))
    frames = []
    n = min(len(images), recon.num_frames)
    rng = np.random.default_rng(0)
    track_sel = np.nonzero(recon.track_valid > 0)[0]
    if track_sel.size > max_tracks:
        track_sel = rng.choice(track_sel, max_tracks, replace=False)
    sel_mask = np.zeros(recon.num_tracks, bool)
    sel_mask[track_sel] = True

    import io as _io

    from PIL import Image

    for f in range(n):
        fig, ax = plt.subplots(figsize=(6, 4.5), dpi=100)
        ax.imshow(np.clip(images[f].transpose(1, 2, 0), 0, 1))
        # observations of selected tracks in this frame
        rows, cols = np.nonzero(
            (recon.obs_frame == f) & (recon.obs_valid > 0) & sel_mask[:, None]
        )
        obs = recon.obs_uv[rows, cols]
        # reprojections
        R = recon.rotations[f]
        c = recon.centers[f]
        fx, fy, cx, cy = recon.intrinsics[f]
        X = recon.points[rows]
        xc = (X - c) @ R.T
        z = np.maximum(xc[:, 2], 1e-9)
        proj = np.stack([fx * xc[:, 0] / z + cx, fy * xc[:, 1] / z + cy], axis=1)
        ax.scatter(obs[:, 0], obs[:, 1], s=6, c="lime", label="observed")
        ax.scatter(proj[:, 0], proj[:, 1], s=6, c="red", label="reprojected")
        for o, p in zip(obs, proj):
            ax.plot([o[0], p[0]], [o[1], p[1]], c="yellow", lw=0.5, alpha=0.6)
        e = err[rows, cols]
        finite = np.isfinite(e)
        ax.set_title(
            f"frame {f} ({recon.frame_names[f]}) mean reproj "
            f"{e[finite].mean():.2f}px" if finite.any() else f"frame {f}"
        )
        ax.legend(loc="upper right", fontsize=7)
        ax.set_xlim(0, recon.image_width)
        ax.set_ylim(recon.image_height, 0)
        buf = _io.BytesIO()
        fig.savefig(buf, format="png")
        plt.close(fig)
        buf.seek(0)
        frames.append(Image.open(buf).convert("RGB"))

    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    if frames:
        frames[0].save(
            out_path,
            save_all=True,
            append_images=frames[1:],
            duration=int(1000 / max(fps, 1)),
            loop=0,
        )
