"""Chunk-to-chunk Sim3 alignment with pose-prior-constrained refinement.

Replaces align_and_refine_reconstructions
(utils/reconstruction_alignment.py:40-198):

1. find tracks common to both chunks through their shared overlap frames —
   the reference matches "by feature" (identical keypoint coords in the
   same-named view); here overlap frames carry the same grid keypoints, so
   common tracks are keyed by (frame name, keypoint pixel position).
2. drop common points farther from the reference chunk's last camera than the
   median distance (:78-86).
3. Sim3 fit (Huber IRLS, width 1.0, 5 iterations — mirroring
   OptimizeAlignmentSim3's configuration at :89-97).
4. transform the query reconstruction.
5. pose-prior BA on the query chunk: overlap views pulled toward the
   reference poses with orientation cov 2*I / position cov 25*I
   (:110-132), 50 iterations Huber 3.0 (:137-159), then outlier pruning
   (3 px, 0.25 deg, :170).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ..geometry.sim3 import Sim3, robust_umeyama
from .ba import prune_outlier_tracks
from .reconstruction import ChunkReconstruction, _jit_bundle_adjust


@dataclasses.dataclass
class AlignmentResult:
    sim3: Sim3
    num_common_tracks: int
    num_used_tracks: int
    success: bool
    # "tracks" = common-track Sim3 (the reference's path); "poses" = the
    # shared-frame camera-pose fallback (sim3_from_camera_poses) used when
    # no common tracks survive — the reference has no fallback and leaves
    # the chunk unaligned in its own gauge
    method: str = "tracks"


def create_view_graph_matches(chunk_size: int, overlap: int) -> List[Tuple[int, int]]:
    """Frame-index pairs (prev_chunk_idx, cur_chunk_idx) for the overlap
    (utils/reconstruction_alignment.py:16-37)."""
    return [(chunk_size - overlap + i, i) for i in range(overlap)]


def mutual_nn_match(
    query_desc: np.ndarray, ref_desc: np.ndarray, min_cosine: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Mutual-nearest-neighbour cosine matching of L2-normalized descriptor
    sets. Returns (query_idx, ref_idx). The one matching core shared by
    cross-chunk track matching (here), loop detection (sfm/loops.py), and
    second-camera localization (sfm/localize.py)."""
    if query_desc.shape[0] == 0 or ref_desc.shape[0] == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    sim = query_desc @ ref_desc.T  # (Q, R) cosine
    best_r = sim.argmax(axis=1)
    best_q = sim.argmax(axis=0)
    rows = np.arange(query_desc.shape[0])
    ok = (best_q[best_r] == rows) & (sim[rows, best_r] >= min_cosine)
    return rows[ok], best_r[ok]


def subsample_live_tracks(recon: ChunkReconstruction, cap: int) -> np.ndarray:
    """Evenly-subsampled live-track indices (keeps spatial coverage — tracks
    are stored frame-major); shared by loop detection and map pooling."""
    live = np.nonzero(recon.track_valid > 0)[0]
    if live.size <= cap:
        return live
    return live[np.linspace(0, live.size - 1, cap).astype(np.int64)]


def match_tracks_by_descriptor(
    ref: ChunkReconstruction,
    query: ChunkReconstruction,
    frame_map: np.ndarray,
    min_cosine: float = 0.8,
    max_px: float = 8.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mutual-nearest-neighbour descriptor matching of tracks owned by shared
    frames (FindCommonTracksByFeatureInReconstructions,
    utils/reconstruction_alignment.py:74-76).

    For learned keypoints the same physical frame is re-detected in both
    chunks; sub-pixel soft-argmax coordinates need not be bitwise equal, so a
    position hash join can silently lose every match. Descriptors are
    L2-normalized (SDDH), so the dot product is cosine similarity; a mutual-NN
    match must also sit within ``max_px`` pixels (same image, same detector —
    large displacements are aliasing, not correspondence).
    """
    ref_by_frame: dict = {}
    ref_live = ref.track_valid > 0
    for t in np.nonzero(ref_live)[0]:
        ref_by_frame.setdefault(int(ref.track_frame[t]), []).append(t)

    ref_ids, q_ids = [], []
    for j in range(query.num_frames):
        i = int(frame_map[j])
        if i < 0 or i not in ref_by_frame:
            continue
        ri = np.asarray(ref_by_frame[i], np.int64)
        qi = np.nonzero((query.track_frame == j) & (query.track_valid > 0))[0]
        if ri.size == 0 or qi.size == 0:
            continue
        qm, rm = mutual_nn_match(query.track_desc[qi], ref.track_desc[ri], min_cosine)
        duv = np.linalg.norm(query.track_uv[qi[qm]] - ref.track_uv[ri[rm]], axis=-1)
        keep_px = duv <= max_px
        ref_ids.append(ri[rm[keep_px]])
        q_ids.append(qi[qm[keep_px]])
    if not ref_ids:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(ref_ids), np.concatenate(q_ids)


def find_common_tracks(
    ref: ChunkReconstruction,
    query: ChunkReconstruction,
    quantize_px: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Match tracks owned by shared (same-named) frames at the same keypoint
    position. Returns (ref_track_idx, query_track_idx) arrays.

    Dispatches to the native sfmcore hash join (cpp/sfmcore.cpp) with a
    numpy fallback. When both chunks carry descriptors (ALIKED), a mutual-NN
    descriptor match augments the position join — learned sub-pixel
    coordinates are not guaranteed bitwise-reproducible across chunks.
    """
    from .native import match_tracks

    name_to_ref_frame = {n: i for i, n in enumerate(ref.frame_names)}
    frame_map = np.full(query.num_frames, -1, np.int32)
    for j, n in enumerate(query.frame_names):
        frame_map[j] = name_to_ref_frame.get(n, -1)
    if (frame_map < 0).all():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ref_ids, q_ids = match_tracks(
        ref.track_frame,
        ref.track_uv,
        ref.track_valid,
        query.track_frame,
        query.track_uv,
        query.track_valid,
        frame_map,
        quantize=quantize_px,
    )
    if ref.track_desc is not None and query.track_desc is not None:
        rd, qd = match_tracks_by_descriptor(ref, query, frame_map)
        if rd.size:
            # union, position matches first; one match per query track
            taken = set(np.asarray(q_ids).tolist())
            fresh = np.array([q not in taken for q in qd], bool)
            ref_ids = np.concatenate([ref_ids, rd[fresh]])
            q_ids = np.concatenate([q_ids, qd[fresh]])
    return ref_ids, q_ids


def apply_sim3_to_reconstruction(recon: ChunkReconstruction, s: Sim3) -> None:
    """In-place TransformReconstruction4 equivalent: X' = sR X + t,
    c' = sR c + t, R_cw' = R_cw R^T (projection-invariant)."""
    R = np.asarray(s.rotation, np.float64)
    t = np.asarray(s.translation, np.float64)
    sc = float(s.scale)
    recon.points = (sc * recon.points.astype(np.float64) @ R.T + t).astype(np.float32)
    recon.centers = (sc * recon.centers.astype(np.float64) @ R.T + t).astype(np.float32)
    recon.rotations = (recon.rotations.astype(np.float64) @ R.T).astype(np.float32)


def align_chunks(
    ref: ChunkReconstruction,
    query: ChunkReconstruction,
    huber_delta_sim3: float = 1.0,
    sim3_iterations: int = 5,
    refine: bool = True,
    refine_iterations: int = 50,
    refine_huber: float = 3.0,
    orientation_prior_cov: float = 2.0,
    position_prior_cov: float = 25.0,
    prune_max_reproj_px: float = 3.0,
    prune_min_tri_angle_deg: float = 0.25,
    min_common_tracks: int = 4,
) -> AlignmentResult:
    """Align query chunk onto ref chunk in place."""
    from .device import sfm_compute

    ref_ids, q_ids = find_common_tracks(ref, query)
    n_common = ref_ids.size
    method = "tracks"
    if n_common < min_common_tracks:
        # fallback: Sim3 from the shared frames' camera poses (centers +
        # chordal rotation term — centers alone are collinear under forward
        # motion). Zero common tracks happens when confidence masking kills
        # the overlap keypoints; the poses still carry the alignment.
        name_to_ref = {nm: i for i, nm in enumerate(ref.frame_names)}
        shared = [
            (name_to_ref[nm], j)
            for j, nm in enumerate(query.frame_names)
            if nm in name_to_ref
        ]
        if len(shared) < 2:
            return AlignmentResult(
                sim3=Sim3(jnp.ones(()), jnp.eye(3), jnp.zeros(3)),
                num_common_tracks=int(n_common),
                num_used_tracks=0,
                success=False,
            )
        ri = np.array([i for i, _ in shared])
        qj = np.array([j for _, j in shared])
        from ..geometry.sim3 import sim3_from_camera_poses

        with sfm_compute():
            s = sim3_from_camera_poses(
                jnp.asarray(ref.rotations[ri]),
                jnp.asarray(ref.centers[ri]),
                jnp.asarray(query.rotations[qj]),
                jnp.asarray(query.centers[qj]),
            )
        apply_sim3_to_reconstruction(query, s)
        method = "poses"
    else:
        dst = ref.points[ref_ids].astype(np.float64)
        src = query.points[q_ids].astype(np.float64)

        # median-distance filter w.r.t. the reference chunk's last camera
        last_cam = ref.centers[-1].astype(np.float64)
        d = np.linalg.norm(dst - last_cam, axis=-1)
        keep = d <= np.median(d)
        if keep.sum() >= min_common_tracks:
            dst = dst[keep]
            src = src[keep]

        # pad the correspondence count up to a shape bucket (zero-weight
        # rows are exact no-ops: umeyama normalizes weights) — the common
        # track count varies every chunk pair, and an exact-shape call
        # would recompile the IRLS solve per chunk (~1.4 s each, measured;
        # it dominated the online alignment stage)
        n_pts = src.shape[0]
        bucket = max(256, 1 << (n_pts - 1).bit_length())
        pad = bucket - n_pts
        w = np.ones(bucket, np.float32)
        if pad:
            src = np.concatenate([src, np.zeros((pad, 3))])
            dst = np.concatenate([dst, np.zeros((pad, 3))])
            w[n_pts:] = 0.0

        with sfm_compute():
            s = robust_umeyama(
                jnp.asarray(src, jnp.float32),
                jnp.asarray(dst, jnp.float32),
                weights=jnp.asarray(w),
                huber_delta=huber_delta_sim3,
                iterations=sim3_iterations,
            )
        apply_sim3_to_reconstruction(query, s)

    if refine:
        # priors: overlap views of the query pulled toward ref's poses
        n = query.num_frames
        prior_R = query.rotations.copy()
        prior_c = query.centers.copy()
        rot_w = np.zeros(n, np.float32)
        pos_w = np.zeros(n, np.float32)
        name_to_ref = {nm: i for i, nm in enumerate(ref.frame_names)}
        for j, nm in enumerate(query.frame_names):
            i = name_to_ref.get(nm)
            if i is not None:
                prior_R[j] = ref.rotations[i]
                prior_c[j] = ref.centers[i]
                rot_w[j] = 1.0 / orientation_prior_cov
                pos_w[j] = 1.0 / position_prior_cov
        prob = query.to_problem(
            priors=dict(
                prior_rotations=prior_R,
                prior_centers=prior_c,
                prior_rot_weight=rot_w,
                prior_pos_weight=pos_w,
            )
        )
        kpf = query.num_tracks // query.num_frames if query.num_tracks % query.num_frames == 0 else None
        prob = _jit_bundle_adjust(
            prob, refine_iterations, refine_huber, tracks_per_frame=kpf
        )
        prob = prob._replace(
            track_valid=prune_outlier_tracks(prob, prune_max_reproj_px, prune_min_tri_angle_deg)
        )
        query.update_from_problem(prob)

    return AlignmentResult(
        sim3=s,
        num_common_tracks=int(n_common),
        num_used_tracks=int(n_pts) if method == "tracks" else 0,
        success=True,
        method=method,
    )
