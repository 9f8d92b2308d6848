"""Chunk reconstruction: build fixed-shape track/observation arrays from a
chunk's keypoints + Pi3 geometry, bundle-adjust, prune.

Replaces ChunkPTRecon.create_recon_from_chunk
(utils/chunk_reconstruction.py:36-222): every keypoint spawns a track holding
its Pi3 world point; observations are the keypoint in its own frame plus the
point's projection into earlier frames and the next max_obs//2 frames when in
bounds. The reference leaves the earlier-frame fan unbounded (its
``max_observations_per_track`` name notwithstanding); we honor the cap by
evenly subsampling earlier frames so the padded observation width M equals
max_observations_per_track — bounded memory for the Schur solve with the same
temporal spread.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .ba import BAProblem, bundle_adjust, make_problem, prune_outlier_tracks, reprojection_errors


@dataclasses.dataclass
class ChunkReconstruction:
    """Host-side reconstruction container (numpy), PyTheia-Reconstruction
    equivalent for one chunk."""

    frame_names: List[str]
    rotations: np.ndarray  # (N, 3, 3) world->camera
    centers: np.ndarray  # (N, 3) camera centers
    intrinsics: np.ndarray  # (N, 4) fx fy cx cy
    points: np.ndarray  # (T, 3) world track points
    colors: np.ndarray  # (T, 3) float [0,1]
    track_frame: np.ndarray  # (T,) owner frame index
    track_kp: np.ndarray  # (T,) keypoint index within owner frame
    track_uv: np.ndarray  # (T, 2) keypoint pixel coords in owner frame
    track_valid: np.ndarray  # (T,) float 1/0
    obs_frame: np.ndarray  # (T, M)
    obs_uv: np.ndarray  # (T, M, 2)
    obs_valid: np.ndarray  # (T, M)
    image_width: int
    image_height: int
    # (T, dim) L2-normalized keypoint descriptors (ALIKED); None for grid
    # keypoints. Enables feature-based cross-chunk track matching
    # (FindCommonTracksByFeatureInReconstructions,
    # utils/reconstruction_alignment.py:74-76).
    track_desc: np.ndarray | None = None

    @property
    def num_frames(self) -> int:
        return len(self.frame_names)

    @property
    def num_tracks(self) -> int:
        return self.points.shape[0]

    def camera_poses_c2w(self) -> np.ndarray:
        """(N, 4, 4) camera-to-world poses."""
        n = self.num_frames
        out = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        out[:, :3, :3] = np.transpose(self.rotations, (0, 2, 1))
        out[:, :3, 3] = self.centers
        return out

    def to_problem(self, priors: dict | None = None) -> BAProblem:
        kw = priors or {}
        return make_problem(
            self.rotations,
            self.centers,
            self.points,
            self.intrinsics,
            self.obs_frame,
            self.obs_uv,
            self.obs_valid,
            self.track_valid,
            **kw,
        )

    def update_from_problem(self, p: BAProblem) -> None:
        self.rotations = np.asarray(p.rotations)
        self.centers = np.asarray(p.centers)
        self.points = np.asarray(p.points)
        self.track_valid = np.asarray(p.track_valid)
        self.intrinsics = np.asarray(p.intrinsics)


def _intrinsics_to_fxfycxcy(K: np.ndarray) -> np.ndarray:
    """(N, 3, 3) -> (N, 4)."""
    return np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], axis=-1)


def _default_intrinsics(n: int, width: int, height: int) -> np.ndarray:
    """Reference default: f = max(W, H), pp at center
    (utils/chunk_reconstruction.py:99-109)."""
    f = float(max(width, height))
    return np.tile(np.array([f, f, width / 2.0, height / 2.0]), (n, 1))


def _candidate_frames(f: int, n: int, max_obs: int, unbounded: bool = False) -> np.ndarray:
    """Earlier frames + next max_obs//2.

    unbounded=False (default): earlier frames evenly subsampled to the
    max_obs budget — fixed observation width M for the batched solver.
    unbounded=True: ALL earlier frames, the reference's literal fan
    (utils/chunk_reconstruction.py:163-185 projects each track into every
    prior frame regardless of max_observations_per_track); M then grows to
    n-1 + max_obs//2 + 1. See tools/ablate_observation_fan.py for the
    measured APE/runtime comparison of the two.
    """
    after = list(range(f + 1, min(n, f + 1 + max_obs // 2)))
    before = list(range(f))
    if not unbounded:
        budget = max(0, max_obs - 1 - len(after))
        if len(before) > budget:
            idx = np.linspace(0, len(before) - 1, budget).round().astype(int)
            before = [before[i] for i in np.unique(idx)] if budget else []
    return np.array(before + after, dtype=np.int64)


def build_chunk_reconstruction(
    chunk: Dict,
    max_observations_per_track: int = 10,
    run_ba: bool = True,
    ba_iterations: int = 10,
    huber_delta: float = 2.0,
    prune_max_reproj_px: float = 2.0,
    prune_min_tri_angle_deg: float = 0.25,
    use_inverse_depth: bool = False,
    optimize_focal: bool = False,
    observation_fan: str = "subsampled",
) -> ChunkReconstruction:
    """Build (and optionally bundle-adjust) a reconstruction from chunk data.

    observation_fan: 'subsampled' (default; earlier frames evenly subsampled
    to max_observations_per_track) or 'unbounded' (the reference's literal
    all-earlier-frames fan — see _candidate_frames).

    chunk keys (numpy arrays): 'keypoints' (N,K,2), 'points' (N,K,3) world
    keypoint points, 'colors' (N,K,3), 'camera_poses' (N,4,4) cam-to-world,
    optional 'intrinsics' (N,3,3), 'image_paths', 'original_width/height',
    'keypoint_valid' (N,K) bool (ALIKED sub-threshold top-k slots are False
    and must not spawn live tracks), and 'descriptors' (N,K,dim).
    """
    kp = np.asarray(chunk["keypoints"], np.float64)
    pts = np.asarray(chunk["points"], np.float64)
    colors = np.asarray(chunk.get("colors", np.zeros_like(pts)), np.float64)
    poses = np.asarray(chunk["camera_poses"], np.float64)
    N, K = kp.shape[:2]
    width = int(chunk["original_width"])
    height = int(chunk["original_height"])

    names = []
    paths = chunk.get("image_paths")
    for i in range(N):
        if paths is not None:
            pth = paths[i]
            if isinstance(pth, np.ndarray):
                pth = pth.tolist()
            if isinstance(pth, (list, tuple)):
                # video frame (video_path, frame_idx): keep the index in the
                # name — it is the frame's identity (dedup across chunk
                # overlaps) and its timebase (idx / fps for telemetry)
                if len(pth) == 2:
                    names.append(f"{str(pth[0]).split('/')[-1]}#{pth[1]}")
                    continue
                pth = pth[0] if pth else f"frame_{i}"
            names.append(str(pth).split("/")[-1])
        else:
            names.append(f"frame_{i}")

    R_cw = np.transpose(poses[:, :3, :3], (0, 2, 1))
    centers = poses[:, :3, 3].copy()
    if "intrinsics" in chunk and chunk["intrinsics"] is not None:
        intr = _intrinsics_to_fxfycxcy(np.asarray(chunk["intrinsics"], np.float64))
        # the closed-form focal estimator can return negative/degenerate focal
        # on low-confidence pointmaps; fall back to the default prior per frame
        bad = (intr[:, 0] <= 1.0) | (intr[:, 1] <= 1.0) | ~np.isfinite(intr[:, :2]).all(1)
        if bad.any():
            intr[bad] = _default_intrinsics(int(bad.sum()), width, height)
    else:
        intr = _default_intrinsics(N, width, height)

    unbounded = observation_fan == "unbounded"
    M = max_observations_per_track
    if unbounded:
        # widest fan: the last frame sees all N-1 earlier frames (+ itself)
        M = max(M, N - 1 + max_observations_per_track // 2 + 1)
    T = N * K
    obs_frame = np.zeros((T, M), np.int32)
    obs_uv = np.zeros((T, M, 2), np.float64)
    obs_valid = np.zeros((T, M), np.float64)

    track_frame = np.repeat(np.arange(N), K)
    track_kp = np.tile(np.arange(K), N)
    track_uv = kp.reshape(T, 2)
    points_flat = pts.reshape(T, 3)

    # ALIKED validity: sub-threshold top-k filler slots sit at identical
    # coordinates in every frame and would hash-join into spurious
    # cross-frame tracks; they enter as dead tracks (zero BA weight,
    # excluded from matching)
    kp_valid = chunk.get("keypoint_valid")
    track_valid = (
        np.asarray(kp_valid, bool).reshape(T).astype(np.float32)
        if kp_valid is not None
        else np.ones(T, np.float32)
    )
    desc = chunk.get("descriptors")
    track_desc = (
        np.ascontiguousarray(np.asarray(desc, np.float32).reshape(T, -1))
        if desc is not None
        else None
    )

    stored_obs = chunk.get("obs_frame")
    if stored_obs is not None:
        # correlation-refined observations persisted by the chunk creator
        # (--refine-observations, ops/correlation.py): use the photometric
        # measurements instead of re-projecting the model geometry. The
        # stored fan width supersedes max_observations_per_track.
        M = np.asarray(stored_obs).shape[-1]
        # np.array (copy): device-backed buffers arrive as read-only views
        obs_frame = np.array(stored_obs, np.int32).reshape(T, M)
        obs_uv = np.array(chunk["obs_uv"], np.float64).reshape(T, M, 2)
        obs_valid = np.array(chunk["obs_valid"], np.float64).reshape(T, M)
        # slot 0 refreshed from the track arrays (authoritative detection)
        obs_frame[:, 0] = track_frame
        obs_uv[:, 0] = track_uv
        obs_valid[:, 0] = 1.0
        obs_valid *= track_valid[:, None]
        return _assemble_reconstruction(
            names, R_cw, centers, intr, points_flat, colors, track_frame,
            track_kp, track_uv, track_valid, obs_frame, obs_uv, obs_valid,
            width, height, track_desc, run_ba, ba_iterations, huber_delta,
            prune_max_reproj_px, prune_min_tri_angle_deg, use_inverse_depth,
            optimize_focal,
        )

    # slot 0: the detected keypoint in its own frame
    obs_frame[:, 0] = track_frame
    obs_uv[:, 0] = track_uv
    obs_valid[:, 0] = track_valid

    cand_table = np.full((N, M - 1), -1, np.int32)
    for f in range(N):
        cand = _candidate_frames(f, N, max_observations_per_track, unbounded)
        cand_table[f, : cand.size] = cand

    from .native import build_observations as native_build_observations

    obs_uv32 = np.ascontiguousarray(obs_uv, np.float32)
    obs_valid32 = np.ascontiguousarray(obs_valid, np.float32)
    used_native = native_build_observations(
        pts.reshape(T, 3), R_cw, centers, intr, cand_table, K,
        width, height, obs_frame, obs_uv32, obs_valid32,
    )
    if used_native:
        obs_uv = obs_uv32.astype(np.float64)
        obs_valid = obs_valid32.astype(np.float64)
        obs_valid[:, 0] = track_valid
    else:
        for f in range(N):
            cand = cand_table[f][cand_table[f] >= 0]
            if cand.size == 0:
                continue
            X = pts[f]  # (K, 3) world points of this frame's tracks
            # project into all candidate frames at once: (C, K, 3)
            xc = np.einsum("cij,ckj->cki", R_cw[cand], X[None] - centers[cand][:, None])
            z = xc[..., 2]
            z_safe = np.where(np.abs(z) < 1e-12, 1e-12, z)
            u = intr[cand, 0][:, None] * xc[..., 0] / z_safe + intr[cand, 2][:, None]
            v = intr[cand, 1][:, None] * xc[..., 1] / z_safe + intr[cand, 3][:, None]
            inb = (z > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
            rows = slice(f * K, (f + 1) * K)
            c = cand.size
            obs_frame[rows, 1 : 1 + c] = cand[None, :]
            obs_uv[rows, 1 : 1 + c, 0] = u.T
            obs_uv[rows, 1 : 1 + c, 1] = v.T
            obs_valid[rows, 1 : 1 + c] = inb.T.astype(np.float64)

    # dead tracks contribute no observations anywhere
    obs_valid *= track_valid[:, None]

    return _assemble_reconstruction(
        names, R_cw, centers, intr, points_flat, colors, track_frame, track_kp,
        track_uv, track_valid, obs_frame, obs_uv, obs_valid, width, height,
        track_desc, run_ba, ba_iterations, huber_delta, prune_max_reproj_px,
        prune_min_tri_angle_deg, use_inverse_depth, optimize_focal,
    )


def _assemble_reconstruction(
    names, R_cw, centers, intr, points_flat, colors, track_frame, track_kp,
    track_uv, track_valid, obs_frame, obs_uv, obs_valid, width, height,
    track_desc, run_ba, ba_iterations, huber_delta, prune_max_reproj_px,
    prune_min_tri_angle_deg, use_inverse_depth, optimize_focal,
) -> ChunkReconstruction:
    T = points_flat.shape[0]
    N = len(names)
    K = T // max(N, 1)
    recon = ChunkReconstruction(
        frame_names=names,
        rotations=R_cw.astype(np.float32),
        centers=centers.astype(np.float32),
        intrinsics=intr.astype(np.float32),
        points=points_flat.astype(np.float32),
        colors=colors.reshape(T, 3).astype(np.float32),
        track_frame=track_frame.astype(np.int32),
        track_kp=track_kp.astype(np.int32),
        track_uv=track_uv.astype(np.float32),
        track_valid=track_valid,
        obs_frame=np.asarray(obs_frame, np.int32),
        obs_uv=obs_uv.astype(np.float32),
        obs_valid=obs_valid.astype(np.float32),
        image_width=width,
        image_height=height,
        track_desc=track_desc,
    )

    if run_ba:
        prob = recon.to_problem()
        prob = _jit_bundle_adjust(
            prob, ba_iterations, huber_delta,
            optimize_focal=optimize_focal, use_inverse_depth=use_inverse_depth,
            tracks_per_frame=K,
        )
        new_valid = prune_outlier_tracks(prob, prune_max_reproj_px, prune_min_tri_angle_deg)
        prob = prob._replace(track_valid=new_valid)
        recon.update_from_problem(prob)
    return recon


_BA_CACHE: dict = {}
# iteration count / final cost of the most recent _jit_bundle_adjust solve.
# Thread-LOCAL (the async pipeline runs build(k+1)'s chunk BA and finish(k)'s
# align-refine BA concurrently in different threads; a module global would
# report one solve's numbers as the other's). Held as device scalars —
# materializing eagerly would insert a blocking sync on the hot BA path —
# and materialized lazily, guarded against handles from a recovered (dead)
# backend. Observable for "does the ftol early stop actually fire at eval
# scale" — VERDICT r4 item 2.
_BA_INFO_TLS = __import__("threading").local()


def last_ba_info() -> dict | None:
    """{'iterations': int, 'final_cost': float} of the most recent BA solve
    dispatched FROM THIS THREAD, or None (no solve yet, or its backend was
    torn down by crash recovery). iterations < the configured maximum means
    the ftol (function_tolerance) early stop fired."""
    info = getattr(_BA_INFO_TLS, "info", None)
    if info is None:
        return None
    try:
        return {
            "iterations": int(info["iterations"]),
            "final_cost": float(info["final_cost"]),
        }
    except Exception:  # device handles died with a recovered backend
        return None


def _jit_bundle_adjust(
    prob: BAProblem,
    iterations: int,
    huber_delta: float,
    optimize_focal: bool = False,
    use_inverse_depth: bool = False,
    tracks_per_frame: int | None = None,
    ftol: float = 1e-6,
) -> BAProblem:
    """Dispatch to a cached jitted BA for the solver configuration.

    ftol defaults to Ceres' function_tolerance (1e-6): ``iterations`` acts as
    max_num_iterations, matching the reference solver options
    (utils/chunk_reconstruction.py:192-209, reconstruction_alignment.py:137-159)
    — converged solves return early instead of burning the full budget."""
    key = (
        iterations, float(huber_delta), optimize_focal, use_inverse_depth,
        tracks_per_frame, float(ftol),
    )
    if key not in _BA_CACHE:
        _BA_CACHE[key] = jax.jit(
            lambda p: bundle_adjust(
                p,
                iterations=iterations,
                huber_delta=huber_delta,
                optimize_focal=optimize_focal,
                use_inverse_depth=use_inverse_depth,
                tracks_per_frame=tracks_per_frame,
                ftol=ftol,
                return_info=True,
            )
        )
    from .device import sfm_compute

    with sfm_compute():
        out, info = _BA_CACHE[key](prob)
        _BA_INFO_TLS.info = info  # device scalars; materialized by last_ba_info
        return out


def reconstruction_stats(recon: ChunkReconstruction) -> Dict:
    """Summary stats mirroring print_reconstruction_stats
    (utils/chunk_reconstruction.py:511-542)."""
    prob = recon.to_problem()
    err = np.asarray(reprojection_errors(prob))
    finite = np.isfinite(err)
    return {
        "num_views": recon.num_frames,
        "num_tracks": int(recon.track_valid.sum()),
        "num_observations": int(finite.sum()),
        "mean_reprojection_error": float(err[finite].mean()) if finite.any() else float("nan"),
        "median_reprojection_error": float(np.median(err[finite])) if finite.any() else float("nan"),
    }
