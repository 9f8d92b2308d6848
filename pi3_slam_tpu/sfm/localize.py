"""Localization of another camera against an existing reconstruction.

Implements the reference's roadmap item "Add localization and reconstruction
of another camera" (/root/reference/README.md TODO), which it never built.
Two modes, both driven by ``localize_camera.py``:

- **Image localization (PnP).** A query image's keypoints+descriptors are
  matched (mutual-NN cosine) against the map's track descriptors; the pose
  is solved by RANSAC over vmapped DLT minimal solves followed by a
  Huber-IRLS Gauss-Newton refinement — one fixed-shape jitted program
  (static correspondence capacity, all hypotheses solved as one batched SVD
  on the MXU), the TPU-native counterpart of OpenCV solvePnPRansac + Ceres.
- **Chunk registration (Sim3).** A second camera's Pi3 chunks are registered
  onto the map by 3D-3D descriptor matching + trimmed robust Umeyama —
  reconstruction of the second camera in the map frame.

Pose conventions match sfm/ba.py: rotations are world->camera, centers are
camera centers in world, uv = K pi(R (X - c)), intrinsics (fx, fy, cx, cy).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.sim3 import Sim3, robust_umeyama, sim3_apply
from ..geometry.transforms import so3_exp
from ..utils.precision import f32_matmul
from .reconstruction import ChunkReconstruction


class PnPResult(NamedTuple):
    rotation: jnp.ndarray  # (3, 3) world->camera
    center: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # ()
    inlier_rms_px: jnp.ndarray  # ()


def _project(rot, center, intr, X):
    x_cam = jnp.einsum("ij,...j->...i", rot, X - center)
    z = x_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = intr[0] * x_cam[..., 0] / z_safe + intr[2]
    v = intr[1] * x_cam[..., 1] / z_safe + intr[3]
    return jnp.stack([u, v], axis=-1), z


def dlt_pose(X: jnp.ndarray, xn: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct linear transform pose from >= 6 correspondences.

    X: (M, 3) world points; xn: (M, 2) normalized image coords (K^-1 pixels).
    Returns (R world->camera, camera center). Sign is resolved by cheirality
    (majority positive projective depth), scale by the polar decomposition of
    the rotation block. Degenerate samples yield a garbage pose that simply
    scores zero inliers in RANSAC — no branching needed.
    """
    m = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((m, 1), X.dtype)], axis=-1)  # (M, 4)
    zeros = jnp.zeros_like(Xh)
    # rows: [X 0 -xn*X ; 0 X -yn*X]
    r1 = jnp.concatenate([Xh, zeros, -xn[:, :1] * Xh], axis=-1)
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=-1)
    a = jnp.concatenate([r1, r2], axis=0)  # (2M, 12)
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    p = vt[-1].reshape(3, 4)
    # cheirality: majority of projective depths positive
    w = Xh @ p[2]
    p = p * jnp.where(jnp.sum(jnp.sign(w)) < 0, -1.0, 1.0)
    r0 = p[:, :3]
    u, s, vt2 = jnp.linalg.svd(r0)
    det = jnp.linalg.det(u @ vt2)
    R = u @ jnp.diag(jnp.stack([jnp.ones(()), jnp.ones(()), det])) @ vt2
    alpha = jnp.mean(s)
    t = p[:, 3] / jnp.maximum(alpha, 1e-12)
    center = -R.T @ t
    return R, center


@f32_matmul
def ransac_pnp(
    points: jnp.ndarray,
    uv: jnp.ndarray,
    intrinsics: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    *,
    num_samples: int = 256,
    sample_size: int = 8,
    inlier_px: float = 5.0,
    refine_iterations: int = 10,
    huber_px: float = 2.0,
) -> PnPResult:
    """Robust PnP: batched DLT hypotheses + inlier vote + Huber-GN refine.

    points (N, 3), uv (N, 2) pixel observations, intrinsics (fx, fy, cx, cy),
    valid (N,) mask over padded correspondences. Fully jittable with static
    N: all ``num_samples`` minimal solves run as ONE batched SVD, scoring is
    one (S, N) reprojection broadcast, refinement linearizes by forward-mode
    autodiff on the 6-dof tangent (so3 left-increment + center offset).
    """
    n = points.shape[0]
    valid_f = jnp.asarray(valid, jnp.float32)
    p_sel = valid_f / jnp.maximum(valid_f.sum(), 1e-9)

    keys = jax.random.split(key, num_samples)

    def draw(k):
        return jax.random.choice(k, n, (sample_size,), replace=False, p=p_sel)

    idx = jax.vmap(draw)(keys)  # (S, m)
    xn = jnp.stack(
        [
            (uv[:, 0] - intrinsics[2]) / intrinsics[0],
            (uv[:, 1] - intrinsics[3]) / intrinsics[1],
        ],
        axis=-1,
    )
    Rs, cs = jax.vmap(dlt_pose)(points[idx], xn[idx])  # (S,3,3), (S,3)

    def score(R, c):
        uv_hat, z = _project(R, c, intrinsics, points)
        err = jnp.linalg.norm(uv_hat - uv, axis=-1)
        inl = (err < inlier_px) & (z > 0) & (valid_f > 0)
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(score)(Rs, cs)  # (S,), (S, N)
    best = jnp.argmax(counts)
    R0, c0, inliers = Rs[best], cs[best], inls[best]
    w_in = inliers.astype(jnp.float32)

    def residuals(params, R_base, c_base):
        R = so3_exp(params[:3]) @ R_base
        c = c_base + params[3:]
        uv_hat, _ = _project(R, c, intrinsics, points)
        return (uv_hat - uv).reshape(-1)  # (2N,)

    def gn_step(carry, _):
        R, c = carry
        r = residuals(jnp.zeros(6, jnp.float32), R, c)
        rn = jnp.linalg.norm(r.reshape(-1, 2), axis=-1)
        w_h = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
        w = jnp.repeat(w_in * w_h, 2)
        jac = jax.jacfwd(residuals)(jnp.zeros(6, jnp.float32), R, c)  # (2N, 6)
        jtw = jac.T * w[None, :]
        h = jtw @ jac + 1e-6 * jnp.eye(6)
        delta = -jnp.linalg.solve(h, jtw @ r)
        return (so3_exp(delta[:3]) @ R, c + delta[3:]), None

    (R1, c1), _ = jax.lax.scan(gn_step, (R0, c0), None, length=refine_iterations)

    n_fin, inl_fin = score(R1, c1)
    uv_hat, _ = _project(R1, c1, intrinsics, points)
    err2 = jnp.sum((uv_hat - uv) ** 2, axis=-1)
    rms = jnp.sqrt(
        jnp.sum(jnp.where(inl_fin, err2, 0.0)) / jnp.maximum(n_fin, 1)
    )
    return PnPResult(
        rotation=R1, center=c1, inliers=inl_fin, num_inliers=n_fin, inlier_rms_px=rms
    )


_ransac_pnp_jit = jax.jit(
    ransac_pnp,
    static_argnames=("num_samples", "sample_size", "refine_iterations"),
)


@f32_matmul
def triangulate_points(
    rotations: jnp.ndarray,
    centers: jnp.ndarray,
    intrinsics: jnp.ndarray,
    obs_uv: jnp.ndarray,
    obs_valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-view DLT triangulation, all tracks as one batched SVD.

    rotations (V, 3, 3) world->camera, centers (V, 3), intrinsics
    (fx, fy, cx, cy); obs_uv (T, V, 2) pixel observations with validity mask
    obs_valid (T, V) (invalid rows are zero-weighted). Returns (points (T, 3),
    reprojection rms px (T,), positive-depth view counts (T,)).
    """
    v = rotations.shape[0]
    t = jnp.asarray(-jnp.einsum("vij,vj->vi", rotations, centers))  # (V, 3)
    p_mat = jnp.concatenate([rotations, t[..., None]], axis=-1)  # (V, 3, 4) normalized

    xn = jnp.stack(
        [
            (obs_uv[..., 0] - intrinsics[2]) / intrinsics[0],
            (obs_uv[..., 1] - intrinsics[3]) / intrinsics[1],
        ],
        axis=-1,
    )  # (T, V, 2)
    w = jnp.asarray(obs_valid, jnp.float32)[..., None]  # (T, V, 1)
    r1 = xn[..., 0:1] * p_mat[None, :, 2, :] - p_mat[None, :, 0, :]
    r2 = xn[..., 1:2] * p_mat[None, :, 2, :] - p_mat[None, :, 1, :]
    a = jnp.concatenate([r1 * w, r2 * w], axis=1)  # (T, 2V, 4)
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    xh = vt[:, -1, :]  # (T, 4)
    denom = jnp.where(jnp.abs(xh[:, 3:4]) < 1e-9, 1e-9, xh[:, 3:4])
    pts = xh[:, :3] / denom

    # quality: reprojection error + cheirality per view
    x_cam = jnp.einsum("vij,tvj->tvi", rotations, pts[:, None, :] - centers[None])
    z = x_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = intrinsics[0] * x_cam[..., 0] / zs + intrinsics[2]
    vv = intrinsics[1] * x_cam[..., 1] / zs + intrinsics[3]
    err2 = (u - obs_uv[..., 0]) ** 2 + (vv - obs_uv[..., 1]) ** 2
    wv = jnp.asarray(obs_valid, jnp.float32)
    n_obs = jnp.maximum(wv.sum(axis=1), 1.0)
    rms = jnp.sqrt(jnp.sum(jnp.where(wv > 0, err2, 0.0), axis=1) / n_obs)
    n_front = jnp.sum((z > 0) & (wv > 0), axis=1)
    return pts, rms, n_front


def build_query_tracks(
    detections: List[dict], min_cosine: float = 0.85
) -> Tuple[np.ndarray, np.ndarray]:
    """Chain mutual-NN descriptor matches across consecutive query images
    into multi-view tracks (a light feature tracker for triangulating a
    second camera's OWN points — the 'reconstruction' half of the reference
    TODO in PnP mode, where no Pi3 geometry exists for the query camera).

    detections: per image {'keypoints': (K, 2), 'descriptors': (K, D)}.
    Returns (obs_uv (T, V, 2), obs_valid (T, V)) for tracks seen in >= 2
    images.
    """
    from .alignment import mutual_nn_match

    n_img = len(detections)
    track_of: List[dict] = [dict() for _ in range(n_img)]  # kp idx -> track id
    tracks: List[dict] = []  # track id -> {img: kp_idx}
    for k in range(1, n_img):
        prev, cur = detections[k - 1], detections[k]
        if prev["descriptors"].shape[0] == 0 or cur["descriptors"].shape[0] == 0:
            continue
        qi, pi = mutual_nn_match(cur["descriptors"], prev["descriptors"], min_cosine)
        for q, p in zip(qi, pi):
            tid = track_of[k - 1].get(int(p))
            if tid is None:
                tid = len(tracks)
                tracks.append({k - 1: int(p)})
                track_of[k - 1][int(p)] = tid
            tracks[tid][k] = int(q)
            track_of[k][int(q)] = tid

    multi = [tr for tr in tracks if len(tr) >= 2]
    obs_uv = np.zeros((len(multi), n_img, 2), np.float32)
    obs_valid = np.zeros((len(multi), n_img), np.float32)
    for ti, tr in enumerate(multi):
        for img, kp in tr.items():
            obs_uv[ti, img] = detections[img]["keypoints"][kp]
            obs_valid[ti, img] = 1.0
    return obs_uv, obs_valid


def _pool_map_tracks(
    recons: Sequence[ChunkReconstruction], cap_per_chunk: int = 4096
) -> Tuple[np.ndarray, np.ndarray]:
    """Pooled (points, descriptors) of live described tracks across the map."""
    from .alignment import subsample_live_tracks

    pts, descs = [], []
    for r in recons:
        if r.track_desc is None:
            continue
        live = subsample_live_tracks(r, cap_per_chunk)
        pts.append(r.points[live])
        descs.append(r.track_desc[live])
    if not pts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 0), np.float32)
    return np.concatenate(pts).astype(np.float32), np.concatenate(descs).astype(np.float32)


@dataclasses.dataclass
class LocalizationResult:
    success: bool
    rotation: np.ndarray | None  # (3, 3) world->camera
    center: np.ndarray | None
    num_matches: int
    num_inliers: int
    inlier_rms_px: float


def localize_by_descriptors(
    map_recons: Sequence[ChunkReconstruction],
    keypoints: np.ndarray,
    descriptors: np.ndarray,
    intrinsics: np.ndarray,
    *,
    min_cosine: float = 0.85,
    min_inliers: int = 12,
    seed: int = 0,
    map_pool: Tuple[np.ndarray, np.ndarray] | None = None,
    **ransac_kwargs,
) -> LocalizationResult:
    """Localize one query image: match its descriptors to the map's track
    descriptors, pad correspondences to a power-of-two bucket (bounds XLA
    recompiles across images), and solve robust PnP on the SfM backend.

    map_pool: optional precomputed _pool_map_tracks output — the pool is
    invariant across query images, so callers localizing many images should
    pool once instead of re-concatenating the whole map per image."""
    map_pts, map_desc = map_pool if map_pool is not None else _pool_map_tracks(map_recons)
    if map_pts.shape[0] == 0:
        return LocalizationResult(False, None, None, 0, 0, float("inf"))
    from .alignment import mutual_nn_match

    qi, mi = mutual_nn_match(
        descriptors / np.maximum(np.linalg.norm(descriptors, axis=-1, keepdims=True), 1e-9),
        map_desc,
        min_cosine,
    )
    n_match = int(qi.size)
    # every RANSAC minimal sample draws sample_size points: fewer real
    # matches than that would pull padded zero-correspondences into every
    # DLT hypothesis
    sample_size = ransac_kwargs.get("sample_size", 8)
    if n_match < max(min_inliers, sample_size):
        return LocalizationResult(False, None, None, n_match, 0, float("inf"))

    cap = 1 << max(6, int(np.ceil(np.log2(n_match))))
    pts = np.zeros((cap, 3), np.float32)
    uv = np.zeros((cap, 2), np.float32)
    val = np.zeros(cap, np.float32)
    pts[:n_match] = map_pts[mi]
    uv[:n_match] = keypoints[qi]
    val[:n_match] = 1.0

    from .device import sfm_compute

    with sfm_compute():
        res = _ransac_pnp_jit(
            jnp.asarray(pts),
            jnp.asarray(uv),
            jnp.asarray(intrinsics, jnp.float32),
            jnp.asarray(val),
            jax.random.PRNGKey(seed),
            **ransac_kwargs,
        )
    n_inl = int(res.num_inliers)
    if n_inl < min_inliers:
        return LocalizationResult(False, None, None, n_match, n_inl, float(res.inlier_rms_px))
    return LocalizationResult(
        True,
        np.asarray(res.rotation),
        np.asarray(res.center),
        n_match,
        n_inl,
        float(res.inlier_rms_px),
    )


@dataclasses.dataclass
class RegistrationResult:
    success: bool
    sim3: Sim3 | None
    num_matches: int
    num_inliers: int
    inlier_rms: float


def register_reconstruction(
    map_recons: Sequence[ChunkReconstruction],
    query: ChunkReconstruction,
    *,
    min_cosine: float = 0.85,
    min_matches: int = 30,
    min_inliers: int = 20,
    inlier_scale_factor: float = 0.05,
    apply: bool = True,
    map_pool: Tuple[np.ndarray, np.ndarray] | None = None,
) -> RegistrationResult:
    """Sim3-register a second camera's chunk onto the map by 3D-3D
    descriptor matching (reconstruction of another camera: the registered
    chunk's tracks live in the map frame afterwards). map_pool as in
    localize_by_descriptors."""
    if query.track_desc is None:
        return RegistrationResult(False, None, 0, 0, float("inf"))
    map_pts, map_desc = map_pool if map_pool is not None else _pool_map_tracks(map_recons)
    if map_pts.shape[0] == 0:
        return RegistrationResult(False, None, 0, 0, float("inf"))
    from .alignment import mutual_nn_match

    live = np.nonzero(query.track_valid > 0)[0]
    qi, mi = mutual_nn_match(query.track_desc[live], map_desc, min_cosine)
    n_match = int(qi.size)
    if n_match < min_matches:
        return RegistrationResult(False, None, n_match, 0, float("inf"))
    src = query.points[live[qi]].astype(np.float32)
    dst = map_pts[mi]
    spread = np.median(np.linalg.norm(dst - np.median(dst, axis=0), axis=-1))
    tau = max(float(spread) * inlier_scale_factor, 1e-6)

    from .device import sfm_compute

    with sfm_compute():
        t = robust_umeyama(
            jnp.asarray(src), jnp.asarray(dst), huber_delta=tau, iterations=8
        )
        res = np.asarray(
            jnp.linalg.norm(sim3_apply(t, jnp.asarray(src)) - jnp.asarray(dst), axis=-1)
        )
    inl = res <= 2.0 * tau
    n_inl = int(inl.sum())
    if n_inl < min_inliers:
        return RegistrationResult(False, None, n_match, n_inl, float("inf"))
    if apply:
        from .alignment import apply_sim3_to_reconstruction

        apply_sim3_to_reconstruction(query, t)
    return RegistrationResult(
        True, t, n_match, n_inl, float(np.sqrt(np.mean(res[inl] ** 2)))
    )
