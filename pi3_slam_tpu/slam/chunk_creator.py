"""Offline chunk creation: run Pi3 (+ optional MoGe metric scale) over
overlapping chunks and persist compact keypoint-sparse chunk files.

Replaces OfflineChunkCreator (slam/offline_chunk_creator.py:54-373). The
whole per-chunk compute — forward pass, confidence/depth-edge masking,
intrinsics estimation, keypoint interpolation, color sampling — is ONE jitted
device step; the host only decodes images (threaded prefetch), applies the
median metric-scale ratio, and writes npz chunk files (the documented
replacement for the reference's .pt torch pickles; same keys/shapes/dtypes).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..data import ChunkDataset, PrefetchLoader, calculate_target_size
from ..data.undistortion import create_undistorter
from ..geometry.focal import estimate_camera_parameters
from ..geometry.maps import depth_edge
from ..geometry.transforms import se3_inverse
from ..models import Pi3Config, pi3_forward, init_pi3_params
from ..ops.interpolate import grid_sample_frames
from ..utils.keypoints import grid_keypoints
from .config import OfflineCreatorConfig


def _fan_table(n_real: int, n_padded: int, max_obs: int) -> np.ndarray:
    """Candidate-frame table for the in-step observation fan, computed over
    the REAL frame count (padded tail frames must neither receive slots nor
    spend the earlier-frame subsample budget — the reconstructor's fan uses
    the real N); rows for padded frames stay all -1."""
    from ..sfm.reconstruction import _candidate_frames

    t = np.full((n_padded, max_obs - 1), -1, np.int32)
    for f in range(n_real):
        c = _candidate_frames(f, n_real, max_obs)
        t[f, : c.size] = c
    return t


class OverlapUploadCache:
    """Device-side reuse of chunk-overlap frames.

    Consecutive chunks share their first ``overlap`` frames with the previous
    chunk's tail (the reference's window stride is chunk_length - overlap,
    datasets/image_datasets.py:41-47); re-uploading them is pure waste — at
    the 7-Scenes eval config (overlap 20 / chunk 100) it is 20% of every
    host->device image transfer, which through this machine's remote-TPU
    tunnel (~30 MB/s) costs ~0.25 s per chunk. The cache keeps the previous
    chunk's uploaded device array and frame identities, and assembles the next
    chunk's device batch as cached-tail ++ upload-of-new-frames. Reuse is
    gated on exact frame-identity match (longest previous-suffix ==
    new-prefix), so resume gaps, ragged tails, shape changes, and recovery
    all fall back to a plain full upload.
    """

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._keys: List | None = None
        self._dev = None

    @staticmethod
    def _key(p):
        if isinstance(p, np.ndarray):
            p = p.tolist()
        if isinstance(p, (list, tuple)):
            return tuple(str(x) for x in p)
        return str(p)

    def upload(self, images: np.ndarray, paths) -> jax.Array:
        """(N, 3, H, W) host frames -> device array, reusing cached overlap."""
        keys = [self._key(p) for p in paths]
        dev = None
        prev_keys, prev_dev = self._keys, self._dev
        if (
            prev_dev is not None
            and prev_keys
            and prev_dev.shape[1:] == images.shape[1:]
            and prev_dev.dtype == images.dtype
        ):
            ov = 0
            for k in range(min(len(prev_keys), len(keys)), 0, -1):
                if prev_keys[-k:] == keys[:k]:
                    ov = k
                    break
            if ov == len(keys):
                dev = prev_dev[-ov:]
            elif ov:
                dev = jnp.concatenate([prev_dev[-ov:], jnp.asarray(images[ov:])], axis=0)
        if dev is None:
            dev = jnp.asarray(images)
        self._keys, self._dev = keys, dev
        return dev


class GroupUploadCache:
    """Device-side frame dedup + reuse for chunk-dp GROUP uploads.

    The dp paths stack dp chunks into one (B, Np, 3, H, W) batch per sharded
    step and used to upload the whole stack every group — re-paying exactly
    the redundant bytes OverlapUploadCache eliminates for one chip, twice
    over: consecutive chunks WITHIN a group share their ``overlap`` head/tail
    frames (the window stride is chunk_length - overlap, reference
    datasets/image_datasets.py:41-47), and the last chunk of group k-1 shares
    frames with the first chunk of group k. Tail padding (repeat of the final
    frame) and dp padding (repeat of the final chunk) are further pure
    duplicates. The cache uploads each unique frame ONCE per group, reuses
    frames still device-resident from the previous group's flat pool, and
    reassembles the stacked batch with one on-device gather — bit-identical
    to the plain stacked upload (tests/test_overlap_cache.py). Reuse is
    keyed on frame identity (path), so resume gaps, shape/dtype changes and
    recovery fall back to plain uploads of the affected frames.

    At the 7-Scenes eval config (chunk 100 / overlap 20, dp=4) this sends
    ~320 unique frames instead of 400 stacked ones per group plus 20 reused
    across groups — ~25% of the host->device image bytes saved, the same
    fraction the single-chip cache buys, through the same ~30 MB/s tunnel.
    """

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._keys: Dict | None = None  # frame key -> row in self._flat
        self._flat = None               # (F, 3, H, W) unique device frames
        self.last_uploaded = 0          # frames sent host->device last call

    def upload(self, images: np.ndarray, paths_per_row) -> jax.Array:
        """(B, Np, 3, H, W) host stack -> device stack, uploading each unique
        frame once. ``paths_per_row``: per-row frame identities; rows shorter
        than Np are extended by repeating their final path (matching
        _pad_tail's repeat-last-frame padding)."""
        B, Np = images.shape[:2]
        keys = []
        for row in paths_per_row:
            rk = [OverlapUploadCache._key(p) for p in row]
            rk += [rk[-1]] * (Np - len(rk))
            keys.append(rk[:Np])
        prev_keys, prev_flat = self._keys, self._flat
        ok_prev = (
            prev_flat is not None
            and prev_flat.shape[1:] == images.shape[2:]
            and prev_flat.dtype == images.dtype
        )
        pos: Dict = {}   # key -> ("prev"|"new", index within its part)
        prev_rows: List[int] = []   # gathered from prev_flat; part 0 of cat
        new_srcs: List = []         # (b, n) host frames to upload; part 1
        for b in range(B):
            for n in range(Np):
                k = keys[b][n]
                if k in pos:
                    continue
                if ok_prev and k in prev_keys:
                    pos[k] = ("prev", len(prev_rows))
                    prev_rows.append(prev_keys[k])
                else:
                    pos[k] = ("new", len(new_srcs))
                    new_srcs.append((b, n))
        n_prev = len(prev_rows)
        index = np.empty((B, Np), np.int32)
        for b in range(B):
            for n in range(Np):
                tag, i = pos[keys[b][n]]
                index[b, n] = i if tag == "prev" else n_prev + i
        parts = []
        if prev_rows:
            parts.append(prev_flat[jnp.asarray(np.asarray(prev_rows, np.int32))])
        if new_srcs:
            parts.append(jnp.asarray(np.stack([images[b, n] for b, n in new_srcs])))
        flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        self._keys = {
            k: (i if tag == "prev" else n_prev + i) for k, (tag, i) in pos.items()
        }
        self._flat = flat
        self.last_uploaded = len(new_srcs)
        return flat[jnp.asarray(index)]


def _project_and_refine_observations(images, keypoints, pts_kp, poses, cam, refine_obs,
                                     cand):
    """Observation fan + ZNCC refinement inside the device step.

    Projects each frame's keypoint 3D into its candidate frames (the same
    evenly-subsampled fan the reconstructor uses — ``cand`` is the
    host-computed _fan_table over the chunk's REAL frame count, -1-padded)
    and re-measures every in-bounds projection photometrically
    (ops/correlation.zncc_refine_observations). Returns (N, K, M)-shaped obs
    arrays (slot 0 = the detection itself) so per-frame tail-padding slices
    apply.
    """
    from ..ops.correlation import rgb_to_gray, zncc_refine_observations

    m_obs, patch_r, search_r, min_zncc = refine_obs
    n, _, h, w = images.shape
    k = keypoints.shape[1]
    t = n * k

    cand = jnp.asarray(cand, jnp.int32)  # (N, M-1), -1 padded
    cand_safe = jnp.maximum(cand, 0)

    if cam is not None:
        intr4 = jnp.stack([cam["fx"], cam["fy"], cam["cx"], cam["cy"]], axis=-1)
        # degenerate-focal fallback mirrors sfm/reconstruction.py:163-170
        f_default = float(max(w, h))
        default4 = jnp.asarray([f_default, f_default, w / 2.0, h / 2.0], jnp.float32)
        bad = (
            (intr4[:, 0] <= 1.0)
            | (intr4[:, 1] <= 1.0)
            | ~jnp.isfinite(intr4[:, :2]).all(axis=1)
        )
        intr4 = jnp.where(bad[:, None], default4[None], intr4)
    else:
        f_default = float(max(w, h))
        intr4 = jnp.broadcast_to(
            jnp.asarray([f_default, f_default, w / 2.0, h / 2.0], jnp.float32), (n, 4)
        )

    R_cw = jnp.transpose(poses[:, :3, :3], (0, 2, 1))
    centers = poses[:, :3, 3]
    Rc = R_cw[cand_safe]  # (N, M-1, 3, 3)
    cc = centers[cand_safe]  # (N, M-1, 3)
    ic = intr4[cand_safe]  # (N, M-1, 4)
    X = pts_kp.astype(jnp.float32)  # (N, K, 3)
    xc = jnp.einsum("nmij,nmkj->nmki", Rc, X[:, None, :, :] - cc[:, :, None, :])
    z = xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = ic[..., 0][..., None] * xc[..., 0] / zs + ic[..., 2][..., None]
    v = ic[..., 1][..., None] * xc[..., 1] / zs + ic[..., 3][..., None]
    # in-bounds semantics identical to the reconstructor's projected fan
    # (sfm/reconstruction.py numpy fallback / cpp hash-join)
    inb = (
        (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        & (cand >= 0)[..., None]
    )  # (N, M-1, K)
    proj_uv = jnp.stack([u, v], axis=-1)  # (N, M-1, K, 2)

    # flatten to tracks (frame-major, matching the reconstructor layout)
    obs_uv = jnp.transpose(proj_uv, (0, 2, 1, 3)).reshape(t, m_obs - 1, 2)
    obs_valid = jnp.transpose(inb, (0, 2, 1)).reshape(t, m_obs - 1)
    obs_frame = jnp.broadcast_to(cand_safe[:, None, :], (n, k, m_obs - 1)).reshape(
        t, m_obs - 1
    )
    tmpl_frame = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    tmpl_uv = keypoints.reshape(t, 2).astype(jnp.float32)

    gray = rgb_to_gray(images.astype(jnp.float32))
    refined_uv, _zncc, refined = zncc_refine_observations(
        gray, tmpl_frame, tmpl_uv, obs_frame, obs_uv,
        patch_radius=patch_r, search_radius=search_r, min_zncc=min_zncc,
    )
    refined = refined & obs_valid
    obs_uv = jnp.where(refined[..., None], refined_uv, obs_uv)

    # slot 0: the detection in its own frame
    full_frame = jnp.concatenate([tmpl_frame[:, None], obs_frame], axis=1)
    full_uv = jnp.concatenate([tmpl_uv[:, None, :], obs_uv], axis=1)
    full_valid = jnp.concatenate(
        [jnp.ones((t, 1), bool), obs_valid.astype(bool)], axis=1
    )
    full_refined = jnp.concatenate([jnp.zeros((t, 1), bool), refined], axis=1)
    return {
        "obs_frame": full_frame.reshape(n, k, m_obs).astype(jnp.int32),
        "obs_uv": full_uv.reshape(n, k, m_obs, 2),
        "obs_valid": full_valid.reshape(n, k, m_obs),
        "obs_refined": full_refined.reshape(n, k, m_obs),
    }


_OBS_KEYS = ("obs_frame", "obs_uv", "obs_valid", "obs_refined")


def _store_refined_observations(result: Dict, host: Dict, n_real: int) -> None:
    """Persist ZNCC-refined observation arrays (already sliced to, or sliced
    here to, the real frame count). Observations referencing padded tail
    frames are invalidated; obs_uv stays float32 — float16's 0.25 px ulp at
    u > 256 would erase the sub-pixel refinement."""
    of = np.asarray(host["obs_frame"])[:n_real]
    result["obs_frame"] = of.astype(np.int16)
    result["obs_uv"] = np.asarray(host["obs_uv"])[:n_real].astype(np.float32)
    result["obs_valid"] = np.asarray(host["obs_valid"])[:n_real] & (of < n_real)
    result["obs_refined"] = np.asarray(host["obs_refined"])[:n_real]


_DENSE_KEYS = ("local_points_dense", "conf_dense", "masks_dense")


def _host_rgb_dense(images: np.ndarray, n_real: int, stride: int) -> np.ndarray:
    """Strided uint8 rgb map recomputed host-side from the input frames.

    The device step used to return it, but it is (up to a f32/255 round
    trip) the strided input the host already holds — pulling ~N*H*W*3/s^2
    bytes back over PCIe/the tunnel was pure waste. uint8 inputs come back
    bit-exact (better than the old device round trip, whose /255*255
    truncation could sit one code value low)."""
    imgs = images[:n_real].transpose(0, 2, 3, 1)[:, ::stride, ::stride]
    if imgs.dtype == np.uint8:
        return np.ascontiguousarray(imgs)
    return (np.asarray(imgs) * 255.0).clip(0, 255).astype(np.uint8)


def _store_dense_maps(
    result: Dict, host: Dict, scale_factor, n_real: int, stride: int,
    images: np.ndarray | None = None,
) -> None:
    """Copy dense per-pixel maps into the chunk dict ([:n_real] drops padded
    tail frames; metric scale applies to the local point map). rgb comes
    from ``images`` (the original frames) — see _host_rgb_dense; world
    points are not stored at all (recompute via dense_world_points)."""
    stored = False
    for key in _DENSE_KEYS:
        if key not in host:
            continue
        arr = host[key][:n_real]
        if scale_factor is not None and key == "local_points_dense":
            arr = (arr.astype(np.float32) * scale_factor).astype(np.float16)
        result[key] = arr
        stored = True
    if stored:
        if images is not None:
            result["rgb_dense"] = _host_rgb_dense(images, n_real, stride)
        result["dense_stride"] = np.int16(stride)


def dense_world_points(local: np.ndarray, poses: np.ndarray) -> np.ndarray:
    """World-frame dense points from a chunk's local map + cam->world poses
    (N, H, W, 3) x (N, 4, 4) -> (N, H, W, 3). The device step no longer
    returns the world map (it is this one einsum away from what it does
    return, and it used to double the dense pull bytes)."""
    local = np.asarray(local, np.float32)
    R = np.asarray(poses, np.float32)[:, :3, :3]
    t = np.asarray(poses, np.float32)[:, :3, 3]
    return np.einsum("nij,nhwj->nhwi", R, local) + t[:, None, None, :]


def make_chunk_step(cfg: Pi3Config, compute_dtype, conf_threshold: float, edge_rtol: float,
                    estimate_intrinsics: bool, return_dense: bool = False,
                    dense_stride: int = 1,
                    refine_obs: tuple | None = None):
    """Build the jitted per-chunk device step.

    step(params, images (B,N,3,H,W), keypoints (B,N,K,2)) -> compact outputs
    with a leading chunk-batch dim B. B > 1 is the chunk-data-parallel path:
    shard B over the mesh's dp axis and every chunk runs on its own devices.
    For the common single-chunk call, pass keypoints as (N,K,2) and outputs
    drop the batch dim.

    refine_obs = (max_obs, patch_radius, search_radius, min_zncc) enables
    correlation-based observation refinement (the reference's README TODO
    "Add correlation based features refinement"): the track observation fan
    is projected and ZNCC-refined INSIDE the step, while the images are
    still on device (ops/correlation.py), and stored in the chunk; the
    reconstructor then uses the photometrically measured observations
    instead of re-projecting the model geometry.
    """

    def single(params, images, keypoints, cand=None):
        # images (N, 3, H, W) float32 [0,1] or uint8 (normalized here — the
        # loader ships raw bytes to cut host->device transfer 4x)
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        out = pi3_forward(params, images[None], cfg, compute_dtype=compute_dtype)
        local = out["local_points"][0]  # (N, H, W, 3)
        world = out["points"][0]
        conf = out["conf"][0]  # (N, H, W, 1)
        poses = out["camera_poses"][0]  # (N, 4, 4)

        conf_mask = jax.nn.sigmoid(conf[..., 0]) > conf_threshold
        non_edge = ~depth_edge(local[..., 2], rtol=edge_rtol)
        masks = jnp.logical_and(conf_mask, non_edge)  # (N, H, W)

        # keypoint interpolation (slam/offline_chunk_creator.py:129-159):
        # bilinear for points, nearest for conf/mask
        pts_kp = grid_sample_frames(world, keypoints, mode="bilinear")
        local_kp = grid_sample_frames(local, keypoints, mode="bilinear")
        conf_kp = grid_sample_frames(conf, keypoints, mode="nearest")
        masks_kp = grid_sample_frames(
            masks[..., None].astype(jnp.float32), keypoints, mode="nearest"
        )[..., 0] > 0.5
        colors_kp = grid_sample_frames(
            images.transpose(0, 2, 3, 1), keypoints, mode="bilinear"
        )

        result = {
            "points_kp": pts_kp,
            "local_points_kp": local_kp,
            "conf_kp": conf_kp,
            "masks_kp": masks_kp,
            "colors_kp": colors_kp,
            "camera_poses": poses,
            "depth0": local[0, ..., 2],
            "mask0": masks[0],
        }
        cam = None
        if estimate_intrinsics:
            cam = estimate_camera_parameters(local, conf)
            result["intrinsics"] = cam["intrinsics"]
            result["focal"] = cam["focal"]
            result["shift"] = cam["shift"]
        if refine_obs is not None:
            obs = _project_and_refine_observations(
                images, keypoints, pts_kp, poses, cam, refine_obs, cand
            )
            result.update(obs)
        if return_dense:
            # strided on-device: cuts the device->host pull (and the npz)
            # by stride^2 — dense consumers (TSDF fusion, mapping/tsdf.py)
            # do not need full resolution. Only what the host CANNOT
            # reconstruct for free crosses the link: world points are
            # pose @ local (dense_world_points) and the rgb map is the
            # strided input frame the host already holds (_host_rgb_dense),
            # so neither is returned — that halves the dense pull bytes.
            s = dense_stride
            result["local_points_dense"] = local[:, ::s, ::s].astype(jnp.float16)
            result["conf_dense"] = conf[:, ::s, ::s].astype(jnp.float16)
            result["masks_dense"] = masks[:, ::s, ::s]
        return result

    def step(params, images, keypoints, cand=None):
        if images.ndim == 5 and keypoints.ndim == 3:
            # legacy single-chunk call: (1, N, 3, H, W) + (N, K, 2)
            return single(params, images[0], keypoints, cand)
        return jax.vmap(
            single, in_axes=(None, 0, 0, None if cand is None else 0)
        )(params, images, keypoints, cand)

    return jax.jit(step)


def make_sharded_chunk_step(cfg: Pi3Config, compute_dtype, conf_threshold: float,
                            edge_rtol: float, estimate_intrinsics: bool, mesh,
                            return_dense: bool = False, dense_stride: int = 1,
                            refine_obs: tuple | None = None):
    """Chunk-data-parallel step over a device mesh: the (B, ...) chunk batch
    is sharded on the mesh's dp axis, parameters on tp (see parallel/mesh.py).

    Returns (step_fn, shard_params_fn).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.context import tp_mesh_context
    from ..parallel.mesh import pi3_param_shardings

    base = make_chunk_step(
        cfg, compute_dtype, conf_threshold, edge_rtol, estimate_intrinsics,
        return_dense=return_dense, dense_stride=dense_stride,
        refine_obs=refine_obs,
    )

    def shard_params(params):
        return jax.device_put(params, pi3_param_shardings(params, mesh))

    dp = NamedSharding(mesh, P("dp"))

    def step(params, images, keypoints, cand=None):
        images = jax.device_put(images, dp)
        keypoints = jax.device_put(keypoints, dp)
        if cand is not None:
            cand = jax.device_put(cand, dp)
        # tp context active while the jitted base traces: attention runs
        # head-sharded via shard_map instead of GSPMD's all-gather+replicate
        with tp_mesh_context(mesh):
            return base(params, images, keypoints, cand)

    return step, shard_params


class OfflineChunkCreator:
    def __init__(self, config: OfflineCreatorConfig, pi3_config: Pi3Config | None = None):
        self.config = config
        from ..utils.precision import enable_compilation_cache

        enable_compilation_cache()
        ckpt_cfg = None
        if config.checkpoint_path:
            from ..models.convert import load_pi3_checkpoint

            print(f"Loading Pi3 weights: {config.checkpoint_path}")
            self.params, ckpt_cfg = load_pi3_checkpoint(config.checkpoint_path)
        # explicit pi3_config wins; else the checkpoint's embedded
        # self-description (convert.load_pi3_checkpoint); else full-size default
        self.pi3_config = pi3_config or ckpt_cfg or Pi3Config()
        if getattr(config, "global_kv_merge", 1) > 1:
            import dataclasses

            self.pi3_config = dataclasses.replace(
                self.pi3_config, global_kv_merge=config.global_kv_merge
            )
        self.target_size = None
        self.chunks_dir = os.path.join(config.output_dir, "chunks")
        os.makedirs(self.chunks_dir, exist_ok=True)

        dtype_map = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
        self.compute_dtype = dtype_map[config.compute_dtype]

        if not config.checkpoint_path:
            print("No checkpoint given - random Pi3 weights (geometry will be noise)")
            self.params = init_pi3_params(0, self.pi3_config)
        if self.compute_dtype == jnp.bfloat16:
            from ..utils.precision import cast_tree_bf16_host

            self.params = cast_tree_bf16_host(self.params)
        # keep a host copy for backend-crash recovery, pin params on device
        # (numpy leaves would re-upload per call)
        self._host_params = self.params
        self.params = jax.device_put(self.params)

        self.moge = None
        if config.use_metric_depth:
            try:
                from ..models.moge import MoGeRunner

                self.moge = MoGeRunner(config.moge_checkpoint_path)
            except Exception as e:
                print(f"MoGe unavailable ({e}); continuing without metric depth")

        self.undistorter = None
        if config.cam_dist_path:
            self.undistorter = create_undistorter(config.cam_dist_path)

        self.keypoint_extractor = None
        if config.keypoint_type == "aliked":
            from ..utils.keypoints import create_keypoint_extractor

            ex = create_keypoint_extractor(
                "aliked",
                max_num_keypoints=config.max_keypoints,
                detection_threshold=config.keypoint_threshold,
                aliked_checkpoint_path=config.aliked_checkpoint_path,
            )
            from ..utils.keypoints import ALIKEDExtractor

            if isinstance(ex, ALIKEDExtractor):
                self.keypoint_extractor = ex
            else:  # factory already warned; grid path below handles it
                self.config.keypoint_type = "grid"

        self._step_cache: Dict[tuple, callable] = {}
        self._upload_cache = OverlapUploadCache()
        self._group_upload_cache = GroupUploadCache()
        self.mesh = None
        if (
            config.data_parallel_chunks > 1
            or config.tensor_parallel > 1
            or config.sequence_parallel > 1
        ):
            n_dev = len(jax.devices())
            sp = max(1, min(config.sequence_parallel, n_dev))
            tp = max(1, min(config.tensor_parallel, n_dev // sp))
            dp = max(1, min(config.data_parallel_chunks, n_dev // (tp * sp)))
            if dp * tp * sp > 1:
                from ..parallel import make_mesh

                self.mesh = make_mesh(dp, tp, n_sp=sp)
                config.data_parallel_chunks = dp
                config.tensor_parallel = tp
                config.sequence_parallel = sp
                print(f"device mesh: dp={dp} x tp={tp} x sp={sp} over {n_dev} devices")
                if self.moge is not None:
                    self.moge.shard_params(self.mesh)
            else:
                config.data_parallel_chunks = 1
                config.tensor_parallel = 1
                config.sequence_parallel = 1

    def _refine_cfg(self):
        if not self.config.refine_observations:
            return None
        return (
            self.config.refine_max_observations,
            self.config.refine_patch_radius,
            self.config.refine_search_radius,
            self.config.refine_min_zncc,
        )

    def _get_step(self):
        dense = self.config.keypoint_type == "none" or self.config.save_dense
        stride = self.config.dense_stride
        refine = self._refine_cfg()
        key = (self.config.conf_threshold, self.config.depth_edge_rtol, dense,
               stride, refine)
        if key not in self._step_cache:
            if not self._step_cache:
                print(
                    "building device step (first chunk of a new shape triggers "
                    "XLA compilation - minutes on a cold cache, then persisted "
                    "in ~/.cache/pi3_slam_tpu_jax)"
                )
            if self.mesh is not None:
                step, shard_params = make_sharded_chunk_step(
                    self.pi3_config,
                    self.compute_dtype,
                    self.config.conf_threshold,
                    self.config.depth_edge_rtol,
                    self.config.estimate_camera_params,
                    self.mesh,
                    return_dense=dense,
                    dense_stride=stride,
                    refine_obs=refine,
                )
                self.params = shard_params(self.params)
                self._step_cache[key] = step
            else:
                self._step_cache[key] = make_chunk_step(
                    self.pi3_config,
                    self.compute_dtype,
                    self.config.conf_threshold,
                    self.config.depth_edge_rtol,
                    self.config.estimate_camera_params,
                    return_dense=dense,
                    dense_stride=stride,
                    refine_obs=refine,
                )
        return self._step_cache[key]

    # per-frame device-step outputs that must be sliced back to the real
    # frame count when a tail chunk was padded to chunk_length
    _PER_FRAME_KEYS = (
        "points_kp", "local_points_kp", "conf_kp", "masks_kp", "colors_kp",
        "camera_poses", "local_points_dense", "conf_dense", "masks_dense",
        "obs_frame", "obs_uv", "obs_valid", "obs_refined", "intrinsics",
    )

    def _pad_tail(self, images: np.ndarray, kps: np.ndarray):
        """Pad a short tail chunk to chunk_length by repeating the last frame
        (and its keypoints) so the ONE compiled device program covers every
        chunk; callers slice outputs back via _PER_FRAME_KEYS. Poses are
        chunk-relative to frame 0 and the alignment overlap sits at the chunk
        START, so end-padding disturbs neither."""
        n = images.shape[0]
        target = self.config.chunk_length
        if not self.config.pad_tail_chunks or n >= target:
            return images, kps
        pad = target - n
        print(f"   tail chunk padded {n} -> {target} frames (reusing the compiled shape)")
        images = np.concatenate([images, np.repeat(images[-1:], pad, axis=0)])
        kps = np.concatenate([kps, np.repeat(kps[-1:], pad, axis=0)])
        return images, kps

    def _process_chunk_group_with_recovery(self, batches: List[Dict]) -> List[Dict]:
        """dp-group variant of _process_chunk_with_recovery: on a device
        runtime failure, reset the backend (re-sharding parameters) and retry
        the whole group once."""
        try:
            return self._process_chunk_group(batches)
        except Exception as e:
            if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                raise
            print(f"   device runtime failure ({str(e)[:80]}); resetting backend and retrying group")
            self._recover_backend()
            return self._process_chunk_group(batches)

    def _process_chunk_group(self, batches: List[Dict]) -> List[Dict]:
        """One chunk-dp group synchronously (recovery path; the drive loop
        pipelines dispatch/finish itself)."""
        return self._finish_group(self._dispatch_group(batches))

    def _dispatch_group(self, batches: List[Dict]) -> Dict:
        """Dispatch one chunk-dp group (sharded step + queued MoGe) without
        materializing — groups pipeline like single chunks: the next group's
        device step runs while the host compresses this group's npz files."""
        B = len(batches)
        n_frames = [b["images"].shape[0] for b in batches]
        H, W = batches[0]["images"].shape[-2:]
        dets = None
        if self.keypoint_extractor is not None:  # ALIKED: per-frame learned
            dets = [self.keypoint_extractor.extract(b["images"]) for b in batches]
            kps_list = [d["keypoints"].astype(np.float32) for d in dets]
        else:
            kp = grid_keypoints(H, W, self.config.max_keypoints, self.config.grid_spacing)
            kps_list = [
                np.broadcast_to(kp[None], (n, kp.shape[0], 2)).astype(np.float32)
                for n in n_frames
            ]

        step = self._get_step()
        t0 = time.time()
        # per-batch tail padding: a short tail chunk can ride the same group
        # (and the same compiled program) as full-length ones
        padded = [
            self._pad_tail(b["images"], k) for b, k in zip(batches, kps_list)
        ]
        images = np.stack([p[0] for p in padded])  # (B, Np, 3, H, W)
        kps_dev = np.stack([p[1] for p in padded])
        cand = None
        if self.config.refine_observations:
            # observation fan over each chunk's REAL frame count (padded
            # tail frames must not consume fan slots)
            cand = jnp.asarray(np.stack([
                _fan_table(nf, images.shape[1], self.config.refine_max_observations)
                for nf in n_frames
            ]))
        # intra-/inter-group overlap frames uploaded once, stacked batch
        # reassembled by one on-device gather (GroupUploadCache)
        imgs_arr = self._group_upload_cache.upload(
            images, [b["paths"] for b in batches]
        )
        dev = step(self.params, imgs_arr, jnp.asarray(kps_dev), cand)
        # queue the MoGe batch behind the sharded step before materializing;
        # one dp-sharded forward covers all B first frames (B sequential
        # unsharded forwards would serialize on chip 0 while the rest idle).
        # First frames sliced from the uploaded stack — no second transfer.
        moge_dev = (
            self.moge.infer_depth_batch_async(imgs_arr[:, 0])
            if self.moge is not None
            else None
        )
        return {"dev": dev, "moge_dev": moge_dev, "kps": kps_list, "dets": dets,
                "t0": t0, "batches": batches, "n_frames": n_frames}

    def _finish_group(self, pending: Dict) -> List[Dict]:
        """Materialize a dispatched group and build per-chunk storage dicts."""
        batches = pending["batches"]
        kps_list = pending["kps"]
        dets = pending["dets"]
        B, n_frames = len(batches), pending["n_frames"]
        host = {k: np.asarray(v) for k, v in pending["dev"].items()}
        moge_host = (
            np.asarray(pending["moge_dev"]) if pending["moge_dev"] is not None else None
        )
        dt = max(1e-6, time.time() - pending["t0"])
        fps = sum(n_frames) / dt
        print(
            f"   dp-group inference: {dt:.3f}s for {B}x{max(n_frames)} frames "
            f"-> {fps:.2f} FPS"
        )

        results = []
        for b, batch in enumerate(batches):
            N = n_frames[b]
            kps = kps_list[b]
            # [:N] drops any padded tail frames (per-batch; a short tail can
            # share a group with full-length chunks)
            poses = host["camera_poses"][b][:N].astype(np.float64)
            points_kp = host["points_kp"][b][:N].astype(np.float64)
            local_kp = host["local_points_kp"][b][:N].astype(np.float64)
            masks_kp = host["masks_kp"][b][:N]
            valid_kp = None
            if dets is not None:
                valid_kp = np.asarray(dets[b]["valid"], bool)
                masks_kp = masks_kp & valid_kp
            scale_factor = None
            if moge_host is not None:
                moge_depth = moge_host[b]
                mask0 = host["mask0"][b]
                ratio = moge_depth[mask0] / np.maximum(host["depth0"][b][mask0], 1e-9)
                ratio = ratio[np.isfinite(ratio)]
                if ratio.size >= 10:
                    scale_factor = float(np.median(ratio))
                    points_kp *= scale_factor
                    local_kp *= scale_factor
                    poses[:, :3, 3] *= scale_factor
            poses_cw = np.asarray(se3_inverse(jnp.asarray(poses))).astype(np.float32)
            result = {
                "points": points_kp.astype(np.float16),
                "local_points": local_kp.astype(np.float16),
                "conf": host["conf_kp"][b][:N].astype(np.float16),
                "masks": masks_kp,
                "keypoints": kps.astype(np.float16),
                "colors": (host["colors_kp"][b][:N] * 255).clip(0, 255).astype(np.uint8),
                "camera_poses": poses.astype(np.float32),
                "camera_poses_cw": poses_cw,
                "image_paths": np.asarray(batch["paths"]),
                "original_height": self.target_size[0],
                "original_width": self.target_size[1],
                "_metrics": {"infer_s": dt / B, "num_frames": N, "fps": N / dt},
            }
            if scale_factor is not None:
                result["metric_scale"] = np.float32(scale_factor)
            if "intrinsics" in host:
                result["intrinsics"] = host["intrinsics"][b][:N].astype(np.float32)
            if valid_kp is not None:
                result["keypoint_valid"] = valid_kp
                result["descriptors"] = np.asarray(
                    dets[b]["descriptors"], np.float16
                )
            if "obs_frame" in host:
                _store_refined_observations(
                    result, {k: host[k][b] for k in _OBS_KEYS}, N
                )
            _store_dense_maps(
                result,
                {k: host[k][b] for k in _DENSE_KEYS if k in host},
                scale_factor,
                N,
                self.config.dense_stride,
                images=batch["images"],
            )
            results.append(result)
        return results

    def _dispatch_chunk(self, images: np.ndarray, paths: List[str]) -> Dict:
        """Dispatch the device step (+ MoGe queued right behind it) without
        materializing — the forward stays in flight while the host finishes
        the previous chunk (compression + npz write overlap device compute)."""
        N, _, H, W = images.shape
        det = None
        if self.config.keypoint_type == "none":
            # a minimal single-point 'grid' keeps the device step shape-stable;
            # dense maps are exported instead of the sparse arrays below
            kp = np.array([[W / 2.0, H / 2.0]], dtype=np.float32)
            kps = np.broadcast_to(kp[None], (N, 1, 2)).astype(np.float32)
        elif self.keypoint_extractor is not None:  # ALIKED: per-frame learned
            det = self.keypoint_extractor.extract(images)
            kps = det["keypoints"].astype(np.float32)
        else:
            kp = grid_keypoints(H, W, self.config.max_keypoints, self.config.grid_spacing)
            kps = np.broadcast_to(kp[None], (N, kp.shape[0], 2)).astype(np.float32)

        step = self._get_step()
        t0 = time.time()
        imgs_host, kps_dev = self._pad_tail(images, kps)
        if imgs_host is images:
            # overlap frames already sit on the device from the previous
            # chunk's upload: send only the new frames (OverlapUploadCache)
            imgs_arr = self._upload_cache.upload(images, paths)
        else:  # padded tail chunk: host-assembled, plain upload
            self._upload_cache.reset()
            imgs_arr = jnp.asarray(imgs_host)
        cand = None
        if self.config.refine_observations:
            cand = jnp.asarray(
                _fan_table(N, imgs_arr.shape[0], self.config.refine_max_observations)
            )
        dev = step(self.params, imgs_arr[None], jnp.asarray(kps_dev), cand)
        # queue MoGe right behind the Pi3 step BEFORE materializing: the
        # device runs both back-to-back while the host works (the reference
        # hides this forward in its worker process,
        # online_reconstructor.py:72-227). The first frame is sliced from the
        # already-uploaded device batch — no second host transfer.
        moge_dev = self.moge.infer_depth_async(imgs_arr[0]) if self.moge is not None else None
        return {
            "dev": dev, "moge_dev": moge_dev, "kps": kps, "det": det, "t0": t0,
            "images": images, "paths": paths,
        }

    def _finish_chunk(self, pending: Dict) -> Dict:
        """Materialize a dispatched chunk and build the storage dict."""
        images = pending["images"]
        paths = pending["paths"]
        kps = pending["kps"]
        moge_dev = pending["moge_dev"]
        N = images.shape[0]
        host = {k: np.asarray(v) for k, v in pending["dev"].items()}  # sync point
        for k in self._PER_FRAME_KEYS:  # drop padded tail frames, if any
            if k in host and host[k].shape[0] > N:
                host[k] = host[k][:N]
        dt = max(1e-6, time.time() - pending["t0"])
        fps = N / dt
        print(f"   inference+interp: {dt:.3f}s for {N} frames -> {fps:.2f} FPS")

        poses = host["camera_poses"].astype(np.float64)
        points_kp = host["points_kp"].astype(np.float64)
        local_kp = host["local_points_kp"].astype(np.float64)

        scale_factor = None
        if moge_dev is not None:
            moge_depth = np.asarray(moge_dev)  # (H, W)
            mask0 = host["mask0"]
            ratio = moge_depth[mask0] / np.maximum(host["depth0"][mask0], 1e-9)
            # MoGe returns inf outside its validity mask; median over finite
            # ratios only, and skip scaling when too few pixels agree
            ratio = ratio[np.isfinite(ratio)]
            if ratio.size >= 10:
                scale_factor = float(np.median(ratio))
                points_kp *= scale_factor
                local_kp *= scale_factor
                poses[:, :3, 3] *= scale_factor
            else:
                print("   metric scale skipped: too few valid MoGe/Pi3 depth pairs")

        poses_cw = np.asarray(se3_inverse(jnp.asarray(poses))).astype(np.float32)

        det = pending["det"]
        masks_kp = host["masks_kp"]
        if det is not None:
            masks_kp = masks_kp & np.asarray(det["valid"], bool)

        result = {
            "points": points_kp.astype(np.float16),
            "local_points": local_kp.astype(np.float16),
            "conf": host["conf_kp"].astype(np.float16),
            "masks": masks_kp,
            "keypoints": kps.astype(np.float16),
            "colors": (host["colors_kp"] * 255).clip(0, 255).astype(np.uint8),
            "camera_poses": poses.astype(np.float32),
            "camera_poses_cw": poses_cw,
            "image_paths": np.asarray(paths),
            "original_height": self.target_size[0],
            "original_width": self.target_size[1],
            "_metrics": {"infer_s": dt, "num_frames": N, "fps": fps},
        }
        if scale_factor is not None:
            result["metric_scale"] = np.float32(scale_factor)
        if "intrinsics" in host:
            result["intrinsics"] = host["intrinsics"].astype(np.float32)
        if det is not None:
            result["keypoint_valid"] = np.asarray(det["valid"], bool)
            result["descriptors"] = np.asarray(det["descriptors"], np.float16)
        if "obs_frame" in host:
            _store_refined_observations(result, host, N)
        _store_dense_maps(
            result, host, scale_factor, N, self.config.dense_stride, images=images
        )
        return result

    def _process_single_chunk(self, images: np.ndarray, paths: List[str]) -> Dict:
        """One chunk synchronously: dispatch + finish (recovery/dense paths;
        the drive loop pipelines dispatch/finish itself)."""
        return self._finish_chunk(self._dispatch_chunk(images, paths))

    def _process_dense_chunk(self, images: np.ndarray, paths: List[str]) -> Dict:
        """keypoints='none': store dense per-pixel maps (no tracks — the
        reference's no-extractor path keeps dense maps in the chunk)."""
        result = self._process_single_chunk(images, paths)
        for key in ("points", "local_points", "conf", "masks", "keypoints", "colors"):
            result.pop(key, None)
        result["dense"] = np.bool_(True)
        return result

    def _process_chunk_with_recovery(self, batch: Dict) -> Dict:
        """Process one chunk; on a device-runtime failure (this environment's
        TPU worker crashes sporadically under sustained load), reset the
        backend, re-upload parameters, and retry once."""
        def run():
            if self.config.keypoint_type == "none":
                return self._process_dense_chunk(batch["images"], batch["paths"])
            return self._process_single_chunk(batch["images"], batch["paths"])

        try:
            return run()
        except Exception as e:
            if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                raise
            print(f"   device runtime failure ({str(e)[:80]}); resetting backend and retrying")
            self._recover_backend()
            return run()

    def _recover_backend(self) -> None:
        self._upload_cache.reset()  # cached device frames died with the backend
        self._group_upload_cache.reset()
        try:
            jax.clear_caches()
        except Exception:
            pass
        for reset in (
            lambda: jax.extend.backend.clear_backends(),
            lambda: jax.lib.xla_bridge.get_backend.cache_clear(),
        ):
            try:
                reset()
                break
            except Exception:
                continue
        if self.mesh is not None:
            # the old mesh holds device handles from the dead backend
            from ..parallel import make_mesh

            self.mesh = make_mesh(
                self.config.data_parallel_chunks,
                self.config.tensor_parallel,
                n_sp=self.config.sequence_parallel,
            )
        self.params = jax.device_put(self._host_params)
        self._step_cache.clear()
        if self.moge is not None:
            if self.mesh is not None:
                self.moge.shard_params(self.mesh)
            else:
                self.moge.reset()

    def process_and_save(self, image_paths: List) -> List[str]:
        if not image_paths:
            raise ValueError("image_paths is empty")
        self.target_size = calculate_target_size(image_paths[0], self.config.pixel_limit)
        print(f"Target size: {self.target_size}")

        dataset = ChunkDataset(
            image_paths,
            self.config.chunk_length,
            self.config.overlap,
            self.target_size,
            undistorter=self.undistorter,
        )
        loader = PrefetchLoader(dataset, num_workers=self.config.num_loader_workers)

        saved, manifest = [], []
        infer_times, infer_frames, per_chunk_fps = [], [], []
        emit_times: List[float] = []
        print(f"Processing {len(dataset)} chunks...")

        def emit(chunk_idx, batch, result):
            out_name = f"chunk_{chunk_idx:06d}.npz"
            out_path = os.path.join(self.chunks_dir, out_name)
            m = result.pop("_metrics")
            infer_times.append(m["infer_s"])
            infer_frames.append(m["num_frames"])
            # pipeline rate = frames / inter-completion period (correct under
            # any dispatch depth; dispatch->finish latency spans the whole
            # in-flight window and would under-report a deep pipeline). The
            # first chunk has no predecessor: use its dispatch latency.
            now = time.time()
            per_chunk_fps.append(
                m["num_frames"] / max(now - emit_times[-1], 1e-9)
                if emit_times
                else m["fps"]
            )
            emit_times.append(now)
            result["chunk_index"] = chunk_idx
            result["start_idx"] = batch["start"]
            result["end_idx"] = batch["end"]
            from ..io.npz import save_npz

            save_npz(out_path, self.config.chunk_compression, **result)
            saved.append(out_path)
            manifest.append(
                {
                    "chunk_index": chunk_idx,
                    "file": out_name,
                    "start_idx": batch["start"],
                    "end_idx": batch["end"],
                    "num_frames": m["num_frames"],
                    "image_paths": list(batch["paths"]),
                }
            )
            print(f"   saved {out_path}")

        run_t0 = time.time()
        dp = max(1, self.config.data_parallel_chunks) if self.mesh is not None else 1
        if dp > 1 and self.config.keypoint_type == "none":
            print(
                "dense mode (--keypoints none) processes chunks singly: the "
                "sharded step exports keypoint-sparse outputs only; dp disabled"
            )
        group: List[Dict] = []
        profiled = {"done": False}  # one --profile-dir trace per run
        flush_count = {"n": 0}

        # dp groups pipeline 1-deep like single chunks: the next group's
        # sharded step runs while the host writes this group's npz files
        pending_group: List = []  # [(real_batches, padded_batches, dispatched)]

        def finish_group_pending():
            if not pending_group:
                return
            real, padded, disp = pending_group.pop(0)
            try:
                results = self._finish_group(disp)[: len(real)]
            except Exception as e:
                if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                    raise
                print(f"   device failure at group finish ({str(e)[:80]}); resetting, redoing group")
                self._recover_backend()
                results = self._process_chunk_group_with_recovery(padded)[: len(real)]
            for b, r in zip(real, results):
                emit(b["chunk_idx"], b, r)

        def flush_group():
            if not group:
                return
            if (
                self.config.profile_dir is not None
                and not profiled["done"]
                and flush_count["n"] >= 1
            ):
                # profile the 2nd dispatched group: compiled, steady-state
                from ..utils.profiling import trace as profiler_trace

                finish_group_pending()  # isolate the traced group
                with profiler_trace(self.config.profile_dir):
                    _flush_group_now()
                    finish_group_pending()
                profiled["done"] = True
            else:
                _flush_group_now()
            flush_count["n"] += 1

        def _flush_group_now():
            # pad to the dp width by repeating the last chunk: keeps the
            # sharded step's batch shape static (no recompiles) and the
            # (1, ...) batch divisible by the mesh's dp axis
            n_real = len(group)
            padded = group + [group[-1]] * (dp - n_real)
            try:
                disp = self._dispatch_group(padded)
            except Exception as e:
                if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                    raise
                print(f"   device failure at group dispatch ({str(e)[:80]}); resetting backend")
                redo = pending_group.pop(0) if pending_group else None
                self._recover_backend()
                if redo is not None:
                    real_p, padded_p, _ = redo
                    results = self._process_chunk_group_with_recovery(padded_p)[: len(real_p)]
                    for b, r in zip(real_p, results):
                        emit(b["chunk_idx"], b, r)
                disp = self._dispatch_group(padded)
            finish_group_pending()
            pending_group.append((list(group), padded, disp))
            group.clear()

        # dispatch pipeline for the single-chunk path (depth = config
        # dispatch_depth, default 2): up to that many chunks' forwards (and
        # their host->device uploads) stay in flight while the host
        # compresses and writes finished npz files — the device stream never
        # drains across host gaps
        pending: List = []  # [(batch, dispatched)] length <= dispatch_depth

        def finish_pending():
            if not pending:
                return
            b, disp = pending.pop(0)
            try:
                result = self._finish_chunk(disp)
            except Exception as e:
                if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                    print(f"   chunk {b['chunk_idx']} FAILED: {e}; skipping")
                    return
                print(f"   device failure at finish ({str(e)[:80]}); resetting backend, redoing chunk")
                self._recover_backend()
                result = self._process_chunk_with_recovery(b)
            emit(b["chunk_idx"], b, result)

        def drain_pending():
            while pending:
                finish_pending()

        for batch in loader:
            chunk_idx = batch["chunk_idx"]
            out_name = f"chunk_{chunk_idx:06d}.npz"
            out_path = os.path.join(self.chunks_dir, out_name)
            if self.config.resume and os.path.exists(out_path):
                flush_group()
                finish_group_pending()
                drain_pending()
                print(f"   resume: {out_path} exists, skipping")
                saved.append(out_path)
                manifest.append(
                    {
                        "chunk_index": chunk_idx,
                        "file": out_name,
                        "start_idx": batch["start"],
                        "end_idx": batch["end"],
                        "num_frames": batch["images"].shape[0],
                        "image_paths": list(batch["paths"]),
                    }
                )
                continue
            if dp > 1 and self.config.keypoint_type != "none":
                # group chunks for the sharded step; with tail padding any
                # same-resolution chunk is group-compatible (a short tail
                # rides the last group), otherwise only identical shapes
                drain_pending()
                compatible = not group or (
                    group[0]["images"].shape == batch["images"].shape
                    or (
                        self.config.pad_tail_chunks
                        and group[0]["images"].shape[-2:]
                        == batch["images"].shape[-2:]
                    )
                )
                if not compatible:
                    flush_group()
                group.append(batch)
                if len(group) == dp:
                    flush_group()
                continue
            if self.config.keypoint_type == "none":
                # dense chunks carry full-resolution maps; keep them strictly
                # serial (two in-flight dense outputs pressure HBM)
                finish_group_pending()
                drain_pending()
                try:
                    result = self._process_chunk_with_recovery(batch)
                except Exception as e:  # degrade like the reference: report + skip
                    print(f"   chunk {chunk_idx} FAILED: {e}; skipping")
                    continue
                emit(chunk_idx, batch, result)
                continue
            profiling = (
                self.config.profile_dir is not None
                and chunk_idx == 1
                and not profiled["done"]
            )  # chunk 1: compiled, steady-state
            if profiling:
                from ..utils.profiling import trace as profiler_trace

                drain_pending()  # isolate the traced chunk
                with profiler_trace(self.config.profile_dir):
                    result = self._process_chunk_with_recovery(batch)
                emit(chunk_idx, batch, result)
                continue
            try:
                disp = self._dispatch_chunk(batch["images"], batch["paths"])
            except Exception as e:
                if "UNAVAILABLE" not in str(e) and "crashed" not in str(e):
                    drain_pending()
                    print(f"   chunk {chunk_idx} FAILED: {e}; skipping")
                    continue
                # the in-flight chunks died with the backend: redo them
                # synchronously after recovery, then re-dispatch this one
                print(f"   device failure at dispatch ({str(e)[:80]}); resetting backend")
                redos = [b for b, _ in pending]
                pending.clear()
                self._recover_backend()
                for b_prev in redos:
                    result = self._process_chunk_with_recovery(b_prev)
                    emit(b_prev["chunk_idx"], b_prev, result)
                disp = self._dispatch_chunk(batch["images"], batch["paths"])
            pending.append((batch, disp))
            while len(pending) > max(1, self.config.dispatch_depth):
                finish_pending()
        drain_pending()
        flush_group()
        finish_group_pending()

        # wall-clock overall (dispatch latencies overlap under a deep
        # pipeline; summing them would double-count device time)
        total_t = (emit_times[-1] - run_t0) if emit_times else sum(infer_times)
        total_f = sum(infer_frames)
        if total_t > 0:
            print(f"Overall inference: {total_f} frames in {total_t:.2f}s -> {total_f/total_t:.2f} FPS")
        # the final drain finishes the last dispatch_depth-1 in-flight chunks
        # back-to-back: their inter-completion periods are bursts, not rates
        n_drain = max(0, self.config.dispatch_depth - 1)
        rates = per_chunk_fps[: len(per_chunk_fps) - n_drain] if n_drain else per_chunk_fps
        steady = sorted(
            f for f, n in zip(rates, infer_frames) if n == self.config.chunk_length
        )
        if steady:
            print(f"Steady-state FPS (median over full chunks): {steady[len(steady)//2]:.2f}")

        with open(os.path.join(self.config.output_dir, "chunks_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        with open(os.path.join(self.config.output_dir, "chunk_metadata.json"), "w") as f:
            json.dump(
                {
                    "chunk_length": int(self.config.chunk_length),
                    "overlap": int(self.config.overlap),
                    "target_size": list(self.target_size),
                },
                f,
                indent=2,
            )
        print(f"Saved {len(saved)} chunks to {self.chunks_dir}")
        return saved
