"""TSDF fusion of depth maps into a voxel volume — TPU-native.

KinectFusion-style projective truncated-signed-distance integration
(Newcombe et al. 2011), mapped onto the TPU the XLA way: the voxel grid
is a static-shape (V, 3) array, each frame's update is one (V, 3) @
(3, 3) matmul (MXU) + a row gather from the packed per-pixel attribute
table [depth | conf | rgb] (the table is a few MB — VMEM-resident inside
the fusion loop), and frames integrate under ``lax.scan``. No Python
per-voxel/per-frame control flow, no dynamic shapes, no scatter (the
voxel->pixel direction makes the update a pure gather).

The reference has no dense-mapping subsystem (point-cloud export only,
pi3/utils/basic.py:377-459); this consumes the dense per-pixel maps its
chunks already carry (slam/offline_chunk_creator.py stores pointmaps per
chunk) and goes one step further to a fused surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TSDFConfig:
    voxel_size: float = 0.02
    # truncation band in meters; default 4 voxels
    trunc: Optional[float] = None
    # observations with sigmoid-confidence below this carry no weight
    conf_threshold: float = 0.25
    depth_min: float = 1e-3
    depth_max: float = 1e4
    # memory/runtime cap: if the requested bounds need more voxels, the
    # voxel size is coarsened to fit (isotropically)
    max_voxels: int = 192**3

    @property
    def trunc_dist(self) -> float:
        return self.trunc if self.trunc is not None else 4.0 * self.voxel_size


@dataclass
class TSDFVolume:
    """Fused volume. tsdf is normalized to [-1, 1] (units of trunc_dist);
    weight > 0 marks observed voxels."""

    tsdf: np.ndarray  # (X, Y, Z) f32
    weight: np.ndarray  # (X, Y, Z) f32
    color: np.ndarray  # (X, Y, Z, 3) f32 in [0, 1]
    origin: np.ndarray  # (3,) world coords of voxel (0, 0, 0) center
    voxel_size: float
    trunc_dist: float
    # per-instance caches (device copy of the flat tsdf for raycasting,
    # host SDF gradient for normals) — filled lazily, never compared
    _cache: dict = None  # type: ignore[assignment]

    def __post_init__(self):
        if self._cache is None:
            object.__setattr__(self, "_cache", {})

    def device_tsdf_flat(self):
        """Flat (V,) device copy of the tsdf grid, uploaded once — per-view
        raycasts over the same volume must not re-ship ~27 MB each call
        (the remote-tunnel rule in the project memory)."""
        if "tsdf_dev" not in self._cache:
            import jax.numpy as jnp

            self._cache["tsdf_dev"] = jnp.asarray(
                np.asarray(self.tsdf, np.float32).reshape(-1)
            )
        return self._cache["tsdf_dev"]

    def sdf_gradient(self) -> np.ndarray:
        """(X, Y, Z, 3) host SDF gradient, computed once per volume."""
        if "grad" not in self._cache:
            self._cache["grad"] = np.stack(
                np.gradient(np.asarray(self.tsdf, np.float32)), axis=-1
            )
        return self._cache["grad"]

    def save(self, path: str) -> None:
        """Persist the volume as compressed npz (tsdf/weight f16, color u8)
        — re-mesh at a different min_weight or raycast later without
        re-fusing. ~6x smaller than raw f32."""
        np.savez_compressed(
            path,
            tsdf=self.tsdf.astype(np.float16),
            weight=self.weight.astype(np.float16),
            color=np.clip(self.color * 255.0, 0, 255).astype(np.uint8),
            origin=np.asarray(self.origin, np.float64),
            voxel_size=np.float64(self.voxel_size),
            trunc_dist=np.float64(self.trunc_dist),
        )

    @classmethod
    def load(cls, path: str) -> "TSDFVolume":
        with np.load(path) as z:
            return cls(
                tsdf=z["tsdf"].astype(np.float32),
                weight=z["weight"].astype(np.float32),
                color=z["color"].astype(np.float32) / 255.0,
                origin=z["origin"],
                voxel_size=float(z["voxel_size"]),
                trunc_dist=float(z["trunc_dist"]),
            )

    @property
    def shape(self):
        return self.tsdf.shape

    def extract_mesh(self, min_weight: float = 1.0):
        """Surface-nets mesh of the zero crossing (world coordinates)."""
        from .surface_nets import surface_nets

        return surface_nets(
            self.tsdf,
            level=0.0,
            origin=self.origin,
            voxel_size=self.voxel_size,
            observed=self.weight >= min_weight,
            colors=self.color,
        )

    def vertex_normals(self, vertices: np.ndarray) -> np.ndarray:
        """Outward unit normals at mesh vertices from the TSDF gradient."""
        from .surface_nets import sdf_vertex_normals

        return sdf_vertex_normals(
            self.tsdf, vertices, origin=self.origin,
            voxel_size=self.voxel_size, grad=self.sdf_gradient(),
        )


def auto_bounds(points: np.ndarray, margin: float) -> tuple[np.ndarray, np.ndarray]:
    """Robust world-space bounds from surface points: 1st/99th percentile
    box (per axis) padded by `margin` — outlier depths do not blow up the
    grid."""
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    pts = pts[np.isfinite(pts).all(axis=1)]
    if pts.shape[0] == 0:
        raise ValueError("no finite points to bound the TSDF volume")
    lo = np.percentile(pts, 1.0, axis=0) - margin
    hi = np.percentile(pts, 99.0, axis=0) + margin
    return lo, hi


def _grid_from_bounds(lo, hi, cfg: TSDFConfig):
    """(origin, dims, voxel_size): coarsen isotropically to fit max_voxels."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    extent = np.maximum(hi - lo, 1e-6)
    vs = float(cfg.voxel_size)
    dims = np.maximum(np.ceil(extent / vs).astype(int) + 1, 2)
    while int(np.prod(dims)) > cfg.max_voxels:
        vs *= max((float(np.prod(dims)) / cfg.max_voxels) ** (1.0 / 3.0), 1.02)
        dims = np.maximum(np.ceil(extent / vs).astype(int) + 1, 2)
    return lo, tuple(int(d) for d in dims), vs


def _fuse_frames_body(
    state,
    frames,
    origin,
    voxel_size,
    trunc_dist,
    conf_threshold,
    depth_min,
    depth_max,
    dims,
    height,
    width,
    v_base=0,
):
    """Integrate a batch of frames into (tsdf, weight, color) flat state.

    frames: tuple of per-frame stacked arrays —
      depth (F, H, W), conf (F, H, W), rgb (F, H, W, 3),
      intr (F, 4) fx fy cx cy, rot (F, 3, 3) world->cam, center (F, 3).
    state leaves cover flat voxel indices [v_base, v_base + len); padded
    tail voxels past X*Y*Z integrate garbage that callers slice off.
    """
    X, Y, Z = dims
    V = state[0].shape[0]
    # voxel center world coords, built in-graph (no host transfer); flat
    # iota + div/mod so a shard can address its own global index range
    idx = jax.lax.iota(jnp.int32, V) + v_base
    vx = (idx // (Y * Z)).astype(jnp.float32)
    vy = ((idx // Z) % Y).astype(jnp.float32)
    vz = (idx % Z).astype(jnp.float32)
    p_w = jnp.stack([vx, vy, vz], axis=-1) * voxel_size + origin

    def step(carry, fr):
        tsdf, weight, color = carry
        depth, conf, rgb, intr, rot, center = fr
        # camera-frame voxel coords: one (V, 3) x (3, 3) matmul. HIGHEST
        # precision: the TPU default is bf16 passes, whose ~2cm rounding at
        # 5m would be on the order of the voxel size itself (CLAUDE.md's
        # f32-for-geometry rule)
        f32 = jax.lax.Precision.HIGHEST
        pc = jnp.matmul(p_w, rot.T, precision=f32) - jnp.matmul(
            rot, center, precision=f32
        )[None, :]
        z = pc[:, 2]
        zsafe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        u = intr[0] * pc[:, 0] / zsafe + intr[2]
        v = intr[1] * pc[:, 1] / zsafe + intr[3]
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = (z > depth_min) & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
        lin = jnp.clip(vi, 0, height - 1) * width + jnp.clip(ui, 0, width - 1)

        # packed per-pixel table [depth, conf, r, g, b]: one row gather
        tab = jnp.concatenate(
            [depth[..., None], conf[..., None], rgb], axis=-1
        ).reshape(height * width, 5)
        g = jnp.take(tab, lin, axis=0)
        d = g[:, 0]
        sdf = (d - z) / trunc_dist
        w_obs = jnp.where(
            inb
            & (d > depth_min)
            & (d < depth_max)
            & (g[:, 1] >= conf_threshold)
            & (sdf > -1.0),
            g[:, 1],
            0.0,
        )
        sdf = jnp.minimum(sdf, 1.0)

        w_new = weight + w_obs
        denom = jnp.maximum(w_new, 1e-9)
        # never-observed voxels must keep the +1 free-space init (w_new=0
        # would otherwise zero them onto the isosurface)
        tsdf = jnp.where(
            w_new > 0.0, (tsdf * weight + sdf * w_obs) / denom, tsdf
        )
        color = (color * weight[:, None] + g[:, 2:5] * w_obs[:, None]) / denom[:, None]
        return (tsdf, w_new, color), None

    state, _ = jax.lax.scan(step, state, frames)
    return state


_fuse_frames = partial(jax.jit, static_argnames=("dims", "height", "width"))(
    _fuse_frames_body
)


@lru_cache(maxsize=8)
def _fuse_frames_sharded(mesh, axis: str, dims, height, width):
    """Voxel-sharded fusion over a device mesh axis: the flat (V,) state is
    split across devices, the per-frame pixel table is replicated (a few MB),
    and each shard integrates its own voxel range — embarrassingly parallel,
    ZERO steady-state collectives (the voxel->pixel gather direction never
    crosses shards). The TPU-native scaling story for dense mapping.
    Cached so multi-chunk fusion reuses one compiled program per grid."""
    from jax.sharding import PartitionSpec as P

    def local(state, frames, origin, voxel_size, trunc_dist,
              conf_threshold, depth_min, depth_max):
        v_base = jax.lax.axis_index(axis) * state[0].shape[0]
        return _fuse_frames_body(
            state, frames, origin, voxel_size, trunc_dist,
            conf_threshold, depth_min, depth_max,
            dims, height, width, v_base=v_base,
        )

    from jax.experimental.shard_map import shard_map

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(
                (P(axis), P(axis), P(axis)),  # tsdf, weight, color
                (P(), P(), P(), P(), P(), P()),  # frames replicated
                P(), P(), P(), P(), P(), P(),
            ),
            out_specs=(P(axis), P(axis), P(axis)),
        )
    )


def fuse_tsdf(
    depth: np.ndarray,
    intrinsics: np.ndarray,
    rotations: np.ndarray,
    centers: np.ndarray,
    colors: Optional[np.ndarray] = None,
    conf: Optional[np.ndarray] = None,
    config: TSDFConfig = TSDFConfig(),
    bounds: Optional[tuple] = None,
    volume: Optional[TSDFVolume] = None,
    mesh=None,
    mesh_axis: str = "dp",
) -> TSDFVolume:
    """Fuse (F, H, W) depth maps into a TSDF volume.

    depth: z-depth in the camera frame (camera looks down +z, the Pi3
    convention); intrinsics (F, 4) fx fy cx cy; rotations (F, 3, 3)
    world->camera; centers (F, 3) camera centers (world).
    colors (F, H, W, 3) in [0, 1]; conf (F, H, W) in [0, 1] (weights the
    update and gates at config.conf_threshold; invalid pixels = 0).
    bounds: optional (lo, hi) world box; auto-computed from the
    back-projected depths otherwise. volume: continue integrating into an
    existing volume (incremental / multi-chunk use; its grid wins).
    mesh: optional jax.sharding.Mesh — the flat voxel state is sharded
    over `mesh_axis` (frames replicated, zero steady-state collectives);
    results are numerically identical to single-device fusion.
    """
    depth = np.asarray(depth, np.float32)
    F, H, W = depth.shape
    intr = np.asarray(intrinsics, np.float32).reshape(F, 4)
    rot = np.asarray(rotations, np.float32).reshape(F, 3, 3)
    cen = np.asarray(centers, np.float32).reshape(F, 3)
    rgb = (
        np.zeros((F, H, W, 3), np.float32)
        if colors is None
        else np.asarray(colors, np.float32)
    )
    cf = np.ones((F, H, W), np.float32) if conf is None else np.asarray(conf, np.float32)
    cf = np.where(np.isfinite(depth) & (depth > 0), cf, 0.0)
    depth = np.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0)

    n_shards = int(mesh.shape[mesh_axis]) if mesh is not None else 1
    if volume is None:
        if bounds is None:
            bounds = auto_bounds(
                _backproject_sample(depth, cf, intr, rot, cen, config),
                margin=config.trunc_dist * 2,
            )
        origin, dims, vs = _grid_from_bounds(bounds[0], bounds[1], config)
        X, Y, Z = dims
        V = X * Y * Z
        Vp = -(-V // n_shards) * n_shards  # pad so the shard axis divides
        state = (
            jnp.ones(Vp, jnp.float32),  # tsdf init: +1 (free/unseen ahead)
            jnp.zeros(Vp, jnp.float32),
            jnp.zeros((Vp, 3), jnp.float32),
        )
        trunc = config.trunc_dist if config.voxel_size == vs else max(
            config.trunc_dist, 4.0 * vs
        )
    else:
        origin = np.asarray(volume.origin, np.float64)
        dims = volume.shape
        vs = volume.voxel_size
        trunc = volume.trunc_dist
        V = int(np.prod(dims))
        Vp = -(-V // n_shards) * n_shards
        pad = Vp - V
        state = (
            jnp.asarray(np.pad(volume.tsdf.reshape(V), (0, pad), constant_values=1.0)),
            jnp.asarray(np.pad(volume.weight.reshape(V), (0, pad))),
            jnp.asarray(np.pad(volume.color.reshape(V, 3), ((0, pad), (0, 0)))),
        )

    frames = (
        jnp.asarray(depth),
        jnp.asarray(cf),
        jnp.asarray(rgb),
        jnp.asarray(intr),
        jnp.asarray(rot),
        jnp.asarray(cen),
    )
    scalars = (
        jnp.asarray(np.asarray(origin, np.float32)),
        jnp.float32(vs),
        jnp.float32(trunc),
        jnp.float32(config.conf_threshold),
        jnp.float32(config.depth_min),
        jnp.float32(config.depth_max),
    )
    if mesh is None:
        state = _fuse_frames(state, frames, *scalars, tuple(dims), H, W)
    else:
        state = _fuse_frames_sharded(mesh, mesh_axis, tuple(dims), H, W)(
            state, frames, *scalars
        )
    X, Y, Z = dims
    V = X * Y * Z  # drop shard-padding voxels, if any
    return TSDFVolume(
        tsdf=np.asarray(state[0])[:V].reshape(X, Y, Z),
        weight=np.asarray(state[1])[:V].reshape(X, Y, Z),
        color=np.asarray(state[2])[:V].reshape(X, Y, Z, 3),
        origin=np.asarray(origin, np.float64),
        voxel_size=float(vs),
        trunc_dist=float(trunc),
    )


def _backproject_sample(depth, conf, intr, rot, cen, cfg, max_per_frame=2048):
    """Strided unprojection of valid depths to world points (bounds probe)."""
    F, H, W = depth.shape
    stride = max(1, int(np.sqrt(H * W / max_per_frame)))
    vs, us = np.meshgrid(
        np.arange(0, H, stride), np.arange(0, W, stride), indexing="ij"
    )
    pts = []
    for f in range(F):
        d = depth[f, vs, us]
        ok = (
            (conf[f, vs, us] >= cfg.conf_threshold)
            & (d > cfg.depth_min)
            & (d < cfg.depth_max)
        )
        if not ok.any():
            continue
        fx, fy, cx, cy = intr[f]
        x = (us[ok] - cx) / fx * d[ok]
        y = (vs[ok] - cy) / fy * d[ok]
        pc = np.stack([x, y, d[ok]], axis=-1)
        pts.append(pc @ rot[f] + cen[f])  # R^T @ pc + c, row-vector form
    if not pts:
        raise ValueError("no valid depth samples to bound the TSDF volume")
    return np.concatenate(pts)
