"""End-to-end mesh export: --save-dense chunks -> reconstruct -> TSDF mesh.

A synthetic two-chunk sphere scene with per-chunk Sim3 gauge corruption
(incl. scale) goes through the REAL offline reconstructor with
export_mesh=True; the fused mesh must recover the sphere surface in the
aligned (chunk-0 gauge) frame — this exercises alignment, the per-chunk
residual-scale recovery in mapping/fuse.py, overlap skipping, and the
dense-map npz round trip. A second test drives the device chunk step with
return_dense + stride on a tiny Pi3 config.
"""

import json
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.io.mesh import read_mesh_ply
from pi3_slam_tpu.slam.config import ReconstructorConfig
from pi3_slam_tpu.slam.offline_reconstructor import OfflineReconstructor

RADIUS = 1.0
H, W = 48, 64
INTR = np.array([[55.0, 0, W / 2], [0, 55.0, H / 2], [0, 0, 1.0]])


def _look_at_origin(center):
    z = -center / np.linalg.norm(center)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, z)) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])  # world->camera rows


def _render_depth(center, R_wc):
    fx, fy, cx, cy = INTR[0, 0], INTR[1, 1], INTR[0, 2], INTR[1, 2]
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xn = (u - cx) / fx
    yn = (v - cy) / fy
    rc = R_wc @ center
    a = xn**2 + yn**2 + 1.0
    b = 2.0 * (xn * rc[0] + yn * rc[1] + rc[2])
    c0 = float(center @ center) - RADIUS**2
    disc = b**2 - 4 * a * c0
    hit = disc > 0
    s = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    return np.where(hit & (s > 0), s, 0.0).astype(np.float32), hit


def write_sphere_chunks(tmp_path, rng, n_frames=10, chunk_length=6, overlap=2,
                        n_kp=100):
    """Two overlapping chunks of a camera orbit around a unit sphere, each
    in its own corrupted Sim3 gauge, with dense maps. Returns the chunk-0
    gauge (s, R, t) defining the aligned global frame."""
    # landmarks on the sphere for the alignment tracks
    dirs = rng.normal(size=(400, 3))
    landmarks = dirs / np.linalg.norm(dirs, axis=1, keepdims=True) * RADIUS

    centers, rots = [], []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        c = 3.0 * np.array([np.cos(ang), np.sin(ang), 0.3])
        centers.append(c)
        rots.append(_look_at_origin(c))

    from pi3_slam_tpu.data.datasets import chunk_windows

    windows = chunk_windows(n_frames, chunk_length, overlap)
    chunks_dir = tmp_path / "chunks"
    os.makedirs(chunks_dir, exist_ok=True)
    gauges = []
    for ci, (s0, e0) in enumerate(windows):
        frames = list(range(s0, e0))
        nf = len(frames)
        g_s = rng.uniform(0.8, 1.3)
        g_R = Rotation.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
        g_t = rng.normal(size=3) * 0.4
        gauges.append((g_s, g_R, g_t))

        kps = np.zeros((nf, n_kp, 2), np.float32)
        pts = np.zeros((nf, n_kp, 3), np.float32)
        poses = np.tile(np.eye(4), (nf, 1, 1))
        depth = np.zeros((nf, H, W), np.float32)
        conf_logit = np.zeros((nf, H, W, 1), np.float32)
        masks_d = np.zeros((nf, H, W), bool)
        rgb = np.zeros((nf, H, W, 3), np.uint8)
        for j, f in enumerate(frames):
            R, c = rots[f], centers[f]
            cam = (landmarks - c) @ R.T
            z = cam[:, 2]
            uv = np.stack(
                [INTR[0, 0] * cam[:, 0] / z + INTR[0, 2],
                 INTR[1, 1] * cam[:, 1] / z + INTR[1, 2]], axis=1
            )
            # front hemisphere only: the ray must exit through the landmark
            vis = (z > 0.5) & (np.linalg.norm(cam, axis=1) < np.linalg.norm(c)) \
                & (uv[:, 0] > 2) & (uv[:, 0] < W - 2) & (uv[:, 1] > 2) & (uv[:, 1] < H - 2)
            sel_rng = np.random.default_rng(f)
            ids = np.nonzero(vis)[0]
            sel = ids[sel_rng.permutation(len(ids))[:n_kp]]
            sel = np.concatenate([sel, np.repeat(sel[-1:], n_kp - len(sel))])
            kps[j] = uv[sel]
            pts[j] = g_s * landmarks[sel] @ g_R.T + g_t
            poses[j, :3, :3] = g_R @ R.T  # cam->world rotation, corrupted
            poses[j, :3, 3] = g_s * g_R @ c + g_t
            d, hit = _render_depth(c, R)
            depth[j] = d * g_s  # depth in the chunk gauge's metric
            conf_logit[j, ..., 0] = np.where(hit, 4.0, -4.0)
            masks_d[j] = hit
            rgb[j] = np.where(hit[..., None], 200, 20)

        np.savez_compressed(
            chunks_dir / f"chunk_{ci:06d}.npz",
            keypoints=kps.astype(np.float16),
            points=pts.astype(np.float16),
            colors=np.full((nf, n_kp, 3), 128, np.uint8),
            camera_poses=poses.astype(np.float32),
            intrinsics=np.tile(INTR, (nf, 1, 1)).astype(np.float32),
            image_paths=np.asarray([f"frame_{f:04d}.png" for f in frames]),
            original_width=W,
            original_height=H,
            masks=np.ones((nf, n_kp), bool),
            conf=np.full((nf, n_kp, 1), 4.0, np.float16),
            local_points_dense=np.stack(
                [np.zeros_like(depth), np.zeros_like(depth), depth], axis=-1
            ).astype(np.float16),
            conf_dense=conf_logit.astype(np.float16),
            masks_dense=masks_d,
            rgb_dense=rgb,
            dense_stride=np.int16(1),
        )
    with open(tmp_path / "chunk_metadata.json", "w") as f:
        json.dump(
            {"chunk_length": chunk_length, "overlap": overlap,
             "target_size": [H, W]}, f
        )
    return gauges[0]


@pytest.mark.slow
def test_export_mesh_end_to_end(tmp_path, rng):
    g_s, g_R, g_t = write_sphere_chunks(tmp_path, rng)
    out = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=str(tmp_path),
            output_dir=str(tmp_path / "recon"),
            ba_iterations=4,
            align_refine_iterations=10,
            export_mesh=True,
            mesh_voxel_size=0.06 * g_s,
            mesh_preview_views=2,
            save_volume=True,
        )
    ).run()

    from pi3_slam_tpu.mapping import TSDFVolume

    vol = TSDFVolume.load(str(tmp_path / "recon" / "fused_volume.npz"))
    assert (vol.weight > 0).any()

    assert "mesh" in out["artifacts"], "mesh artifact missing"
    # raycast previews rendered from final poses (depth + normal pairs)
    pdir = tmp_path / "recon" / "mesh_previews"
    previews = sorted(os.listdir(pdir))
    assert previews == ["depth_000.png", "depth_001.png",
                        "normal_000.png", "normal_001.png"]
    from PIL import Image

    d0 = np.asarray(Image.open(pdir / "depth_000.png"))
    assert d0.shape == (240, 320) and d0.max() > 0  # sphere visible
    mesh = read_mesh_ply(out["artifacts"]["mesh"])
    verts, faces = mesh["vertices"], mesh["faces"]
    assert len(verts) > 200 and len(faces) > 200

    # the aligned global frame is chunk 0's gauge: sphere center g_t, radius g_s
    r = np.linalg.norm(verts - g_t, axis=1) / g_s
    assert abs(np.median(r) - RADIUS) < 0.12, f"median radius {np.median(r)}"
    assert np.percentile(np.abs(r - RADIUS), 90) < 0.25

    # colors come from the integrated rgb_dense (sphere pixels are 200/255)
    assert mesh["rgb"] is not None
    assert abs(np.median(mesh["rgb"]) - 200) < 30


def test_export_mesh_requires_dense(tmp_path, rng, capsys):
    from test_system_ape import write_synthetic_chunks

    write_synthetic_chunks(tmp_path, rng, n_frames=8, chunk_length=5, overlap=2)
    out = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=str(tmp_path),
            output_dir=str(tmp_path / "recon"),
            ba_iterations=2,
            align_refine_iterations=5,
            export_mesh=True,
        )
    ).run()
    assert "mesh" not in out["artifacts"]
    assert "save-dense" in capsys.readouterr().out


@pytest.mark.slow
def test_chunk_step_returns_strided_dense(rng):
    """Device step with return_dense + stride: strided dense maps alongside
    the sparse keypoint outputs. Only the local map crosses the link — rgb
    and world points are host-recomputable (_host_rgb_dense /
    dense_world_points) and are no longer device outputs."""
    import jax.numpy as jnp

    from pi3_slam_tpu.slam.chunk_creator import (
        _host_rgb_dense, dense_world_points, make_chunk_step,
    )
    from test_pi3_model import TINY, make_tiny_params

    params = make_tiny_params()
    n, h, w = 2, 42, 56
    imgs = jnp.asarray(rng.uniform(size=(1, n, 3, h, w)).astype(np.float32))
    kps = jnp.asarray(
        rng.uniform(low=2, high=40, size=(n, 5, 2)).astype(np.float32)
    )
    step = make_chunk_step(
        TINY, jnp.float32, conf_threshold=0.1, edge_rtol=0.03,
        estimate_intrinsics=False, return_dense=True, dense_stride=2,
    )
    out = step(params, imgs, kps)
    assert out["points_kp"].shape == (n, 5, 3)
    hs, ws = (h + 1) // 2, (w + 1) // 2
    assert "points_dense" not in out and "rgb_dense" not in out
    assert out["local_points_dense"].shape == (n, hs, ws, 3)
    assert out["conf_dense"].shape == (n, hs, ws, 1)
    assert out["masks_dense"].shape == (n, hs, ws)
    # strided maps subsample the full-res ones exactly
    full = make_chunk_step(
        TINY, jnp.float32, conf_threshold=0.1, edge_rtol=0.03,
        estimate_intrinsics=False, return_dense=True, dense_stride=1,
    )(params, imgs, kps)
    np.testing.assert_allclose(
        np.asarray(out["local_points_dense"]),
        np.asarray(full["local_points_dense"])[:, ::2, ::2],
    )
    # host rgb = strided input frames (uint8 inputs: bit-exact)
    rgb = _host_rgb_dense(np.asarray(imgs[0]), n, 2)
    assert rgb.shape == (n, hs, ws, 3) and rgb.dtype == np.uint8
    np.testing.assert_array_equal(
        rgb,
        (np.asarray(imgs[0]).transpose(0, 2, 3, 1)[:, ::2, ::2] * 255.0)
        .clip(0, 255).astype(np.uint8),
    )
    # world = pose @ local (explicit per-pixel transform as the oracle)
    local = rng.standard_normal((2, 3, 4, 3)).astype(np.float32)
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]], np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[1, :3, :3] = R
    poses[:, :3, 3] = [[1, 2, 3], [-1, 0, 5]]
    world = dense_world_points(local, poses)
    expect = np.einsum("nij,nhwj->nhwi", poses[:, :3, :3], local) + poses[
        :, None, None, :3, 3
    ]
    np.testing.assert_allclose(world, expect, rtol=1e-6)
    np.testing.assert_allclose(
        world[1, 0, 0], R @ local[1, 0, 0] + poses[1, :3, 3], rtol=1e-6
    )


def test_fuse_chunks_lazy_loading_and_aligned_bounds_fallback(tmp_path, rng):
    """fuse_chunks accepts zero-arg loaders (streamed, one chunk in RAM at a
    time) and, with too few sparse tracks to bound the volume, falls back to
    back-projecting EVERY chunk's depth under its ALIGNED pose + residual
    scale — not the chunk-local world maps, whose gauge the alignment moved."""
    from types import SimpleNamespace

    from pi3_slam_tpu.mapping.fuse import fuse_chunks

    write_sphere_chunks(tmp_path, rng)
    import glob

    files = sorted(glob.glob(str(tmp_path / "chunks" / "*.npz")))
    loads = []

    def loader(p):
        def _l():
            loads.append(p)
            return dict(np.load(p))

        return _l

    # aligned recons: the TRUE (uncorrupted) global poses, scaled 2x —
    # fuse must recover each chunk's residual scale from baseline ratios
    S = 2.0
    recons = []
    for p in files:
        z = np.load(p)
        n = z["camera_poses"].shape[0]
        start = int(p.split("_")[-1].split(".")[0]) * 4  # stride 6-2
        rots, cens = [], []
        for j in range(n):
            f = start + j
            ang = 2 * np.pi * f / 10
            c = 3.0 * np.array([np.cos(ang), np.sin(ang), 0.3])
            rots.append(_look_at_origin(c))
            cens.append(S * c)
        recons.append(
            SimpleNamespace(
                rotations=np.stack(rots).astype(np.float32),
                centers=np.stack(cens).astype(np.float32),
                points=np.zeros((3, 3), np.float32),  # too few tracks (<100)
                track_valid=np.ones(3, np.float32),
                num_tracks=3,
            )
        )

    vol = fuse_chunks(
        [loader(p) for p in files], recons, overlap=2, voxel_size=S * 0.06
    )
    assert loads, "lazy loaders were never invoked"

    verts, faces, _ = vol.extract_mesh()
    assert len(verts) > 100
    # sphere fused in the aligned frame: centered at origin, radius ~S
    r = np.linalg.norm(verts, axis=1) / S
    assert abs(np.median(r) - RADIUS) < 0.12, f"median radius {np.median(r)}"
    # bounds must cover the whole sphere (every octant meshed), which fails
    # if only the first chunk's field of view bounded the volume
    for sx in (-1, 1):
        for sy in (-1, 1):
            assert ((np.sign(verts[:, 0]) == sx) & (np.sign(verts[:, 1]) == sy)).any()


def _online_slam(tmp_path, **kw):
    from pi3_slam_tpu.slam import OnlineConfig, Pi3SLAMOnline
    from test_pi3_model import TINY, make_tiny_params

    cfg = OnlineConfig(
        chunk_length=4,
        overlap=2,
        pixel_limit=4000,
        use_metric_depth=False,
        max_keypoints=20,
        compute_dtype="float32",
        output_dir=str(tmp_path / "online"),
        **kw,
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    return slam


@pytest.mark.slow
def test_online_save_dense_stashes_chunks(tmp_path):
    """Online --save-dense: every consumed chunk stashes strided dense maps
    to <output>/dense/, and export_mesh() consumes them without crashing
    (random weights: a garbage mesh or a graceful skip are both fine —
    geometry is asserted by the synthetic test below)."""
    import glob
    import os

    from PIL import Image

    d = tmp_path / "frames"
    os.makedirs(d)
    r = np.random.default_rng(5)
    base = r.integers(30, 220, (64, 84, 3)).astype(np.uint8)
    for i in range(8):
        Image.fromarray(np.roll(base, 3 * i, axis=1)).save(d / f"f_{i:04d}.png")

    slam = _online_slam(tmp_path, save_dense=True, export_mesh=True,
                        dense_stride=2)
    paths = sorted(glob.glob(str(d / "*.png")))
    result = slam.process_image_paths(paths)
    assert result["num_chunks"] == 4

    files = sorted(glob.glob(str(tmp_path / "online" / "dense" / "dense_*.npz")))
    assert len(files) == 4
    z = np.load(files[0])
    for key in ("local_points_dense", "conf_dense", "masks_dense", "rgb_dense",
                "camera_poses", "dense_stride"):
        assert key in z.files, key
    n, hs, ws = z["local_points_dense"].shape[:3]
    assert n == 4
    # stride 2 on the resized (14-multiple) frames
    assert hs <= 64 // 2 + 1 and ws <= 84 // 2 + 1
    assert z["rgb_dense"].dtype == np.uint8
    assert int(z["dense_stride"]) == 2

    slam.export_mesh()  # must not raise (skip or mesh both acceptable)

    # a second run must clear the stale stash (index-paired with recons)
    slam2 = _online_slam(tmp_path, save_dense=True, dense_stride=2)
    slam2.process_image_paths(paths[:6])
    files2 = sorted(glob.glob(str(tmp_path / "online" / "dense" / "dense_*.npz")))
    assert len(files2) == len(slam2.reconstructions) == 3  # < first run's 4

    # multi-segment session on ONE instance: the second segment must KEEP
    # the first segment's stashes (they pair with reconstructions by index)
    slam2.process_image_paths(paths[6:])
    files3 = sorted(glob.glob(str(tmp_path / "online" / "dense" / "dense_*.npz")))
    assert len(files3) == len(slam2.reconstructions) > 3


def test_online_export_mesh_geometry(tmp_path, rng):
    """export_mesh fuses the stashed dense maps under the reconstructions'
    FINAL poses: sphere stashes written in corrupted per-chunk gauges +
    aligned recons must mesh the sphere in the aligned frame."""
    import os
    from types import SimpleNamespace

    slam = _online_slam(tmp_path, export_mesh=True, mesh_voxel_size=0.06)

    write_sphere_chunks(tmp_path / "sph", rng)
    import glob
    import shutil

    src = sorted(glob.glob(str(tmp_path / "sph" / "chunks" / "*.npz")))
    ddir = tmp_path / "online" / "dense"
    os.makedirs(ddir)
    recons = []
    for i, p in enumerate(src):
        shutil.copy(p, ddir / f"dense_{i:06d}.npz")
        z = np.load(p)
        n = z["camera_poses"].shape[0]
        start = i * 4
        rots, cens = [], []
        for j in range(n):
            f = start + j
            ang = 2 * np.pi * f / 10
            c = 3.0 * np.array([np.cos(ang), np.sin(ang), 0.3])
            rots.append(_look_at_origin(c))
            cens.append(c)
        recons.append(
            SimpleNamespace(
                rotations=np.stack(rots).astype(np.float32),
                centers=np.stack(cens).astype(np.float32),
                points=np.zeros((3, 3), np.float32),
                track_valid=np.ones(3, np.float32),
                num_tracks=3,
            )
        )
    slam.reconstructions = recons

    path = slam.export_mesh()
    assert path is not None and os.path.exists(path)
    mesh = read_mesh_ply(path)
    r = np.linalg.norm(mesh["vertices"], axis=1)
    assert abs(np.median(r) - RADIUS) < 0.12, f"median radius {np.median(r)}"


def test_online_live_mesh_refresh(tmp_path, rng):
    """_live_mesh_tick re-fuses the stashes under the CURRENT poses on a
    background thread and pushes the surface to the viewer's mesh layer."""
    import glob
    import os
    import shutil
    from types import SimpleNamespace

    slam = _online_slam(tmp_path, live_mesh_every=2, visualize=True,
                        mesh_voxel_size=0.06)
    try:
        write_sphere_chunks(tmp_path / "sph", rng)
        src = sorted(glob.glob(str(tmp_path / "sph" / "chunks" / "*.npz")))
        ddir = tmp_path / "online" / "dense"
        os.makedirs(ddir)
        recons = []
        for i, p in enumerate(src):
            shutil.copy(p, ddir / f"dense_{i:06d}.npz")
            z = np.load(p)
            n = z["camera_poses"].shape[0]
            rots, cens = [], []
            for j in range(n):
                f = i * 4 + j
                ang = 2 * np.pi * f / 10
                c = 3.0 * np.array([np.cos(ang), np.sin(ang), 0.3])
                rots.append(_look_at_origin(c))
                cens.append(c)
            recons.append(SimpleNamespace(
                rotations=np.stack(rots).astype(np.float32),
                centers=np.stack(cens).astype(np.float32),
                points=np.zeros((3, 3), np.float32),
                track_valid=np.ones(3, np.float32),
                num_tracks=3,
            ))
        slam.reconstructions = recons

        slam._live_mesh_tick()
        assert slam._live_mesh_thread is not None
        slam._live_mesh_thread.join(timeout=60)
        assert not slam._live_mesh_thread.is_alive()
        slam.visualizer.flush()

        mesh = slam.visualizer.state.mesh
        assert mesh is not None and len(mesh["vertices"]) > 100
        r = np.linalg.norm(mesh["vertices"], axis=1)
        assert abs(np.median(r) - RADIUS) < 0.15
    finally:
        slam.visualizer.close()
