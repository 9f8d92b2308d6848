"""Dense-mapping tests: TSDF fusion + surface-nets extraction + mesh IO.

Ground truth is an analytic sphere: depth maps are rendered by exact
ray-sphere intersection, so every check (surface radius, outward
normals, watertight topology, integrated color) has a closed form.
"""

import numpy as np
import pytest

from pi3_slam_tpu.io.mesh import read_mesh_ply, write_mesh_ply
from pi3_slam_tpu.mapping import TSDFConfig, fuse_tsdf, surface_nets

RADIUS = 1.0
SPHERE_COLOR = np.array([0.3, 0.6, 0.9])


def _look_at_origin(center):
    z = -center / np.linalg.norm(center)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, z)) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])  # rows: world->camera rotation


def _render_sphere_depth(center, R, intr, h, w, radius=RADIUS):
    """Exact z-depth of the sphere |p| = radius from a pinhole camera."""
    fx, fy, cx, cy = intr
    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xn = (u - cx) / fx
    yn = (v - cy) / fy
    # p_cam = s * (xn, yn, 1); world: R^T p_cam + center
    rc = R @ center
    a = xn**2 + yn**2 + 1.0
    b = 2.0 * (xn * rc[0] + yn * rc[1] + rc[2])
    c0 = float(center @ center) - radius**2
    disc = b**2 - 4 * a * c0
    hit = disc > 0
    s = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    return np.where(hit & (s > 0), s, 0.0)


def _sphere_views(n_views=12, h=60, w=80, dist=3.0):
    intr = np.array([70.0, 70.0, w / 2, h / 2])
    depths, rots, cens, intrs = [], [], [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        elev = 0.35 * np.sin(3 * ang)
        c = dist * np.array(
            [np.cos(ang) * np.cos(elev), np.sin(ang) * np.cos(elev), np.sin(elev)]
        )
        R = _look_at_origin(c)
        depths.append(_render_sphere_depth(c, R, intr, h, w))
        rots.append(R)
        cens.append(c)
        intrs.append(intr)
    return (
        np.stack(depths),
        np.stack(intrs),
        np.stack(rots),
        np.stack(cens),
    )


def _face_normals(verts, faces):
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    return n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-12)


def test_mesh_ply_roundtrip(tmp_path, rng):
    verts = rng.normal(size=(30, 3)).astype(np.float32)
    faces = rng.integers(0, 30, size=(50, 3)).astype(np.int32)
    cols = rng.uniform(size=(30, 3))
    p = str(tmp_path / "m.ply")
    write_mesh_ply(verts, faces, p, colors=cols)
    back = read_mesh_ply(p)
    np.testing.assert_allclose(back["vertices"], verts, atol=1e-6)
    np.testing.assert_array_equal(back["faces"], faces)
    np.testing.assert_allclose(
        back["rgb"], np.clip(cols * 255, 0, 255).astype(np.uint8)
    )
    # out-of-range faces must be rejected
    with pytest.raises(ValueError):
        write_mesh_ply(verts, np.array([[0, 1, 30]]), p)


def test_surface_nets_sphere_geometry():
    """Analytic sphere SDF -> mesh: radius, outward normals, watertightness."""
    n = 33
    g = np.linspace(-1.6, 1.6, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - RADIUS
    vs = g[1] - g[0]
    verts, faces, _ = surface_nets(sdf, origin=np.array([-1.6] * 3), voxel_size=vs)

    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - RADIUS) < vs
    assert r.std() < vs

    # outward normals: every face normal within 60 deg of the radial dir
    nrm = _face_normals(verts, faces)
    centroids = verts[faces].mean(axis=1)
    radial = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    cosang = (nrm * radial).sum(axis=1)
    assert (cosang > 0.5).mean() > 0.99, f"outward fraction {(cosang > 0.5).mean()}"

    # watertight closed surface: every edge shared by exactly two faces
    # with opposite direction, Euler characteristic V - E + F = 2
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    und = np.sort(edges, axis=1)
    uniq, counts = np.unique(und, axis=0, return_counts=True)
    assert (counts == 2).all()
    assert len(verts) - len(uniq) + len(faces) == 2


def test_surface_nets_respects_observed_mask():
    n = 17
    g = np.linspace(-1.5, 1.5, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - RADIUS
    observed = X <= 0  # only half the volume carries data
    verts, faces, _ = surface_nets(
        sdf, origin=np.array([-1.5] * 3), voxel_size=g[1] - g[0], observed=observed
    )
    assert len(verts) > 0
    assert verts[:, 0].max() < 0.2  # nothing extracted in the unobserved half


def test_tsdf_sphere_fusion():
    depths, intrs, rots, cens = _sphere_views()
    colors = np.ones(depths.shape + (3,)) * SPHERE_COLOR
    cfg = TSDFConfig(voxel_size=0.05)
    vol = fuse_tsdf(depths, intrs, rots, cens, colors=colors, config=cfg)

    assert vol.weight.max() > 0
    verts, faces, vcols = vol.extract_mesh()
    assert len(verts) > 200 and len(faces) > 200

    r = np.linalg.norm(verts, axis=1)
    # projective TSDF has a known thin bias; 1.5 voxels is tight enough
    assert abs(np.median(r) - RADIUS) < 1.5 * cfg.voxel_size
    assert np.percentile(np.abs(r - RADIUS), 95) < 3 * cfg.voxel_size

    # integrated color survives fusion
    assert vcols is not None
    np.testing.assert_allclose(np.median(vcols, axis=0), SPHERE_COLOR, atol=0.05)

    # outward normals from the fused (noisier) surface
    nrm = _face_normals(verts, faces)
    centroids = verts[faces].mean(axis=1)
    radial = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    assert ((nrm * radial).sum(axis=1) > 0).mean() > 0.95


def test_tsdf_incremental_matches_oneshot():
    depths, intrs, rots, cens = _sphere_views(n_views=8)
    cfg = TSDFConfig(voxel_size=0.08)
    lo = np.array([-1.5] * 3)
    hi = np.array([1.5] * 3)

    one = fuse_tsdf(depths, intrs, rots, cens, config=cfg, bounds=(lo, hi))
    part = fuse_tsdf(depths[:4], intrs[:4], rots[:4], cens[:4], config=cfg, bounds=(lo, hi))
    part = fuse_tsdf(depths[4:], intrs[4:], rots[4:], cens[4:], config=cfg, volume=part)

    assert one.shape == part.shape
    np.testing.assert_allclose(part.weight, one.weight, atol=1e-5)
    np.testing.assert_allclose(part.tsdf, one.tsdf, atol=1e-4)


def test_tsdf_voxel_cap_coarsens():
    depths, intrs, rots, cens = _sphere_views(n_views=4, h=24, w=32)
    cfg = TSDFConfig(voxel_size=0.01, max_voxels=40**3)
    vol = fuse_tsdf(depths, intrs, rots, cens, config=cfg)
    assert np.prod(vol.shape) <= 40**3
    assert vol.voxel_size > 0.01


def test_tsdf_conf_gating():
    depths, intrs, rots, cens = _sphere_views(n_views=6)
    conf = np.zeros_like(depths)  # everything below threshold
    with pytest.raises(ValueError):
        fuse_tsdf(depths, intrs, rots, cens, conf=conf)


def test_tsdf_unobserved_voxels_keep_free_space_init():
    """Voxels never touched by any observation must keep the +1 free-space
    init — a running-average denominator guard of max(w, eps) would zero
    them onto the isosurface and wrap the scene in phantom surface."""
    depths, intrs, rots, cens = _sphere_views(n_views=4)
    # bounds far larger than the camera orbit: most voxels are never in view
    lo = np.array([-8.0] * 3)
    hi = np.array([8.0] * 3)
    vol = fuse_tsdf(
        depths, intrs, rots, cens, config=TSDFConfig(voxel_size=0.25),
        bounds=(lo, hi),
    )
    unobserved = vol.weight == 0
    assert unobserved.any()
    np.testing.assert_allclose(vol.tsdf[unobserved], 1.0)
    # and extract_mesh(min_weight=0) must not emit phantom sheets at the
    # observed/unobserved boundary far from the true surface
    verts, _, _ = vol.extract_mesh(min_weight=0.0)
    if len(verts):
        assert np.linalg.norm(verts, axis=1).max() < 2.0


def test_sdf_vertex_normals_radial_and_ply_roundtrip(tmp_path):
    """Sphere-SDF gradient normals are radial/outward; normals survive the
    mesh-PLY roundtrip (nx ny nz properties)."""
    from pi3_slam_tpu.mapping import sdf_vertex_normals

    n = 33
    g = np.linspace(-1.6, 1.6, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - RADIUS
    vs = g[1] - g[0]
    origin = np.array([-1.6] * 3)
    verts, faces, _ = surface_nets(sdf, origin=origin, voxel_size=vs)

    nrm = sdf_vertex_normals(sdf, verts, origin=origin, voxel_size=vs)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
    radial = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    cosang = (nrm * radial).sum(axis=1)
    assert cosang.min() > 0.9, f"min cos {cosang.min()}"

    p = str(tmp_path / "m.ply")
    write_mesh_ply(verts, faces, p, normals=nrm)
    back = read_mesh_ply(p)
    np.testing.assert_allclose(back["normals"], nrm, atol=1e-6)
    assert back["rgb"] is None

    # fused-volume convenience: same normals through TSDFVolume
    depths, intrs, rots, cens = _sphere_views(n_views=8)
    vol = fuse_tsdf(depths, intrs, rots, cens, config=TSDFConfig(voxel_size=0.06))
    v2, f2, _ = vol.extract_mesh()
    n2 = vol.vertex_normals(v2)
    r2 = v2 / np.linalg.norm(v2, axis=1, keepdims=True)
    assert ((n2 * r2).sum(axis=1) > 0.7).mean() > 0.97


def test_tsdf_sharded_matches_single_device():
    """Voxel-sharded fusion over an 8-device mesh (flat state split on dp,
    frames replicated, zero collectives) equals single-device fusion —
    including when the shard count does not divide the voxel count (the
    padded tail voxels are sliced off)."""
    import jax
    from jax.sharding import Mesh

    depths, intrs, rots, cens = _sphere_views(n_views=6, h=24, w=32)
    colors = np.ones(depths.shape + (3,)) * SPHERE_COLOR
    cfg = TSDFConfig(voxel_size=0.11)  # odd grid: V % 8 != 0
    lo = np.array([-1.5] * 3)
    hi = np.array([1.5] * 3)

    one = fuse_tsdf(depths, intrs, rots, cens, colors=colors, config=cfg,
                    bounds=(lo, hi))
    assert (np.prod(one.shape)) % 8 != 0, "test wants a non-dividing V"

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = fuse_tsdf(depths, intrs, rots, cens, colors=colors, config=cfg,
                        bounds=(lo, hi), mesh=mesh)
    assert sharded.shape == one.shape
    np.testing.assert_allclose(sharded.weight, one.weight, atol=1e-5)
    np.testing.assert_allclose(sharded.tsdf, one.tsdf, atol=1e-5)
    np.testing.assert_allclose(sharded.color, one.color, atol=1e-5)

    # incremental sharded fusion continues an existing (unsharded) volume
    more = fuse_tsdf(depths[:3], intrs[:3], rots[:3], cens[:3], colors=colors[:3],
                     config=cfg, volume=sharded, mesh=mesh)
    ref = fuse_tsdf(depths[:3], intrs[:3], rots[:3], cens[:3], colors=colors[:3],
                    config=cfg, volume=one)
    np.testing.assert_allclose(more.tsdf, ref.tsdf, atol=1e-5)


def test_raycast_depth_matches_analytic_sphere():
    """Fuse the sphere, then raycast a NOVEL view: rendered z-depth must
    match the exact ray-sphere depth within ~1.5 voxels on hit pixels, the
    hit mask must match the analytic silhouette, and normals point outward."""
    from pi3_slam_tpu.mapping import raycast_depth

    depths, intrs, rots, cens = _sphere_views(n_views=12)
    cfg = TSDFConfig(voxel_size=0.04)
    vol = fuse_tsdf(depths, intrs, rots, cens, config=cfg,
                    bounds=(np.array([-1.5] * 3), np.array([1.5] * 3)))

    # novel camera not in the fused set
    h, w = 50, 70
    intr = np.array([80.0, 80.0, w / 2, h / 2])
    c = 3.0 * np.array([np.cos(0.37), np.sin(0.37), 0.21])
    R = _look_at_origin(c)
    out = raycast_depth(vol, intr, R, c, h, w)

    gt = _render_sphere_depth(c, R, intr, h, w)
    gt_hit = gt > 0
    # silhouette: allow a 1-pixel band of disagreement at the limb
    interior = np.zeros_like(gt_hit)
    interior[1:-1, 1:-1] = (
        gt_hit[1:-1, 1:-1] & gt_hit[:-2, 1:-1] & gt_hit[2:, 1:-1]
        & gt_hit[1:-1, :-2] & gt_hit[1:-1, 2:]
    )
    assert (out["mask"][interior]).mean() > 0.98
    err = np.abs(out["depth"] - gt)[interior & out["mask"]]
    assert np.median(err) < 1.5 * cfg.voxel_size, float(np.median(err))
    assert np.percentile(err, 90) < 3 * cfg.voxel_size

    # normals on hits: outward radial
    hit = interior & out["mask"]
    pts = out["points"][hit]
    radial = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    cosang = (out["normals"][hit] * radial).sum(axis=1)
    assert (cosang > 0.8).mean() > 0.95

    # rays that never touch the surface miss cleanly
    assert not out["mask"][0, 0] and out["depth"][0, 0] == 0.0


def test_tsdf_volume_save_load_roundtrip(tmp_path):
    """Volume npz roundtrip: the reloaded volume re-extracts an equivalent
    mesh and raycasts identically (within the f16 storage quantization)."""
    from pi3_slam_tpu.mapping import TSDFVolume, raycast_depth

    depths, intrs, rots, cens = _sphere_views(n_views=8)
    colors = np.ones(depths.shape + (3,)) * SPHERE_COLOR
    vol = fuse_tsdf(depths, intrs, rots, cens, colors=colors,
                    config=TSDFConfig(voxel_size=0.06))
    p = str(tmp_path / "vol.npz")
    vol.save(p)
    back = TSDFVolume.load(p)

    assert back.shape == vol.shape
    assert back.voxel_size == vol.voxel_size
    np.testing.assert_allclose(back.tsdf, vol.tsdf, atol=2e-3)  # f16 storage
    v1, f1, c1 = vol.extract_mesh()
    v2, f2, c2 = back.extract_mesh()
    assert abs(len(v1) - len(v2)) < 0.02 * len(v1) + 5
    np.testing.assert_allclose(np.median(c2, axis=0), SPHERE_COLOR, atol=0.05)

    h, w = 30, 40
    intr = np.array([40.0, 40.0, w / 2, h / 2])
    c = 3.0 * np.array([1.0, 0.2, 0.1])
    R = _look_at_origin(c)
    d1 = raycast_depth(vol, intr, R, c, h, w)
    d2 = raycast_depth(back, intr, R, c, h, w)
    both = d1["mask"] & d2["mask"]
    assert both.mean() > 0.1
    assert np.abs(d1["depth"] - d2["depth"])[both].max() < 0.02


def test_render_tsdf_cli(tmp_path):
    """tools/render_tsdf.py renders orbit views of a saved volume."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import render_tsdf as cli

    depths, intrs, rots, cens = _sphere_views(n_views=8)
    vol = fuse_tsdf(depths, intrs, rots, cens, config=TSDFConfig(voxel_size=0.06))
    p = str(tmp_path / "vol.npz")
    vol.save(p)

    out = str(tmp_path / "renders")
    rc = cli.main(["--volume", p, "--views", "2", "--height", "40",
                   "--width", "50", "--output", out])
    assert rc == 0
    import os

    assert sorted(os.listdir(out)) == ["depth_000.png", "depth_001.png",
                                       "normal_000.png", "normal_001.png"]
    from PIL import Image

    d = np.asarray(Image.open(os.path.join(out, "depth_000.png")))
    assert d.max() > 0  # the sphere is visible from the orbit
