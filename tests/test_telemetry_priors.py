"""Gravity / GPS BA constraints (sfm/priors.py + ba.py gravity residual).

These implement the reference's own unimplemented roadmap
(/root/reference/README.md TODO: gravity residuals, GPS residuals) on top
of the telemetry importers the reference ships but never wires into BA.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.sfm.ba import bundle_adjust, make_problem
from pi3_slam_tpu.sfm.priors import (
    estimate_world_gravity,
    fit_sim3_to_gps,
    geodetic_to_enu,
    gps_priors,
    gravity_priors,
)
from pi3_slam_tpu.utils.telemetry import TelemetryData, TelemetryImporter

from test_ba import make_scene


def _importer(grav=None, gps=None):
    imp = TelemetryImporter()
    t = TelemetryData()
    if grav is not None:
        t.grav_t, t.grav = grav
    if gps is not None:
        t.gps_t, t.gps = gps
    imp.telemetry = t
    return imp


def test_geodetic_to_enu_known_offsets():
    # 1e-4 deg of latitude ~ 11.1 m; longitude scaled by cos(lat)
    origin = np.array([48.0, 11.0, 500.0])
    lla = np.array([
        origin,
        [48.0001, 11.0, 500.0],
        [48.0, 11.0001, 500.0],
        [48.0, 11.0, 510.0],
    ])
    enu, org = geodetic_to_enu(lla)
    np.testing.assert_allclose(enu[0], 0.0, atol=1e-9)
    assert abs(enu[1, 1] - 11.11) < 0.1 and abs(enu[1, 0]) < 1e-6
    assert abs(enu[2, 0] - 11.13 * np.cos(np.radians(48.0))) < 0.1
    np.testing.assert_allclose(enu[3], [0, 0, 10.0], atol=1e-9)


def test_gravity_priors_interp_and_range(rng):
    # constant gravity along -z of the sensor, stream covering t in [1, 2]
    ts = np.linspace(1.0, 2.0, 11)
    g = np.tile([0.0, 0.0, -9.81], (11, 1))
    imp = _importer(grav=(ts, g))
    dirs, w = gravity_priors(imp, np.array([0.5, 1.5, 2.5]), sigma=0.1)
    assert w[0] == 0.0 and w[2] == 0.0 and w[1] == pytest.approx(100.0)
    np.testing.assert_allclose(dirs[1], [0, 0, -1.0], atol=1e-6)


def test_estimate_world_gravity_recovers_axis(rng):
    g_w = np.array([0.1, -0.2, -0.97])
    g_w /= np.linalg.norm(g_w)
    R = Rotation.random(20, random_state=0).as_matrix()
    g_cam = np.einsum("nij,j->ni", R, g_w)
    est = estimate_world_gravity(R, g_cam)
    np.testing.assert_allclose(est, g_w, atol=1e-6)


def test_ba_gravity_residual_fixes_orientation_drift(rng):
    """Cameras with pixel-noise observations and rotation perturbations:
    gravity residuals pull R_cw g_w back onto the measured directions."""
    s = make_scene(rng, n_frames=6, n_tracks=80, noise_px=0.3)
    g_w = np.array([0.0, -1.0, 0.0])  # scene y-down, arbitrary
    g_cam = np.einsum("nij,j->ni", s["rotations"], g_w)  # true measurements

    pert = dict(s)
    rot_noise = Rotation.from_rotvec(
        rng.normal(size=(len(s["rotations"]), 3)) * 0.03
    ).as_matrix()
    pert["rotations"] = np.einsum("nij,njk->nik", rot_noise, s["rotations"])

    def grav_err(rots):
        pred = np.einsum("nij,j->ni", np.asarray(rots), g_w)
        return np.linalg.norm(pred - g_cam, axis=1).mean()

    before = grav_err(pert["rotations"])

    prob = make_problem(
        **pert, gravity_dirs=g_cam,
        gravity_weight=np.full(len(g_cam), 1e4), gravity_world=g_w,
    )
    out = bundle_adjust(prob, iterations=15, huber_delta=2.0)
    after = grav_err(out.rotations)
    assert after < before * 0.2, (before, after)
    # and with weight 0 nothing is constrained (regression: field plumbing)
    prob0 = make_problem(**pert)
    out0 = bundle_adjust(prob0, iterations=3, huber_delta=2.0)
    assert np.isfinite(np.asarray(out0.rotations)).all()


def test_gps_priors_and_sim3_fit(rng):
    # GPS track: straight line northward, 1 fix/s over [0, 10]
    ts = np.linspace(0.0, 10.0, 11)
    lla = np.stack([
        48.0 + 1e-5 * ts, np.full_like(ts, 11.0), 500.0 + 0.0 * ts
    ], axis=1)
    imp = _importer(gps=(ts, lla))
    frame_t = np.array([-1.0, 2.0, 5.0, 8.0, 12.0])
    enu, w, origin = gps_priors(imp, frame_t, sigma=2.0)
    assert w[0] == 0.0 and w[-1] == 0.0 and (w[1:4] > 0).all()
    # monotone northward motion, ~1.11 m/s
    assert enu[2, 1] > enu[1, 1] > 0

    # reconstruction frame = ENU rotated+scaled+shifted; fit recovers it
    rot = Rotation.from_euler("z", 0.7).as_matrix()
    centers_rec = (enu @ rot.T) * 0.5 + np.array([3.0, -2.0, 1.0])
    s3 = fit_sim3_to_gps(centers_rec, enu, weights=w)
    assert s3 is not None
    got = np.asarray(s3.scale) * centers_rec @ np.asarray(s3.rotation).T + np.asarray(
        s3.translation
    )
    np.testing.assert_allclose(got[1:4], enu[1:4], atol=1e-3)

    # degenerate: fewer than 3 constrained frames
    assert fit_sim3_to_gps(centers_rec[:2], enu[:2]) is None
    # degenerate: near-stationary GPS track (scale would collapse to ~0)
    assert fit_sim3_to_gps(centers_rec, np.zeros_like(enu) + 0.01) is None


def test_offline_reconstructor_telemetry_georeference(tmp_path, rng):
    """End-to-end: chunked synthetic scene + generic-JSON telemetry ->
    reconstruction is georeferenced into the ENU/GT frame (no Sim3 needed to
    score it) and gravity-refined."""
    import json

    from scipy.spatial.transform import Rotation as Rot

    from pi3_slam_tpu.slam import OfflineReconstructor, ReconstructorConfig
    from pi3_slam_tpu.sfm.priors import _A, _E2
    from pi3_slam_tpu.io import read_tum_trajectory
    from pi3_slam_tpu.utils.evaluation import ape_translation

    from test_system_ape import write_synthetic_chunks

    n_frames, yaw_rate = 14, 0.02
    # frame names carry millisecond timestamps: frame i at t = 0.1 i s
    gt_centers = write_synthetic_chunks(
        tmp_path, rng, n_frames=n_frames, yaw_rate=yaw_rate,
        frame_name_fn=lambda i: f"{i * 100:013d}.png",
    )
    rots_wc = [Rot.from_euler("y", yaw_rate * i).as_matrix() for i in range(n_frames)]

    # telemetry at 50 Hz covering the sequence; ENU == the GT world frame
    ts = np.arange(0.0, 0.1 * n_frames + 0.1, 0.02)
    c_interp = np.stack(
        [np.interp(ts, 0.1 * np.arange(n_frames), gt_centers[:, i]) for i in range(3)],
        axis=1,
    )
    lat0, lon0, alt0 = 48.0, 11.0, 500.0
    s = np.sin(np.radians(lat0))
    rn = _A / np.sqrt(1.0 - _E2 * s * s)
    rm = _A * (1.0 - _E2) / (1.0 - _E2 * s * s) ** 1.5
    lat = lat0 + np.degrees(c_interp[:, 1] / rm)
    lon = lon0 + np.degrees(c_interp[:, 0] / (rn * np.cos(np.radians(lat0))))
    alt = alt0 + c_interp[:, 2]

    # ENU up is +z by construction, so physical gravity is -z — and the
    # refine holds g_world FIXED at -z after georeferencing, so the
    # synthetic measurements must be ENU-consistent
    g_w = np.array([0.0, 0.0, -1.0])
    rot_interp_idx = np.clip((ts / 0.1).round().astype(int), 0, n_frames - 1)
    grav = np.stack([rots_wc[i].T @ g_w for i in rot_interp_idx])

    telem = {
        "gps": np.stack([ts, lat, lon, alt], axis=1).tolist(),
        "gravity": np.concatenate([ts[:, None], grav], axis=1).tolist(),
    }
    tpath = tmp_path / "telemetry.json"
    tpath.write_text(json.dumps(telem))

    rec = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=str(tmp_path),
            output_dir=str(tmp_path / "recon"),
            max_observations_per_track=8,
            ba_iterations=10,
            telemetry_path=str(tpath),
            gps_sigma=0.5,
            gravity_sigma=0.05,
        )
    )
    result = rec.run()
    assert result["telemetry"]["gps"] and result["telemetry"]["gravity"]
    assert result["telemetry"]["gps_rms_m"] < 0.25

    traj = read_tum_trajectory(result["artifacts"]["trajectory"])
    # NO alignment: the export must already sit in the ENU==GT frame
    ape = ape_translation(gt_centers, traj["positions"], align_sim3=False)
    assert ape.rmse < 0.15, f"unaligned APE {ape.rmse:.3f} m"


@pytest.mark.slow
def test_online_apply_telemetry_smoke(tmp_path, rng):
    """Online finalization: apply_telemetry() georeferences the accumulated
    reconstructions (gravity-only stream here keeps it light)."""
    from pi3_slam_tpu.slam import OnlineConfig, Pi3SLAMOnline

    import json

    from PIL import Image

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    base = rng.integers(0, 255, (42, 56, 3), dtype=np.uint8)
    paths = []
    for i in range(6):
        p = imgs / f"{i * 100:013d}.png"  # t = 0.1 i s
        Image.fromarray(np.roll(base, i * 2, axis=1)).save(p)
        paths.append(str(p))

    ts = np.arange(0.0, 1.0, 0.05)
    telem = {"gravity": np.stack([ts, 0 * ts, 0 * ts, -np.ones_like(ts)], 1).tolist()}
    tpath = tmp_path / "telem.json"
    tpath.write_text(json.dumps(telem))

    from test_pi3_model import TINY

    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        output_dir=str(tmp_path / "out"), telemetry_path=str(tpath),
        num_loader_workers=0, visualize=False,
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.process_image_paths(paths, pipelined=False)
    stats = slam.apply_telemetry()
    assert stats is not None and stats["gravity"] and not stats["gps"]
    # rotations must still be valid rotation matrices after the refine
    for r in slam.reconstructions:
        rtr = np.einsum("nij,nkj->nik", r.rotations, r.rotations)
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (len(r.rotations), 1, 1)), atol=1e-4)


def test_frame_times_from_video_names():
    """video.mp4#idx frame names map to idx / camera_fps; without an fps the
    caller must skip (treating indices as timestamps pinned everything to
    t=0 — the original defect)."""
    from pi3_slam_tpu.sfm.priors import frame_times_from_names

    ts = np.linspace(0.0, 2.0, 5)
    imp = _importer(grav=(ts, np.tile([0, 0, -1.0], (5, 1))))
    names = [f"go.mp4#{i}" for i in (0, 30, 60)]
    imp.telemetry.camera_fps = 30.0
    got = frame_times_from_names(names, imp)
    np.testing.assert_allclose(got, [0.0, 1.0, 2.0])
    imp.telemetry.camera_fps = 0.0
    assert frame_times_from_names(names, imp) is None
    # image names still go through the filename-timestamp path
    got = frame_times_from_names(["0000000000500.png"], imp)
    np.testing.assert_allclose(got, [0.5])
    # names with no embedded timestamp must NOT fall back to mtime/frame
    # index (not on the telemetry clock -> everything pinned near t=0)
    assert frame_times_from_names(["frame_0001.png"], imp) is None
    assert frame_times_from_names(["0000000000500.png", "frame_2.png"], imp) is None


def test_rotation_aligning_edge_cases(rng):
    from pi3_slam_tpu.sfm.priors import rotation_aligning

    v = np.array([0.3, -0.4, 0.866])
    v /= np.linalg.norm(v)
    # identity for parallel inputs
    np.testing.assert_allclose(rotation_aligning(v, v), np.eye(3), atol=1e-12)
    # generic case: exact mapping, proper rotation
    w = np.array([0.0, 0.0, -1.0])
    R = rotation_aligning(v, w)
    np.testing.assert_allclose(R @ v, w, atol=1e-12)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) == pytest.approx(1.0)
    # antiparallel: still a proper rotation mapping v -> -v
    R = rotation_aligning(v, -v)
    np.testing.assert_allclose(R @ v, -v, atol=1e-12)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) == pytest.approx(1.0)


def test_gravity_only_levels_world_frame(rng):
    """Without GPS the constraint routine must fix the orientation gauge:
    one global rotation levels the consensus gravity axis onto -z, then the
    per-chunk refine holds g_world = -z. A tilted reconstruction therefore
    comes out with its measured gravity mapped to straight down — the
    absolute roll/pitch constraint the docs promise (a per-chunk consensus
    re-estimate would be gauge-invariant and leave the tilt in place)."""
    from scipy.spatial.transform import Rotation as Rot

    from pi3_slam_tpu.sfm.priors import constrain_with_telemetry
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction

    n, k = 6, 40
    # world frame tilted: true gravity axis is 25 degrees off -z
    tilt = Rot.from_euler("x", np.radians(25.0)).as_matrix()
    g_true = tilt @ np.array([0.0, 0.0, -1.0])
    poses = np.tile(np.eye(4), (n, 1, 1))
    rots_cw = []
    for i in range(n):
        R_wc = Rot.from_euler("y", 0.05 * i).as_matrix()
        poses[i, :3, :3] = R_wc
        poses[i, :3, 3] = [0.3 * i, 0.0, 0.0]
        rots_cw.append(R_wc.T)

    pts = rng.normal(size=(n, k, 3)).astype(np.float32) * 0.5 + [0, 0, 5]
    chunk = {
        "keypoints": rng.uniform(50, 400, (n, k, 2)).astype(np.float32),
        "points": pts,
        "colors": np.full((n, k, 3), 0.5, np.float32),
        "camera_poses": poses,
        "original_width": 640,
        "original_height": 480,
        "image_paths": [f"{i * 100:013d}.png" for i in range(n)],  # t=0.1i s
    }
    rec = build_chunk_reconstruction(chunk, ba_iterations=0)

    ts = np.arange(0.0, 0.1 * n + 0.1, 0.02)
    idx = np.clip((ts / 0.1).round().astype(int), 0, n - 1)
    meas = np.stack([rots_cw[i] @ g_true for i in idx])
    imp = _importer(grav=(ts, meas))

    before = estimate_world_gravity(
        rec.rotations, np.stack([rots_cw[i] @ g_true for i in range(n)])
    )
    assert np.linalg.norm(before - [0, 0, -1.0]) > 0.3  # genuinely tilted

    stats = constrain_with_telemetry(
        [rec], imp, gps_sigma=0.0, gravity_sigma=0.02, refine_iterations=5,
    )
    assert stats["gravity"] and stats["refined_chunks"] == 1
    assert any("leveled" in n_ for n_ in stats["notes"])
    # measured gravity now maps to straight down through the refined poses
    pred = np.einsum("nij,j->ni", rec.rotations, [0.0, 0.0, -1.0])
    meas_frames = np.stack([rots_cw[i] @ g_true for i in range(n)])
    np.testing.assert_allclose(pred, meas_frames, atol=5e-2)


def test_video_chunk_frame_names_carry_index():
    """build_chunk_reconstruction names video frames 'video#idx' (unique for
    the name-dedup export, parseable for telemetry timebases) — both for
    in-memory tuples and the (N, 2) string array an npz round-trip yields."""
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction

    n, k = 3, 8
    rng2 = np.random.default_rng(1)
    chunk = {
        "keypoints": rng2.uniform(10, 100, (n, k, 2)).astype(np.float32),
        "points": rng2.normal(size=(n, k, 3)).astype(np.float32) + [0, 0, 5],
        "colors": np.ones((n, k, 3), np.float32) * 0.5,
        "camera_poses": np.tile(np.eye(4), (n, 1, 1)),
        "original_width": 640,
        "original_height": 480,
        "image_paths": np.asarray([("vids/go.mp4", i) for i in range(n)]),
    }
    rec = build_chunk_reconstruction(chunk, ba_iterations=0)
    assert rec.frame_names == ["go.mp4#0", "go.mp4#1", "go.mp4#2"]
    chunk["image_paths"] = [("vids/go.mp4", i) for i in range(n)]
    rec = build_chunk_reconstruction(chunk, ba_iterations=0)
    assert rec.frame_names == ["go.mp4#0", "go.mp4#1", "go.mp4#2"]
