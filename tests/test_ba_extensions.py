"""Inverse-depth / focal-optimization BA modes, serialization, debug render."""

import os

import numpy as np
import jax.numpy as jnp

from pi3_slam_tpu.sfm.ba import make_problem, bundle_adjust, reprojection_errors
from test_ba import make_scene


def test_inverse_depth_ba_converges(rng):
    s = make_scene(rng)
    pert = dict(s)
    pert["points"] = s["points"] + rng.normal(size=s["points"].shape) * 0.05
    pert["centers"] = s["centers"] + rng.normal(size=s["centers"].shape) * 0.02
    prob = make_problem(**pert)
    out = bundle_adjust(prob, iterations=15, huber_delta=2.0, use_inverse_depth=True)
    err = np.asarray(reprojection_errors(out))
    med = np.median(err[np.isfinite(err)])
    assert med < 0.3, f"inverse-depth BA median reproj {med}px"


def test_focal_optimization_recovers_scale(rng):
    s = make_scene(rng, n_frames=6, n_tracks=80, obs_per_track=5)
    # corrupt focal by 5%: observations were made with f=500, give solver 525
    bad = dict(s)
    bad["intrinsics"] = s["intrinsics"].copy()
    bad["intrinsics"][:, :2] *= 1.05
    prob = make_problem(**bad)
    out = bundle_adjust(prob, iterations=20, huber_delta=2.0, optimize_focal=True)
    err = np.asarray(reprojection_errors(out))
    med = np.median(err[np.isfinite(err)])
    assert med < 0.5
    # focal should move back toward 500
    f_out = np.asarray(out.intrinsics)[:, 0]
    assert np.all(np.abs(f_out - 500) < np.abs(525 - 500))


def test_reconstruction_serialization_roundtrip(tmp_path, rng):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_alignment import make_chunk
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction
    from pi3_slam_tpu.sfm.serialization import save_reconstruction, load_reconstruction

    chunk, _ = make_chunk(rng, ["a", "b", "c"])
    recon = build_chunk_reconstruction(chunk, run_ba=False)
    path = str(tmp_path / "recon.npz")
    save_reconstruction(recon, path)
    back = load_reconstruction(path)
    assert back.frame_names == recon.frame_names
    np.testing.assert_array_equal(back.points, recon.points)
    np.testing.assert_array_equal(back.obs_frame, recon.obs_frame)
    assert back.image_width == recon.image_width


def test_debug_projection_render(tmp_path, rng):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_alignment import make_chunk
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction
    from pi3_slam_tpu.sfm.serialization import render_debug_projections

    chunk, _ = make_chunk(rng, ["a", "b"], n_kp=15)
    recon = build_chunk_reconstruction(chunk, run_ba=False)
    images = rng.uniform(size=(2, 3, recon.image_height, recon.image_width)).astype(np.float32)
    out = str(tmp_path / "debug.gif")
    render_debug_projections(recon, images, out, max_tracks=10)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_grouped_schur_matches_ungrouped(rng):
    """Owner-grouped Schur accumulation gives the same solution as the
    per-observation path on a reconstruction-layout problem."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_alignment import make_chunk
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction

    chunk, _ = make_chunk(rng, [f"f{i}" for i in range(5)], n_kp=25)
    chunk["points"] = chunk["points"] + rng.normal(size=chunk["points"].shape) * 0.02
    recon = build_chunk_reconstruction(chunk, run_ba=False)
    prob = recon.to_problem()
    K = 25
    # single step: identical up to fp32 reduction order
    g1 = bundle_adjust(prob, iterations=1, huber_delta=2.0, tracks_per_frame=K)
    u1 = bundle_adjust(prob, iterations=1, huber_delta=2.0)
    np.testing.assert_allclose(
        np.asarray(g1.centers), np.asarray(u1.centers), atol=2e-4
    )
    # multi-step trajectories diverge chaotically (fp32 order amplified by the
    # LM accept/reject), but both must reach an equally good optimum
    out_g = bundle_adjust(prob, iterations=8, huber_delta=2.0, tracks_per_frame=K)
    out_u = bundle_adjust(prob, iterations=8, huber_delta=2.0)
    e_g = np.asarray(reprojection_errors(out_g))
    e_u = np.asarray(reprojection_errors(out_u))
    med_g = np.median(e_g[np.isfinite(e_g)])
    med_u = np.median(e_u[np.isfinite(e_u)])
    assert med_g < 1.0 and med_u < 1.0  # noise floor of the 0.02-noise synthetic
    assert abs(med_g - med_u) < 0.02
