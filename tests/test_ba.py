"""Bundle adjustment tests on synthetic scenes with known ground truth."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.sfm.ba import (
    make_problem,
    bundle_adjust,
    reprojection_errors,
    prune_outlier_tracks,
)


def make_scene(rng, n_frames=6, n_tracks=60, obs_per_track=4, noise_px=0.0):
    """Cameras on an arc looking at points in a box at z ~ [4, 8]."""
    pts = np.stack(
        [
            rng.uniform(-2, 2, n_tracks),
            rng.uniform(-2, 2, n_tracks),
            rng.uniform(4, 8, n_tracks),
        ],
        axis=1,
    )
    centers = np.stack(
        [np.linspace(-1.5, 1.5, n_frames), np.zeros(n_frames), np.zeros(n_frames)], axis=1
    )
    # small look-at rotations toward scene center
    rots = []
    for i in range(n_frames):
        yaw = -0.1 * centers[i, 0]
        rots.append(Rotation.from_euler("y", yaw).as_matrix())
    R_cw = np.stack(rots)  # world->cam (approx identity-ish)
    intr = np.tile(np.array([500.0, 500.0, 320.0, 240.0]), (n_frames, 1))

    M = obs_per_track
    obs_frame = np.zeros((n_tracks, M), np.int32)
    obs_uv = np.zeros((n_tracks, M, 2))
    obs_valid = np.ones((n_tracks, M))
    for t in range(n_tracks):
        frames = rng.choice(n_frames, size=M, replace=False)
        obs_frame[t] = frames
        for m, f in enumerate(frames):
            xc = R_cw[f] @ (pts[t] - centers[f])
            u = intr[f, 0] * xc[0] / xc[2] + intr[f, 2]
            v = intr[f, 1] * xc[1] / xc[2] + intr[f, 3]
            obs_uv[t, m] = [u + rng.normal() * noise_px, v + rng.normal() * noise_px]
    return dict(
        rotations=R_cw, centers=centers, points=pts, intrinsics=intr,
        obs_frame=obs_frame, obs_uv=obs_uv, obs_valid=obs_valid,
    )


def test_ba_zero_residual_at_ground_truth(rng):
    s = make_scene(rng)
    prob = make_problem(**s)
    err = np.asarray(reprojection_errors(prob))
    assert np.nanmax(err[np.isfinite(err)]) < 1e-3


def test_ba_recovers_from_perturbation(rng):
    s = make_scene(rng)
    gt_centers = s["centers"].copy()
    gt_points = s["points"].copy()
    # perturb everything
    pert = dict(s)
    pert["centers"] = s["centers"] + rng.normal(size=s["centers"].shape) * 0.05
    pert["points"] = s["points"] + rng.normal(size=s["points"].shape) * 0.05
    rot_noise = Rotation.from_rotvec(rng.normal(size=(len(s["rotations"]), 3)) * 0.01).as_matrix()
    pert["rotations"] = np.einsum("nij,njk->nik", rot_noise, s["rotations"])

    prob = make_problem(**pert)
    err_before = np.asarray(reprojection_errors(prob))
    before = np.median(err_before[np.isfinite(err_before)])

    out = bundle_adjust(prob, iterations=15, huber_delta=2.0)
    err_after = np.asarray(reprojection_errors(out))
    after = np.median(err_after[np.isfinite(err_after)])
    assert before > 5.0  # the perturbation was material
    assert after < 0.1, f"BA did not converge: median reproj {after}px (was {before}px)"


def test_ba_ftol_early_stop_matches_full_budget(rng):
    """ftol>0 makes `iterations` a MAX (Ceres function_tolerance semantics,
    ba.py bundle_adjust): a converged early-stopped solve reaches the same
    solution quality as the fixed-length scan, and stopping is observable —
    a tiny budget with ftol set equals the same budget without it."""
    s = make_scene(rng)
    pert = dict(s)
    pert["centers"] = s["centers"] + rng.normal(size=s["centers"].shape) * 0.05
    pert["points"] = s["points"] + rng.normal(size=s["points"].shape) * 0.05
    prob = make_problem(**pert)

    full = bundle_adjust(prob, iterations=50, huber_delta=2.0)
    early = bundle_adjust(prob, iterations=50, huber_delta=2.0, ftol=1e-6)
    for a, b in ((full.centers, early.centers), (full.points, early.points)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    err = np.asarray(reprojection_errors(early))
    assert np.median(err[np.isfinite(err)]) < 0.1

    # identical trajectories while under budget: while_loop path == scan path
    a = bundle_adjust(prob, iterations=3, huber_delta=2.0)
    b = bundle_adjust(prob, iterations=3, huber_delta=2.0, ftol=1e-12)
    np.testing.assert_allclose(np.asarray(a.centers), np.asarray(b.centers), atol=1e-6)


def test_ba_return_info_iteration_count(rng):
    """return_info exposes the iteration count actually executed — the
    observable for 'does the ftol early stop fire' (tools/perf_online_floor).
    A loose-ftol solve must report fewer iterations than its budget; the
    fixed-length scan reports exactly its budget; both report the accepted
    final cost."""
    s = make_scene(rng)
    pert = dict(s)
    pert["centers"] = s["centers"] + rng.normal(size=s["centers"].shape) * 0.05
    pert["points"] = s["points"] + rng.normal(size=s["points"].shape) * 0.05
    prob = make_problem(**pert)

    out, info = bundle_adjust(
        prob, iterations=50, huber_delta=2.0, ftol=1e-4, return_info=True
    )
    n = int(info["iterations"])
    assert 1 <= n < 50, f"loose-ftol solve should stop early, ran {n}/50"
    assert np.isfinite(float(info["final_cost"]))

    out2, info2 = bundle_adjust(
        prob, iterations=5, huber_delta=2.0, return_info=True
    )
    assert int(info2["iterations"]) == 5
    np.testing.assert_allclose(
        np.asarray(out2.centers),
        np.asarray(bundle_adjust(prob, iterations=5, huber_delta=2.0).centers),
        atol=1e-6,
    )

    # the production per-chunk BA records its last solve's info
    from pi3_slam_tpu.sfm.reconstruction import _jit_bundle_adjust, last_ba_info

    _jit_bundle_adjust(prob, 5, 2.0, tracks_per_frame=None)
    rec = last_ba_info()
    assert rec is not None and 1 <= rec["iterations"] <= 5
    assert np.isfinite(rec["final_cost"])


def test_ba_with_fixed_cameras(rng):
    s = make_scene(rng)
    pert = dict(s)
    pert["centers"] = s["centers"] + rng.normal(size=s["centers"].shape) * 0.05
    prob = make_problem(**pert)
    fixed = np.zeros(len(s["centers"]))
    fixed[0] = 1.0
    out = bundle_adjust(prob, iterations=10, huber_delta=2.0, fixed_cameras=jnp.asarray(fixed))
    # fixed camera unchanged
    np.testing.assert_allclose(np.asarray(out.centers)[0], pert["centers"][0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rotations)[0], pert["rotations"][0], atol=1e-6)


def test_ba_pose_priors_pull_solution(rng):
    s = make_scene(rng)
    prior_centers = s["centers"] + 0.3  # shifted priors
    prob = make_problem(
        **s,
        prior_rotations=s["rotations"],
        prior_centers=prior_centers,
        prior_rot_weight=np.zeros(len(s["centers"])),
        prior_pos_weight=np.full(len(s["centers"]), 1e6),  # very strong
    )
    out = bundle_adjust(prob, iterations=20, huber_delta=2.0)
    # strong priors dominate: centers move toward the prior
    d_prior = np.linalg.norm(np.asarray(out.centers) - prior_centers, axis=-1)
    d_orig = np.linalg.norm(np.asarray(out.centers) - s["centers"], axis=-1)
    assert np.all(d_prior < d_orig)


def test_ba_huber_robust_to_outliers(rng):
    s = make_scene(rng, n_tracks=80)
    # corrupt 10% of observations grossly
    bad = rng.choice(80, size=8, replace=False)
    s["obs_uv"][bad, 0] += 300.0
    pert = dict(s)
    pert["points"] = s["points"] + rng.normal(size=s["points"].shape) * 0.03
    prob = make_problem(**pert)
    out = bundle_adjust(prob, iterations=15, huber_delta=2.0)
    err = np.asarray(reprojection_errors(out))
    good = np.ones(80, bool)
    good[bad] = False
    med_good = np.median(err[good][np.isfinite(err[good])])
    assert med_good < 0.5


def test_prune_outlier_tracks(rng):
    s = make_scene(rng)
    # push 5 track points far off so reprojection blows up
    s["points"][:5] += 5.0
    prob = make_problem(**s)
    valid = np.asarray(prune_outlier_tracks(prob, max_reproj_px=2.0))
    assert valid[:5].sum() == 0
    assert valid[5:].sum() > 40  # most good tracks survive
