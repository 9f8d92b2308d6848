"""Chunk alignment tests: common-track matching, Sim3 recovery, prior BA."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction
from pi3_slam_tpu.sfm.alignment import (
    create_view_graph_matches,
    find_common_tracks,
    align_chunks,
    apply_sim3_to_reconstruction,
)
from pi3_slam_tpu.geometry.sim3 import Sim3, sim3_apply


def make_chunk(rng, frame_names, n_kp=40, width=640, height=480, seed_points=None, start=0):
    """Synthetic chunk: cameras along x at z=0 looking at points around z~5.

    Keypoints are the exact projections of shared world points, so chunk
    geometry is self-consistent.
    """
    n = len(frame_names)
    if seed_points is None:
        seed_points = np.stack(
            [rng.uniform(-2, 2, n_kp), rng.uniform(-1.5, 1.5, n_kp), rng.uniform(4, 7, n_kp)],
            axis=1,
        )
    xs = 0.8 * (start + np.arange(n))
    centers = np.stack([xs, np.zeros(n), np.zeros(n)], axis=1)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = centers
    intr = np.tile(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]), (n, 1, 1))

    kp = np.zeros((n, n_kp, 2))
    pts = np.zeros((n, n_kp, 3))
    for f in range(n):
        xc = seed_points - centers[f]
        u = 500 * xc[:, 0] / xc[:, 2] + 320
        v = 500 * xc[:, 1] / xc[:, 2] + 240
        kp[f] = np.stack([u, v], axis=1)
        pts[f] = seed_points
    return dict(
        keypoints=kp,
        points=pts,
        colors=np.ones((n, n_kp, 3)) * 0.5,
        camera_poses=poses,
        intrinsics=intr,
        image_paths=[f"{nm}.png" for nm in frame_names],
        original_width=width,
        original_height=height,
    ), seed_points


def test_view_graph_matches():
    m = create_view_graph_matches(10, 3)
    assert m == [(7, 0), (8, 1), (9, 2)]


def test_find_common_tracks(rng):
    chunk_a, seed = make_chunk(rng, ["f0", "f1", "f2", "f3"])
    chunk_b, _ = make_chunk(rng, ["f2", "f3", "f4", "f5"], seed_points=seed, start=2)
    ra = build_chunk_reconstruction(chunk_a, run_ba=False)
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)
    ids_a, ids_b = find_common_tracks(ra, rb)
    # two shared frames x 40 keypoints
    assert ids_a.size == 80
    # matched tracks have identical keypoint coords in the shared frames
    np.testing.assert_allclose(ra.track_uv[ids_a], rb.track_uv[ids_b], atol=1e-5)


def test_align_chunks_recovers_sim3(rng):
    chunk_a, seed = make_chunk(rng, ["f0", "f1", "f2", "f3", "f4"])
    chunk_b, _ = make_chunk(rng, ["f3", "f4", "f5", "f6", "f7"], seed_points=seed, start=3)
    ra = build_chunk_reconstruction(chunk_a, run_ba=False)
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)

    # displace chunk B by a known Sim3 (simulating per-chunk gauge freedom)
    gt = Sim3(
        jnp.asarray(1.4),
        jnp.asarray(Rotation.from_euler("xyz", [0.05, -0.1, 0.2]).as_matrix()),
        jnp.asarray(np.array([0.5, -0.3, 1.0])),
    )
    apply_sim3_to_reconstruction(rb, gt)

    res = align_chunks(ra, rb, refine=False)
    assert res.success
    # query chunk must be back in A's frame: overlap cameras coincide
    name_to_a = {n: i for i, n in enumerate(ra.frame_names)}
    for j, nm in enumerate(rb.frame_names):
        if nm in name_to_a:
            i = name_to_a[nm]
            np.testing.assert_allclose(rb.centers[j], ra.centers[i], atol=5e-3)
            np.testing.assert_allclose(rb.rotations[j], ra.rotations[i], atol=5e-3)


def test_align_chunks_with_refine_and_noise(rng):
    chunk_a, seed = make_chunk(rng, [f"f{i}" for i in range(6)])
    chunk_b, _ = make_chunk(rng, [f"f{i}" for i in range(4, 10)], seed_points=seed, start=4)
    ra = build_chunk_reconstruction(chunk_a, run_ba=False)
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)

    gt = Sim3(jnp.asarray(0.8), jnp.asarray(np.eye(3)), jnp.asarray(np.array([1.0, 0.0, 0.0])))
    apply_sim3_to_reconstruction(rb, gt)
    # add mild noise to B's points so refinement has work to do
    rb.points = rb.points + rng.normal(size=rb.points.shape).astype(np.float32) * 0.01

    res = align_chunks(ra, rb, refine=True, refine_iterations=20)
    assert res.success
    assert res.num_common_tracks == 80
    name_to_a = {n: i for i, n in enumerate(ra.frame_names)}
    for j, nm in enumerate(rb.frame_names):
        if nm in name_to_a:
            i = name_to_a[nm]
            np.testing.assert_allclose(rb.centers[j], ra.centers[i], atol=0.05)


def test_keypoint_valid_gates_tracks(rng):
    """ALIKED sub-threshold filler slots (keypoint_valid False) must enter as
    dead tracks: zero BA weight, no observations, excluded from matching."""
    chunk, _ = make_chunk(rng, ["f0", "f1"], n_kp=10)
    valid = np.ones((2, 10), bool)
    valid[:, 7:] = False
    chunk["keypoint_valid"] = valid
    r = build_chunk_reconstruction(chunk, run_ba=False)
    tv = r.track_valid.reshape(2, 10)
    assert (tv[:, 7:] == 0).all() and (tv[:, :7] == 1).all()
    assert (r.obs_valid[r.track_valid == 0] == 0).all()

    # dead tracks never match across chunks: B's frame 0 repeats A's frame 1
    # detections exactly, so the 7 live slots join and the 3 dead ones don't
    chunk_b = dict(
        chunk,
        image_paths=["f1.png", "f2.png"],
        keypoints=np.stack([chunk["keypoints"][1]] * 2),
        points=np.stack([chunk["points"][1]] * 2),
    )
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)
    ids_a, ids_b = find_common_tracks(r, rb)
    assert ids_a.size == 7
    assert np.isin(ids_a, np.nonzero(r.track_valid == 0)[0]).sum() == 0


def _frame_descriptors(names, n_kp, dim=16):
    """Deterministic per-(frame name, kp index) unit descriptors: the same
    physical frame re-detected in another chunk gets identical descriptors."""
    import zlib

    out = np.zeros((len(names), n_kp, dim), np.float32)
    for i, nm in enumerate(names):
        r = np.random.default_rng(zlib.crc32(nm.encode()))
        d = r.standard_normal((n_kp, dim)).astype(np.float32)
        out[i] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return out


def test_descriptor_matching_recovers_subpixel_jitter(rng):
    """Learned keypoints are not bitwise-reproducible across chunks: with
    sub-pixel jitter the 0.25 px position join finds nothing, but the
    descriptor mutual-NN path recovers the common tracks."""
    names_a = ["f0", "f1", "f2", "f3"]
    names_b = ["f2", "f3", "f4", "f5"]
    chunk_a, seed = make_chunk(rng, names_a)
    chunk_b, _ = make_chunk(rng, names_b, seed_points=seed, start=2)
    chunk_a["descriptors"] = _frame_descriptors(names_a, 40)
    chunk_b["descriptors"] = _frame_descriptors(names_b, 40)
    # jitter B's detections by up to 1.5 px — same physical detections,
    # different soft-argmax refinement
    chunk_b["keypoints"] = chunk_b["keypoints"] + rng.uniform(
        0.4, 1.5, chunk_b["keypoints"].shape
    )
    ra = build_chunk_reconstruction(chunk_a, run_ba=False)
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)
    assert ra.track_desc is not None and rb.track_desc is not None

    ids_a, ids_b = find_common_tracks(ra, rb)
    assert ids_a.size >= 70  # 2 shared frames x 40 kp, near-complete recovery
    # matched tracks carry the same world point
    np.testing.assert_allclose(ra.points[ids_a], rb.points[ids_b], atol=1e-4)


def test_align_chunks_insufficient_overlap(rng):
    chunk_a, _ = make_chunk(rng, ["a0", "a1", "a2"])
    chunk_b, _ = make_chunk(rng, ["b0", "b1", "b2"])
    ra = build_chunk_reconstruction(chunk_a, run_ba=False)
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)
    res = align_chunks(ra, rb)
    assert not res.success
    assert res.num_common_tracks == 0


def test_align_chunks_pose_fallback(rng):
    """Zero common tracks (keypoints jittered so the position join fails)
    but shared frames: align_chunks must fall back to the camera-pose Sim3
    (sim3_from_camera_poses) and still recover the displacement — including
    the rotation component that collinear centers alone cannot fix."""
    chunk_a, seed = make_chunk(rng, ["f0", "f1", "f2", "f3", "f4"])
    chunk_b, _ = make_chunk(rng, ["f3", "f4", "f5", "f6", "f7"], seed_points=seed, start=3)
    # jitter B's keypoints by > the 0.25 px quantization so no track matches
    chunk_b["keypoints"] = chunk_b["keypoints"] + rng.uniform(1.0, 2.0, chunk_b["keypoints"].shape)
    ra = build_chunk_reconstruction(chunk_a, run_ba=False)
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)

    gt = Sim3(
        jnp.asarray(1.3),
        jnp.asarray(Rotation.from_euler("xyz", [0.3, -0.15, 0.25]).as_matrix()),
        jnp.asarray(np.array([0.7, -0.4, 1.2])),
    )
    apply_sim3_to_reconstruction(rb, gt)

    res = align_chunks(ra, rb, refine=False)
    assert res.success and res.method == "poses"
    assert res.num_common_tracks == 0
    name_to_a = {n: i for i, n in enumerate(ra.frame_names)}
    for j, nm in enumerate(rb.frame_names):
        if nm in name_to_a:
            i = name_to_a[nm]
            np.testing.assert_allclose(rb.centers[j], ra.centers[i], atol=1e-3)
            np.testing.assert_allclose(rb.rotations[j], ra.rotations[i], atol=1e-3)


def test_align_chunks_no_shared_frames_fails(rng):
    chunk_a, _ = make_chunk(rng, ["f0", "f1", "f2"])
    chunk_b, _ = make_chunk(rng, ["g0", "g1", "g2"], start=5)
    ra = build_chunk_reconstruction(chunk_a, run_ba=False)
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)
    res = align_chunks(ra, rb, refine=False)
    assert not res.success and res.method == "tracks"
