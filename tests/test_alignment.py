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


def test_align_chunks_insufficient_overlap(rng):
    chunk_a, _ = make_chunk(rng, ["a0", "a1", "a2"])
    chunk_b, _ = make_chunk(rng, ["b0", "b1", "b2"])
    ra = build_chunk_reconstruction(chunk_a, run_ba=False)
    rb = build_chunk_reconstruction(chunk_b, run_ba=False)
    res = align_chunks(ra, rb)
    assert not res.success
    assert res.num_common_tracks == 0
