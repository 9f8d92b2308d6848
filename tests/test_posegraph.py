"""Sim3 Lie maps, pose-graph optimization, and loop-closure tests."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.linalg import expm

from pi3_slam_tpu.geometry.sim3 import (
    Sim3,
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
    sim3_matrix,
)
from pi3_slam_tpu.geometry.transforms import skew
from pi3_slam_tpu.sfm.loops import close_loops, detect_loop_closures
from pi3_slam_tpu.sfm.posegraph import (
    index_sim3,
    optimize_sim3_pose_graph,
    sequential_edges,
    stack_sim3,
)


def _identity():
    return Sim3(jnp.ones(()), jnp.eye(3), jnp.zeros(3))


def _rand_sim3(rng, mag_r=0.5, mag_t=1.0, mag_s=0.2):
    xi = np.concatenate(
        [rng.normal(size=3) * mag_t, rng.normal(size=3) * mag_r, rng.normal(size=1) * mag_s]
    )
    return sim3_exp(jnp.asarray(xi, jnp.float32))


def test_sim3_exp_matches_matrix_exponential(rng):
    """exp of the 4x4 algebra matrix [[sigma I + skew(phi), rho],[0,0]] is
    [[s R, t],[0,1]] — the closed-form W coefficients must reproduce it,
    including the theta->0 and sigma->0 limits."""
    cases = [rng.normal(size=7) for _ in range(4)]
    z = rng.normal(size=7)
    z[3:6] = 0.0
    cases.append(z)  # pure translation+scale
    z2 = rng.normal(size=7)
    z2[6] = 0.0
    cases.append(z2)  # no scale
    cases.append(np.zeros(7))  # identity
    for xi in cases:
        rho, phi, sigma = xi[:3], xi[3:6], xi[6]
        m = np.zeros((4, 4))
        m[:3, :3] = sigma * np.eye(3) + np.asarray(skew(jnp.asarray(phi)))
        m[:3, 3] = rho
        ref = expm(m)
        got = np.asarray(sim3_matrix(sim3_exp(jnp.asarray(xi, jnp.float32))))
        np.testing.assert_allclose(got, ref, atol=3e-5)


def test_sim3_log_roundtrip_batched(rng):
    xis = (rng.normal(size=(8, 7)) * 0.8).astype(np.float32)
    xis[0] = 0.0
    back = np.asarray(sim3_log(sim3_exp(jnp.asarray(xis))))
    np.testing.assert_allclose(back, xis, atol=3e-5)


def test_sim3_exp_differentiable_at_zero():
    """The pose-graph retraction linearizes exp at xi = 0: the Jacobian there
    must be finite and its translation block the identity."""
    j = jax.jacfwd(lambda x: sim3_matrix(sim3_exp(x)))(jnp.zeros(7))
    j = np.asarray(j)
    assert np.isfinite(j).all()
    np.testing.assert_allclose(j[:3, 3, 0:3], np.eye(3), atol=1e-6)


def test_pose_graph_corrects_accumulated_drift(rng):
    """Chain of 12 chunks with per-step alignment noise plus one loop edge
    from the end back to the start: the optimizer must cut the endpoint
    error by an order of magnitude while keeping node 0 fixed."""
    n = 12
    rels = [_rand_sim3(rng, 0.3, 1.0, 0.05) for _ in range(n - 1)]
    t_true = [_identity()]
    for r in rels:
        t_true.append(sim3_compose(t_true[-1], r))
    t_est = [t_true[0]]
    for r in rels:
        noise = _rand_sim3(rng, 0.02, 0.05, 0.01)
        t_est.append(sim3_compose(t_est[-1], sim3_compose(r, noise)))

    # loop measurement between world-error frames of chunk 0 and n-1
    e0 = sim3_compose(t_est[0], sim3_inverse(t_true[0]))
    en = sim3_compose(t_est[n - 1], sim3_inverse(t_true[n - 1]))
    t_loop = sim3_compose(e0, sim3_inverse(en))

    ei, ej, meas_seq = sequential_edges(n)
    ei = np.concatenate([ei, [0]]).astype(np.int32)
    ej = np.concatenate([ej, [n - 1]]).astype(np.int32)
    meas = stack_sim3(meas_seq + [t_loop])
    w = np.ones(len(ei), np.float32)
    w[-1] = 3.0

    res = optimize_sim3_pose_graph(
        stack_sim3([_identity()] * n),
        jnp.asarray(ei),
        jnp.asarray(ej),
        meas,
        jnp.asarray(w),
        iterations=12,
    )
    assert res.final_cost < 0.1 * res.initial_cost

    def endpoint_err(nodes=None):
        c = t_est[n - 1].translation
        if nodes is not None:
            c = sim3_compose(index_sim3(nodes, n - 1), t_est[n - 1]).translation
        return float(jnp.linalg.norm(c - t_true[n - 1].translation))

    before, after = endpoint_err(), endpoint_err(res.nodes)
    assert after < 0.2 * before
    # gauge: node 0 pinned at identity
    x0 = index_sim3(res.nodes, 0)
    np.testing.assert_allclose(np.asarray(x0.rotation), np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x0.translation), 0.0, atol=1e-4)


def _make_desc_chunk(rng, frame_names, seed_points, desc, start=0):
    """Synthetic chunk whose keypoints are exact projections of seed_points
    and whose per-keypoint descriptors are shared across frames."""
    from tests.test_alignment import make_chunk

    chunk, _ = make_chunk(
        rng, frame_names, n_kp=seed_points.shape[0], seed_points=seed_points, start=start
    )
    n = len(frame_names)
    chunk["descriptors"] = np.tile(desc[None], (n, 1, 1)).astype(np.float32)
    return chunk


def test_detect_and_close_loops(rng):
    """Four chunks; the last revisits the first's scene (same 3D points,
    same descriptors) after accumulated drift. Loop closure must find the
    (0, 3) edge and pull chunk 3 back onto chunk 0's geometry."""
    from pi3_slam_tpu.sfm.alignment import apply_sim3_to_reconstruction
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction

    n_kp = 48
    dim = 64

    def unit_desc(k):
        d = rng.normal(size=(k, dim))
        return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    seed_a = np.stack(
        [rng.uniform(-2, 2, n_kp), rng.uniform(-1.5, 1.5, n_kp), rng.uniform(4, 7, n_kp)],
        axis=1,
    )
    desc_a = unit_desc(n_kp)
    chunks = []
    # chunk 0 at the origin; chunks 1-2 exploring; chunk 3 back at the origin
    chunks.append(_make_desc_chunk(rng, ["a0", "a1", "a2", "a3"], seed_a, desc_a, start=0))
    for k, start in ((1, 3), (2, 6)):
        seed = seed_a + np.array([0.8 * start, 0.0, 0.0])
        chunks.append(
            _make_desc_chunk(
                rng, [f"c{k}f{i}" for i in range(4)], seed, unit_desc(n_kp), start=start
            )
        )
    chunks.append(_make_desc_chunk(rng, ["b0", "b1", "b2", "b3"], seed_a, desc_a, start=0))

    recons = [build_chunk_reconstruction(c, run_ba=False) for c in chunks]

    # accumulated drift applied to chunks 1..3 (as sequential stitching would)
    drift_step = sim3_exp(jnp.asarray([0.15, 0.1, -0.05, 0.03, -0.02, 0.04, 0.02], jnp.float32))
    acc = _identity()
    for k in range(1, 4):
        acc = sim3_compose(drift_step, acc)
        apply_sim3_to_reconstruction(recons[k], acc)

    err_before = float(
        np.linalg.norm(recons[3].points[: n_kp] - seed_a, axis=-1).mean()
    )

    edges = detect_loop_closures(recons)
    assert [(e.i, e.j) for e in edges] == [(0, 3)]
    assert edges[0].num_inliers >= 20

    stats = close_loops(recons, edges=edges, sequential_weight=0.5)
    assert stats["applied"]
    err_after = float(
        np.linalg.norm(recons[3].points[: n_kp] - seed_a, axis=-1).mean()
    )
    assert err_after < 0.35 * err_before


def test_close_loops_no_descriptors(rng):
    """Grid chunks carry no descriptors — detection must return nothing and
    close_loops must be a safe no-op."""
    from tests.test_alignment import make_chunk
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction

    chunks = [
        make_chunk(rng, [f"g{k}f{i}" for i in range(3)], start=3 * k)[0] for k in range(4)
    ]
    recons = [build_chunk_reconstruction(c, run_ba=False) for c in chunks]
    stats = close_loops(recons)
    assert stats["num_loop_edges"] == 0 and not stats["applied"]


def test_detect_loops_global_prefilter(rng):
    """With the place-recognition prefilter at top_k=1, the genuine revisit
    (identical descriptors) must still be ranked first and detected."""
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction
    from pi3_slam_tpu.sfm.alignment import apply_sim3_to_reconstruction

    n_kp = 48
    seed_a = np.stack(
        [rng.uniform(-2, 2, n_kp), rng.uniform(-1.5, 1.5, n_kp), rng.uniform(4, 7, n_kp)],
        axis=1,
    )
    desc_a = rng.normal(size=(n_kp, 64))
    desc_a = (desc_a / np.linalg.norm(desc_a, axis=-1, keepdims=True)).astype(np.float32)

    def unit_desc(k):
        d = rng.normal(size=(k, 64))
        return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    chunks = [_make_desc_chunk(rng, ["a0", "a1", "a2", "a3"], seed_a, desc_a, start=0)]
    for k, start in ((1, 3), (2, 6)):
        seed = seed_a + np.array([0.8 * start, 0.0, 0.0])
        chunks.append(
            _make_desc_chunk(rng, [f"c{k}f{i}" for i in range(4)], seed, unit_desc(n_kp), start=start)
        )
    chunks.append(_make_desc_chunk(rng, ["b0", "b1", "b2", "b3"], seed_a, desc_a, start=0))
    recons = [build_chunk_reconstruction(c, run_ba=False) for c in chunks]
    drift = sim3_exp(jnp.asarray([0.1, 0.05, -0.05, 0.02, -0.01, 0.03, 0.01], jnp.float32))
    apply_sim3_to_reconstruction(recons[3], drift)

    edges = detect_loop_closures(recons, global_prefilter_top_k=1)
    assert [(e.i, e.j) for e in edges] == [(0, 3)]
