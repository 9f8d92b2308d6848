"""Correlation-based observation refinement tests (ops/correlation.py and
its chunk-creator / reconstructor integration)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter, shift as ndshift

from pi3_slam_tpu.ops.correlation import rgb_to_gray, zncc_refine_observations


def _smooth_image(rng, h, w):
    return gaussian_filter(rng.normal(size=(h, w)), 2.0).astype(np.float32)


def test_zncc_recovers_subpixel_shift(rng):
    """A frame shifted by a known sub-pixel offset: refinement must pull
    noisy projected observations onto the true correspondence."""
    h, w = 64, 80
    img0 = _smooth_image(rng, h, w)
    true = (1.3, -0.7)  # (dy, dx)
    img1 = ndshift(img0, true, order=3, mode="nearest")
    gray = jnp.asarray(np.stack([img0, img1]))

    t = 50
    tu = rng.uniform(15, w - 15, t)
    tv = rng.uniform(15, h - 15, t)
    err = rng.normal(size=(t, 2)) * 1.0
    obs_uv = np.stack(
        [tu + true[1] + err[:, 0], tv + true[0] + err[:, 1]], axis=1
    )[:, None, :]

    ruv, peak, ok = zncc_refine_observations(
        gray,
        jnp.zeros(t, jnp.int32),
        jnp.asarray(np.stack([tu, tv], axis=1), jnp.float32),
        jnp.ones((t, 1), jnp.int32),
        jnp.asarray(obs_uv, jnp.float32),
        patch_radius=4,
        search_radius=4,
    )
    ok = np.asarray(ok)[:, 0]
    gt = np.stack([tu + true[1], tv + true[0]], axis=1)
    before = np.linalg.norm(obs_uv[:, 0] - gt, axis=1)
    after = np.linalg.norm(np.asarray(ruv)[:, 0] - gt, axis=1)
    assert ok.mean() > 0.9
    assert after[ok].mean() < 0.25
    assert after[ok].mean() < 0.3 * before[ok].mean()
    assert float(np.asarray(peak)[:, 0][ok].mean()) > 0.9


def test_zncc_gates_weak_borders_and_flat_patches(rng):
    """Textureless templates and windows leaving the image must NOT be
    refined — the projected coordinates pass through unchanged."""
    h, w = 48, 48
    img = _smooth_image(rng, h, w)
    img[:20, :20] = 0.5  # flat region
    gray = jnp.asarray(np.stack([img, img]))

    tmpl_uv = np.array([[10.0, 10.0], [3.0, 24.0], [30.0, 30.0]], np.float32)
    obs_uv = np.array(
        [[[10.0, 10.0]], [[3.0, 24.0]], [[2.0, 2.0]]], np.float32
    )  # flat template / border window / border window
    ruv, _, ok = zncc_refine_observations(
        gray,
        jnp.zeros(3, jnp.int32),
        jnp.asarray(tmpl_uv),
        jnp.ones((3, 1), jnp.int32),
        jnp.asarray(obs_uv),
        patch_radius=3,
        search_radius=4,
    )
    ok = np.asarray(ok)[:, 0]
    assert not ok[0]  # flat template
    assert not ok[2]  # window outside margin
    np.testing.assert_allclose(np.asarray(ruv)[~ok], obs_uv[~ok], atol=1e-6)


def _exact_scene(rng, n=4, k=30, h=60, w=80, f=70.0):
    """Cameras along x observing a textured fronto-parallel-ish cloud;
    keypoints are exact projections in each owner frame."""
    cx, cy = w / 2.0, h / 2.0
    seed = np.stack(
        [rng.uniform(-1.5, 1.5, k), rng.uniform(-1.0, 1.0, k), rng.uniform(4, 7, k)],
        axis=1,
    )
    centers = np.stack([0.35 * np.arange(n), np.zeros(n), np.zeros(n)], axis=1)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = centers
    kp = np.zeros((n, k, 2))
    pts = np.zeros((n, k, 3))
    for fidx in range(n):
        xc = seed - centers[fidx]
        kp[fidx, :, 0] = f * xc[:, 0] / xc[:, 2] + cx
        kp[fidx, :, 1] = f * xc[:, 1] / xc[:, 2] + cy
        pts[fidx] = seed
    intr = np.tile(np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]]), (n, 1, 1))
    return dict(
        keypoints=kp,
        points=pts,
        colors=np.full((n, k, 3), 0.5),
        camera_poses=poses,
        intrinsics=intr,
        image_paths=[f"f{i}.png" for i in range(n)],
        original_width=w,
        original_height=h,
    )


def test_step_fan_matches_reconstructor_fan(rng):
    """With refinement acceptance disabled (min_zncc > 1), the in-step
    projected fan must equal the reconstructor's own projection fan."""
    from pi3_slam_tpu.slam.chunk_creator import (
        _fan_table,
        _project_and_refine_observations,
    )
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction

    chunk = _exact_scene(rng)
    n, k = chunk["keypoints"].shape[:2]
    h, w = chunk["original_height"], chunk["original_width"]
    m = 4
    ref = build_chunk_reconstruction(chunk, max_observations_per_track=m, run_ba=False)

    images = jnp.asarray(
        np.tile(_smooth_image(rng, h, w)[None, None], (n, 3, 1, 1)), jnp.float32
    )
    f = float(chunk["intrinsics"][0, 0, 0])
    cam = {
        "fx": jnp.full(n, f), "fy": jnp.full(n, f),
        "cx": jnp.full(n, w / 2.0), "cy": jnp.full(n, h / 2.0),
    }
    obs = _project_and_refine_observations(
        images,
        jnp.asarray(chunk["keypoints"], jnp.float32),
        jnp.asarray(chunk["points"], jnp.float32),
        jnp.asarray(chunk["camera_poses"], jnp.float32),
        cam,
        (m, 3, 4, 1.1),  # min_zncc > 1: nothing accepted, pure projection
        jnp.asarray(_fan_table(n, n, m)),
    )
    got_frame = np.asarray(obs["obs_frame"]).reshape(n * k, m)
    got_uv = np.asarray(obs["obs_uv"]).reshape(n * k, m, 2)
    got_valid = np.asarray(obs["obs_valid"]).reshape(n * k, m)
    assert not np.asarray(obs["obs_refined"]).any()

    both = (got_valid > 0) & (ref.obs_valid > 0)
    # same validity pattern and the same projected coordinates where valid
    np.testing.assert_array_equal(got_valid > 0, ref.obs_valid > 0)
    np.testing.assert_array_equal(got_frame[both.any(1)], ref.obs_frame[both.any(1)])
    np.testing.assert_allclose(got_uv[both], ref.obs_uv[both], atol=1e-3)


@pytest.mark.slow
def test_creator_refined_chunks_end_to_end(tmp_path):
    """Creator with --refine-observations writes obs arrays; the
    reconstructor consumes the stored fan (its own max-obs flag is
    superseded by the stored width)."""
    from PIL import Image

    from pi3_slam_tpu.slam import (
        OfflineChunkCreator,
        OfflineCreatorConfig,
        OfflineReconstructor,
        ReconstructorConfig,
    )
    from test_pi3_model import TINY, make_tiny_params

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(5)
    base = rng.integers(30, 220, (64, 84, 3)).astype(np.uint8)
    paths = []
    for i in range(7):  # last window is a 3-frame tail -> exercises pad-tail
        img = np.roll(base, shift=3 * i, axis=1)
        p = d / f"frame_{i:04d}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))

    out = str(tmp_path / "chunks_out")
    cfg = OfflineCreatorConfig(
        output_dir=out,
        chunk_length=4,
        overlap=2,
        pixel_limit=4000,
        use_metric_depth=False,
        max_keypoints=30,
        compute_dtype="float32",
        num_loader_workers=2,
        refine_observations=True,
        refine_max_observations=4,
    )
    creator = OfflineChunkCreator(cfg, pi3_config=TINY)
    creator.params = make_tiny_params()
    saved = creator.process_and_save(paths)
    assert saved

    z = np.load(saved[0], allow_pickle=False)
    n, k = z["keypoints"].shape[:2]
    assert z["obs_frame"].shape == (n, k, 4)
    assert z["obs_uv"].shape == (n, k, 4, 2)
    assert z["obs_uv"].dtype == np.float32
    assert z["obs_valid"].shape == (n, k, 4)
    assert (z["obs_frame"] < n).all() or not z["obs_valid"][z["obs_frame"] >= n].any()

    # padded tail chunk: obs sliced back to the real frame count and padded-
    # frame references invalidated
    zt = np.load(saved[-1], allow_pickle=False)
    nt = zt["keypoints"].shape[0]
    assert nt == 3
    assert zt["obs_frame"].shape[0] == nt
    assert not zt["obs_valid"][zt["obs_frame"] >= nt].any()
    # the fan is computed over the REAL frame count: tail tracks keep real
    # observation slots instead of spending them on padded frames
    assert (zt["obs_frame"] < nt).all()
    assert zt["obs_valid"][:, :, 1:].mean() > 0.2

    rec = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=out,
            output_dir=str(tmp_path / "recon_out"),
            ba_iterations=2,
            max_observations_per_track=7,  # must be superseded by stored M=4
        )
    )
    result = rec.run()
    recons = result["reconstructions"]
    assert recons[0].obs_frame.shape[1] == 4
    for art in result["artifacts"].values():
        assert os.path.exists(art)


@pytest.mark.slow
def test_creator_refined_chunk_dp_matches_single(tmp_path):
    """--refine-observations under chunk-data-parallel sharding on the CPU
    mesh: obs arrays are produced per chunk and match the single-chip path."""
    import glob

    import jax
    import pytest
    from PIL import Image

    from pi3_slam_tpu.slam import OfflineChunkCreator, OfflineCreatorConfig
    from test_pi3_model import TINY, make_tiny_params

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(3)
    base = rng.integers(30, 220, (64, 84, 3)).astype(np.uint8)
    for i in range(8):
        Image.fromarray(np.roll(base, shift=3 * i, axis=1)).save(d / f"f_{i:04d}.png")
    paths = sorted(glob.glob(os.path.join(str(d), "*.png")))

    outs = {}
    for dp in (1, 2):
        out = str(tmp_path / f"dp{dp}")
        cfg = OfflineCreatorConfig(
            output_dir=out, chunk_length=4, overlap=2, pixel_limit=4000,
            use_metric_depth=False, max_keypoints=24, compute_dtype="float32",
            data_parallel_chunks=dp,
            refine_observations=True, refine_max_observations=4,
        )
        creator = OfflineChunkCreator(cfg, pi3_config=TINY)
        creator.params = make_tiny_params()
        if dp > 1 and creator.mesh is None:
            pytest.skip("mesh unavailable")
        outs[dp] = creator.process_and_save(paths)

    assert len(outs[1]) == len(outs[2])
    for p1, p2 in zip(outs[1], outs[2]):
        z1, z2 = np.load(p1), np.load(p2)
        assert z1["obs_frame"].shape == z2["obs_frame"].shape
        np.testing.assert_array_equal(z1["obs_frame"], z2["obs_frame"])
        np.testing.assert_array_equal(z1["obs_valid"], z2["obs_valid"])
        np.testing.assert_allclose(z1["obs_uv"], z2["obs_uv"], atol=2e-2)


@pytest.mark.slow
def test_online_refined_observations(tmp_path):
    """Online mode with --refine-observations: the consumed reconstructions
    carry the device-refined observation fan (incl. the padded tail)."""
    from PIL import Image

    from pi3_slam_tpu.slam import OnlineConfig, Pi3SLAMOnline
    from test_pi3_model import TINY, make_tiny_params

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(7)
    base = rng.integers(30, 220, (64, 84, 3)).astype(np.uint8)
    paths = []
    for i in range(7):
        p = d / f"frame_{i:04d}.png"
        Image.fromarray(np.roll(base, shift=3 * i, axis=1)).save(p)
        paths.append(str(p))

    cfg = OnlineConfig(
        chunk_length=4,
        overlap=2,
        pixel_limit=4000,
        use_metric_depth=False,
        max_keypoints=30,
        compute_dtype="float32",
        output_dir=str(tmp_path / "out"),
        refine_observations=True,
        refine_max_observations=4,
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    slam.process_image_paths(paths)
    assert len(slam.reconstructions) >= 2
    for r in slam.reconstructions:
        assert r.obs_frame.shape[1] == 4
    tail = slam.reconstructions[-1]
    assert tail.num_frames == 3
    assert not (tail.obs_valid[tail.obs_frame >= tail.num_frames] > 0).any()
