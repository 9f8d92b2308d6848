"""OverlapUploadCache: device-side reuse of chunk-overlap frames.

Consecutive chunks share `overlap` frames (reference stride semantics,
datasets/image_datasets.py:41-47); the cache must assemble bit-identical
device batches from cached-tail ++ new-upload, and fall back to a full
upload on ANY identity mismatch — correctness may never depend on the cache.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pi3_slam_tpu.slam.chunk_creator import OverlapUploadCache


def frames(rng, n, h=6, w=8, dtype=np.uint8):
    if dtype == np.uint8:
        return rng.integers(0, 255, (n, 3, h, w)).astype(np.uint8)
    return rng.random((n, 3, h, w)).astype(dtype)


def test_cache_assembles_bit_identical_batches(rng):
    cache = OverlapUploadCache()
    seq = frames(rng, 10)
    paths = [f"frame_{i:04d}.png" for i in range(10)]

    a = cache.upload(seq[0:6], paths[0:6])  # full upload
    np.testing.assert_array_equal(np.asarray(a), seq[0:6])

    b = cache.upload(seq[4:10], paths[4:10])  # overlap 2 reused from a
    np.testing.assert_array_equal(np.asarray(b), seq[4:10])

    # chained reuse: c overlaps b
    c = cache.upload(seq[8:10], paths[8:10])
    np.testing.assert_array_equal(np.asarray(c), seq[8:10])


def test_cache_full_window_reuse(rng):
    """A window fully contained in the previous tail needs zero upload."""
    cache = OverlapUploadCache()
    seq = frames(rng, 6)
    paths = [f"f{i}" for i in range(6)]
    cache.upload(seq, paths)
    again = cache.upload(seq[3:], paths[3:])
    np.testing.assert_array_equal(np.asarray(again), seq[3:])


def test_cache_mismatch_falls_back_to_full_upload(rng):
    cache = OverlapUploadCache()
    seq = frames(rng, 8)
    cache.upload(seq[0:4], ["a", "b", "c", "d"])

    # disjoint identities: no reuse, exact full upload
    out = cache.upload(seq[4:8], ["x", "y", "z", "w"])
    np.testing.assert_array_equal(np.asarray(out), seq[4:8])

    # same names, different shape: fallback
    small = frames(rng, 4, h=4, w=4)
    out = cache.upload(small, ["x", "y", "z", "w"])
    np.testing.assert_array_equal(np.asarray(out), small)

    # same names + shape, different dtype: fallback
    f32 = frames(rng, 4, h=4, w=4, dtype=np.float32)
    out = cache.upload(f32, ["x", "y", "z", "w"])
    np.testing.assert_array_equal(np.asarray(out), f32)


def test_cache_video_tuple_paths(rng):
    """Video frames are identified by (path, index) tuples."""
    cache = OverlapUploadCache()
    seq = frames(rng, 8)
    p = [("run.mp4", i) for i in range(8)]
    cache.upload(seq[0:5], p[0:5])
    out = cache.upload(seq[3:8], p[3:8])
    np.testing.assert_array_equal(np.asarray(out), seq[3:8])
    # ndarray-shaped tuples (as stored in npz manifests) also key correctly
    out = cache.upload(seq[6:8], [np.asarray(["run.mp4", str(i)]) for i in (6, 7)])
    np.testing.assert_array_equal(np.asarray(out), seq[6:8])


def test_cache_reset_drops_state(rng):
    cache = OverlapUploadCache()
    seq = frames(rng, 6)
    paths = [f"f{i}" for i in range(6)]
    cache.upload(seq[0:4], paths[0:4])
    cache.reset()
    out = cache.upload(seq[2:6], paths[2:6])  # would have reused without reset
    np.testing.assert_array_equal(np.asarray(out), seq[2:6])


def test_creator_chunks_identical_across_dispatch_depths(tmp_path, rng):
    """End-to-end: dispatch_depth=2 + overlap cache produce chunk files
    numerically identical to the strictly 1-deep, no-reuse path."""
    from PIL import Image

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_pi3_model import TINY, make_tiny_params

    from pi3_slam_tpu.slam import OfflineChunkCreator, OfflineCreatorConfig

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    base = rng.integers(0, 255, (48, 128, 3)).astype(np.uint8)
    paths = []
    for i in range(10):
        p = str(img_dir / f"frame_{i:04d}.png")
        Image.fromarray(base[:, 2 * i : 2 * i + 64]).save(p)
        paths.append(p)

    outs = {}
    params = make_tiny_params()
    for depth in (1, 2):
        cfg = OfflineCreatorConfig(
            output_dir=str(tmp_path / f"out_d{depth}"),
            chunk_length=4,
            overlap=2,
            pixel_limit=4000,
            use_metric_depth=False,
            max_keypoints=16,
            compute_dtype="float32",
            num_loader_workers=1,
            dispatch_depth=depth,
        )
        creator = OfflineChunkCreator(cfg, pi3_config=TINY)
        creator.params = params
        if depth == 1:
            # also disable overlap reuse: pure round-3 behavior as baseline
            creator._upload_cache.upload = (
                lambda images, _paths: jnp.asarray(images)
            )
        outs[depth] = creator.process_and_save(paths)

    assert len(outs[1]) == len(outs[2]) >= 3
    for f1, f2 in zip(outs[1], outs[2]):
        a, b = np.load(f1, allow_pickle=True), np.load(f2, allow_pickle=True)
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            if a[k].dtype.kind in "fiub":
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)

# ----- GroupUploadCache (dp group stacks) -----


def test_group_cache_bit_identical_and_dedup(rng):
    """Stacked dp-group batches assemble bit-identically to a plain upload
    while sending each unique frame once: intra-group chunk overlap,
    tail-padding repeats and inter-group overlap all dedup."""
    from pi3_slam_tpu.slam.chunk_creator import GroupUploadCache

    cache = GroupUploadCache()
    seq = frames(rng, 12)
    paths = [f"frame_{i:04d}.png" for i in range(12)]

    # group 1: chunks (0..4) and (2..6) — intra-group overlap of 2
    g1 = np.stack([seq[0:4], seq[2:6]])
    out = cache.upload(g1, [paths[0:4], paths[2:6]])
    np.testing.assert_array_equal(np.asarray(out), g1)
    assert cache.last_uploaded == 6  # 8 stacked rows, 6 unique frames

    # group 2: chunks (4..8) and (6..10) — reuses 4,5 (inter-group) and
    # dedups 6,7 intra-group
    g2 = np.stack([seq[4:8], seq[6:10]])
    out = cache.upload(g2, [paths[4:8], paths[6:10]])
    np.testing.assert_array_equal(np.asarray(out), g2)
    assert cache.last_uploaded == 4  # only frames 6..9 are new

    # group 3: short tail chunk padded by repeating its last frame, dp row
    # padded by repeating the last chunk — zero extra upload for the repeats
    tail = np.concatenate([seq[8:11], seq[10:11]])  # frames 8,9,10,10
    g3 = np.stack([tail, tail])
    out = cache.upload(g3, [paths[8:11], paths[8:11]])  # short rows extended
    np.testing.assert_array_equal(np.asarray(out), g3)
    assert cache.last_uploaded == 1  # only frame 10 is new


def test_group_cache_mismatch_falls_back(rng):
    """Shape or dtype change invalidates the pool; output is still exact."""
    from pi3_slam_tpu.slam.chunk_creator import GroupUploadCache

    cache = GroupUploadCache()
    seq = frames(rng, 8)
    g1 = np.stack([seq[0:4], seq[4:8]])
    cache.upload(g1, [[f"f{i}" for i in range(4)], [f"f{i}" for i in range(4, 8)]])

    small = frames(rng, 8, h=4, w=4)
    g2 = np.stack([small[0:4], small[4:8]])
    out = cache.upload(g2, [[f"f{i}" for i in range(4)], [f"f{i}" for i in range(4, 8)]])
    np.testing.assert_array_equal(np.asarray(out), g2)
    assert cache.last_uploaded == 8  # no reuse across the shape change

    f32 = frames(rng, 8, h=4, w=4, dtype=np.float32)
    g3 = np.stack([f32[0:4], f32[4:8]])
    out = cache.upload(g3, [[f"f{i}" for i in range(4)], [f"f{i}" for i in range(4, 8)]])
    np.testing.assert_array_equal(np.asarray(out), g3)
    assert cache.last_uploaded == 8


@pytest.mark.slow
def test_online_dp_group_cache_bit_identity(tmp_path, rng):
    """End-to-end on the CPU mesh: the online dp path with GroupUploadCache
    produces a trajectory bit-identical to plain full-stack uploads (same
    compiled program, same input bytes — the cache only changes HOW the
    stack reaches the device)."""
    import glob
    import os
    import sys

    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pi3_model import TINY, make_tiny_params

    from pi3_slam_tpu.slam.online import OnlineConfig, Pi3SLAMOnline

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    base = rng.integers(0, 255, (48, 140, 3)).astype(np.uint8)
    paths = []
    for i in range(10):
        p = str(img_dir / f"frame_{i:04d}.png")
        Image.fromarray(base[:, 2 * i : 2 * i + 64]).save(p)
        paths.append(p)

    params = make_tiny_params()
    trajs = {}
    for mode in ("cached", "plain"):
        cfg = OnlineConfig(
            chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
            max_keypoints=16, compute_dtype="float32",
            output_dir=str(tmp_path / f"o_{mode}"), data_parallel_chunks=2,
        )
        slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
        slam._host_params = params
        slam.params = params
        slam._make_steps()
        if mode == "plain":
            slam._group_upload_cache.upload = (
                lambda images, _paths: jnp.asarray(images)
            )
        r = slam.process_image_paths(paths)
        assert r["num_chunks"] == 5  # windows (0,4),(2,6),(4,8),(6,10),(8,10)
        trajs[mode] = slam._merged_trajectory()[0]
        if mode == "cached":
            assert slam._group_upload_cache._flat is not None  # cache engaged

    np.testing.assert_array_equal(trajs["cached"], trajs["plain"])
