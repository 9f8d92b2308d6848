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
