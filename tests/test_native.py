"""Native sfmcore (C++) vs numpy fallback parity."""

import numpy as np
import pytest

from pi3_slam_tpu.sfm import native


def test_native_builds():
    assert native.native_available(), "cpp/sfmcore.so failed to build"


def test_match_tracks_native_vs_fallback(rng):
    n_a, n_b = 500, 400
    track_frame_a = rng.integers(0, 6, n_a).astype(np.int32)
    track_uv_a = rng.uniform(0, 640, (n_a, 2)).astype(np.float32)
    valid_a = (rng.random(n_a) > 0.2).astype(np.float32)
    # B shares frames 4,5 of A (as B frames 0,1) and reuses some of A's uvs
    frame_map = np.array([4, 5, -1, -1], np.int32)
    track_frame_b = rng.integers(0, 4, n_b).astype(np.int32)
    track_uv_b = rng.uniform(0, 640, (n_b, 2)).astype(np.float32)
    valid_b = (rng.random(n_b) > 0.2).astype(np.float32)
    # plant exact matches
    planted = []
    for i in range(40):
        a = rng.integers(0, n_a)
        b = rng.integers(0, n_b)
        fa = frame_map[track_frame_b[b]]
        if fa < 0 or valid_a[a] == 0 or valid_b[b] == 0:
            continue
        track_frame_a[a] = fa
        track_uv_a[a] = track_uv_b[b]
        planted.append((a, b))

    args = (track_frame_a, track_uv_a, valid_a, track_frame_b, track_uv_b, valid_b, frame_map)
    ia_n, ib_n = native.match_tracks(*args)

    # force fallback
    saved = native._lib
    native._lib, native._build_failed = None, True
    try:
        ia_f, ib_f = native.match_tracks(*args)
    finally:
        native._lib, native._build_failed = saved, False

    assert set(zip(ia_n.tolist(), ib_n.tolist())) == set(zip(ia_f.tolist(), ib_f.tolist()))
    assert len(ia_n) >= 1  # planted matches found


def test_build_observations_native_vs_fallback(rng):
    """Native observation assembly gives the same BAProblem arrays as the
    numpy path inside build_chunk_reconstruction."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_alignment import make_chunk
    from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction

    chunk, _ = make_chunk(rng, [f"f{i}" for i in range(5)])
    r_native = build_chunk_reconstruction(chunk, run_ba=False)

    saved = native._lib
    native._lib, native._build_failed = None, True
    try:
        r_numpy = build_chunk_reconstruction(chunk, run_ba=False)
    finally:
        native._lib, native._build_failed = saved, False

    np.testing.assert_array_equal(r_native.obs_frame, r_numpy.obs_frame)
    np.testing.assert_array_equal(r_native.obs_valid, r_numpy.obs_valid)
    valid = r_native.obs_valid > 0
    np.testing.assert_allclose(
        r_native.obs_uv[valid], r_numpy.obs_uv[valid], atol=1e-4
    )
