"""Chunk-data-parallel step on the virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pi3_slam_tpu.parallel import make_mesh
from pi3_slam_tpu.slam.chunk_creator import make_chunk_step, make_sharded_chunk_step
from test_pi3_model import TINY, make_tiny_params


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_chunk_step_matches_single(rng):
    params = make_tiny_params()
    B, N, H, W, K = 4, 2, 28, 28, 12
    images = rng.uniform(size=(B, N, 3, H, W)).astype(np.float32)
    kps = rng.uniform(3, 24, size=(B, N, K, 2)).astype(np.float32)

    step = make_chunk_step(TINY, jnp.float32, 0.1, 0.03, False)
    ref = step(params, jnp.asarray(images), jnp.asarray(kps))

    mesh = make_mesh(4, 2)
    sstep, shard_params = make_sharded_chunk_step(TINY, jnp.float32, 0.1, 0.03, False, mesh)
    sp = shard_params(params)
    out = sstep(sp, jnp.asarray(images), jnp.asarray(kps))

    np.testing.assert_allclose(
        np.asarray(out["points_kp"]), np.asarray(ref["points_kp"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["camera_poses"]), np.asarray(ref["camera_poses"]), atol=2e-4
    )
    assert out["points_kp"].shape == (B, N, K, 3)


def test_batched_chunk_step_consistent_with_single(rng):
    """(B, ...) batched call agrees with per-chunk single calls."""
    params = make_tiny_params()
    B, N, H, W, K = 2, 2, 28, 28, 9
    images = rng.uniform(size=(B, N, 3, H, W)).astype(np.float32)
    kps = rng.uniform(3, 24, size=(B, N, K, 2)).astype(np.float32)
    step = make_chunk_step(TINY, jnp.float32, 0.1, 0.03, True)

    batched = step(params, jnp.asarray(images), jnp.asarray(kps))
    for b in range(B):
        one = step(params, jnp.asarray(images[b : b + 1]), jnp.asarray(kps[b]))
        np.testing.assert_allclose(
            np.asarray(batched["points_kp"][b]), np.asarray(one["points_kp"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(batched["intrinsics"][b]), np.asarray(one["intrinsics"]), atol=1e-3
        )


def test_creator_with_sequence_parallel_mesh(rng, tmp_path):
    """A dp x sp mesh compiles and produces the same chunk artifacts as the
    single-device creator (ring attention engages only past the long-sequence
    threshold; at tiny shapes this validates the 3-axis mesh pipeline)."""
    import glob
    import os

    from PIL import Image

    from pi3_slam_tpu.slam import OfflineChunkCreator, OfflineCreatorConfig
    from test_pi3_model import TINY as PI3_TINY, make_tiny_params

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")

    d = tmp_path / "frames"
    d.mkdir()
    np_rng = np.random.default_rng(9)
    base = np_rng.integers(30, 220, (64, 84, 3)).astype(np.uint8)
    for i in range(8):
        Image.fromarray(np.roll(base, 3 * i, axis=1)).save(d / f"f_{i:03d}.png")
    paths = sorted(glob.glob(os.path.join(str(d), "*.png")))

    outs = {}
    for sp in (1, 2):
        cfg = OfflineCreatorConfig(
            output_dir=str(tmp_path / f"sp{sp}"), chunk_length=4, overlap=2,
            pixel_limit=4000, use_metric_depth=False, max_keypoints=20,
            compute_dtype="float32", data_parallel_chunks=2 if sp > 1 else 1,
            sequence_parallel=sp,
        )
        creator = OfflineChunkCreator(cfg, pi3_config=PI3_TINY)
        creator.params = make_tiny_params()
        if sp > 1:
            assert creator.mesh is not None and "sp" in creator.mesh.axis_names
        outs[sp] = creator.process_and_save(paths)

    for p1, p2 in zip(outs[1], outs[2]):
        z1, z2 = np.load(p1), np.load(p2)
        np.testing.assert_allclose(z1["camera_poses"], z2["camera_poses"], atol=2e-4)


def test_sharded_chunk_step_with_tensor_parallel(rng):
    """dp x tp mesh: the chunk step with Megatron-sharded parameters matches
    the single-device step (GSPMD inserts the collectives)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    from pi3_slam_tpu.parallel import make_mesh
    from pi3_slam_tpu.slam.chunk_creator import make_chunk_step, make_sharded_chunk_step
    from test_pi3_model import TINY, make_tiny_params

    params = make_tiny_params()
    mesh = make_mesh(2, 2)
    step_s, shard = make_sharded_chunk_step(TINY, jnp.float32, 0.1, 0.03, True, mesh)
    sp = shard(params)
    step_1 = make_chunk_step(TINY, jnp.float32, 0.1, 0.03, True)

    B, N, H, W = 2, 2, 28, 28
    imgs = rng.uniform(size=(B, N, 3, H, W)).astype(np.float32)
    kps = rng.uniform(2, 26, size=(B, N, 6, 2)).astype(np.float32)
    out_s = step_s(sp, jnp.asarray(imgs), jnp.asarray(kps))
    out_1 = step_1(params, jnp.asarray(imgs), jnp.asarray(kps))
    np.testing.assert_allclose(
        np.asarray(out_s["camera_poses"]), np.asarray(out_1["camera_poses"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_s["points_kp"]), np.asarray(out_1["points_kp"]), atol=2e-2
    )
