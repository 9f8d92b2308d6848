"""Fast structural tests of the Pi3 JAX model on a tiny config."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pi3_slam_tpu.models import Pi3Config, pi3_forward, init_pi3_params
from pi3_slam_tpu.models.dinov2 import DinoV2Config

TINY = Pi3Config(
    encoder=DinoV2Config(embed_dim=64, depth=2, num_heads=2, pos_embed_size=37),
    dec_embed_dim=64,
    dec_num_heads=2,
    dec_depth=4,
    num_register_tokens=5,
    head_dim=64,
    head_depth=2,
    head_num_heads=2,
    camera_dim=32,
)


def make_tiny_params(seed=0):
    # head out dims must match head_dim for the tiny config
    import pi3_slam_tpu.models.pi3 as pi3_mod

    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 10)
    cfg = TINY
    C = cfg.dec_embed_dim
    params = {
        "encoder": pi3_mod.init_dinov2_params(keys[0], cfg.encoder),
        "decoder": {
            "register_token": jax.random.normal(keys[1], (5, C)) * 0.02,
            "even_blocks": pi3_mod._init_block_stack(
                keys[2], cfg.dec_depth // 2, C, 4, True, 0.01, jnp.float32, cfg.dec_num_heads
            ),
            "odd_blocks": pi3_mod._init_block_stack(
                keys[3], cfg.dec_depth // 2, C, 4, True, 0.01, jnp.float32, cfg.dec_num_heads
            ),
        },
        "point_decoder": pi3_mod._init_head_decoder(keys[4], 2 * C, cfg.head_dim, cfg.head_dim, cfg.head_depth, 4, jnp.float32),
        "conf_decoder": pi3_mod._init_head_decoder(keys[5], 2 * C, cfg.head_dim, cfg.head_dim, cfg.head_depth, 4, jnp.float32),
        "camera_decoder": pi3_mod._init_head_decoder(keys[6], 2 * C, cfg.head_dim, cfg.camera_dim, cfg.head_depth, 4, jnp.float32),
        "point_head": {
            "kernel": jax.random.normal(keys[7], (cfg.head_dim, 3 * 14 * 14)) * 0.02,
            "bias": jnp.zeros(3 * 14 * 14),
        },
        "conf_head": {
            "kernel": jax.random.normal(keys[8], (cfg.head_dim, 14 * 14)) * 0.02,
            "bias": jnp.zeros(14 * 14),
        },
        "camera_head": _tiny_camera_head(keys[9], cfg),
    }
    return params


def _tiny_camera_head(key, cfg):
    d = cfg.camera_dim
    ks = jax.random.split(key, 10)
    out = {}
    for i in range(2):
        out[f"res_conv{i}"] = {
            "fc1_kernel": jax.random.normal(ks[3 * i], (d, d)) * 0.05,
            "fc1_bias": jnp.zeros(d),
            "fc2_kernel": jax.random.normal(ks[3 * i + 1], (d, d)) * 0.05,
            "fc2_bias": jnp.zeros(d),
            "fc3_kernel": jax.random.normal(ks[3 * i + 2], (d, d)) * 0.05,
            "fc3_bias": jnp.zeros(d),
        }
    out.update(
        mlp1_kernel=jax.random.normal(ks[6], (d, d)) * 0.05,
        mlp1_bias=jnp.zeros(d),
        mlp2_kernel=jax.random.normal(ks[7], (d, d)) * 0.05,
        mlp2_bias=jnp.zeros(d),
        fc_t_kernel=jax.random.normal(ks[8], (d, 3)) * 0.05,
        fc_t_bias=jnp.zeros(3),
        fc_rot_kernel=jax.random.normal(ks[9], (d, 9)) * 0.05,
        fc_rot_bias=jnp.asarray([1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]),
    )
    return out


def test_tiny_forward_shapes_and_validity(rng):
    params = make_tiny_params()
    imgs = jnp.asarray(rng.uniform(size=(1, 3, 3, 28, 42)).astype(np.float32))
    out = pi3_forward(params, imgs, TINY)
    assert out["points"].shape == (1, 3, 28, 42, 3)
    assert out["local_points"].shape == (1, 3, 28, 42, 3)
    assert out["conf"].shape == (1, 3, 28, 42, 1)
    assert out["camera_poses"].shape == (1, 3, 4, 4)
    # z = exp(.) > 0
    assert np.all(np.asarray(out["local_points"][..., 2]) > 0)
    # poses are rigid transforms
    poses = np.asarray(out["camera_poses"]).reshape(-1, 4, 4)
    for T in poses:
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-7)
    # world points = pose @ local (spot check, frame 0)
    T0 = poses[0]
    local0 = np.asarray(out["local_points"])[0, 0].reshape(-1, 3)
    world0 = np.asarray(out["points"])[0, 0].reshape(-1, 3)
    np.testing.assert_allclose(world0, local0 @ T0[:3, :3].T + T0[:3, 3], atol=1e-4)


def test_tiny_forward_jit_and_dtype(rng):
    params = make_tiny_params()
    imgs = jnp.asarray(rng.uniform(size=(1, 2, 3, 28, 28)).astype(np.float32))
    out32 = pi3_forward(params, imgs, TINY)
    fwd = jax.jit(lambda p, x: pi3_forward(p, x, TINY, compute_dtype=jnp.bfloat16))
    out16 = fwd(params, imgs)
    # bf16 trunk, fp32 heads: outputs are fp32 and in the same ballpark
    assert out16["points"].dtype == jnp.float32
    diff = np.abs(np.asarray(out16["conf"]) - np.asarray(out32["conf"])).mean()
    assert diff < 0.5  # loose: bf16 trunk drifts, but not wildly


def test_frame_permutation_changes_only_global_context(rng):
    """Frames attend to each other only through global (odd) blocks — with a
    single frame, N=1 vs duplicated frames must differ (sanity that global
    attention actually mixes frames)."""
    params = make_tiny_params()
    f0 = rng.uniform(size=(1, 1, 3, 28, 28)).astype(np.float32)
    f1 = rng.uniform(size=(1, 1, 3, 28, 28)).astype(np.float32)
    solo = np.asarray(pi3_forward(params, jnp.asarray(f0), TINY)["local_points"])[0, 0]
    pair = np.asarray(
        pi3_forward(params, jnp.asarray(np.concatenate([f0, f1], axis=1)), TINY)["local_points"]
    )[0, 0]
    assert np.abs(solo - pair).max() > 1e-6


@pytest.mark.slow
def test_global_kv_merge_exact_on_duplicate_frames(rng):
    """EXPERIMENTAL global_kv_merge: for frames duplicated in consecutive
    pairs, merged-kv attention is EXACTLY regular attention (the mean of m
    identical rotated tokens is the token, and uniform group sizes cancel
    in the softmax) — so the whole forward must match the exact model to fp
    tolerance. Also: a frame count not divisible by the merge silently
    falls back to the exact path."""
    import dataclasses

    params = make_tiny_params()
    f = rng.uniform(size=(1, 2, 3, 28, 28)).astype(np.float32)
    dup = jnp.asarray(np.repeat(f, 2, axis=1))  # [f0, f0, f1, f1]

    exact = pi3_forward(params, dup, TINY)
    cfg2 = dataclasses.replace(TINY, global_kv_merge=2)
    merged = pi3_forward(params, dup, cfg2)
    np.testing.assert_allclose(
        np.asarray(merged["points"]), np.asarray(exact["points"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(merged["camera_poses"]), np.asarray(exact["camera_poses"]),
        rtol=1e-4, atol=1e-5,
    )

    # distinct frames: merged is an approximation — outputs must differ
    distinct = jnp.asarray(
        rng.uniform(size=(1, 4, 3, 28, 28)).astype(np.float32)
    )
    a = pi3_forward(params, distinct, TINY)
    bm = pi3_forward(params, distinct, cfg2)
    assert np.abs(np.asarray(a["points"]) - np.asarray(bm["points"])).max() > 1e-6

    # N=3 not divisible by 2 -> exact path
    odd = jnp.asarray(rng.uniform(size=(1, 3, 3, 28, 28)).astype(np.float32))
    e = pi3_forward(params, odd, TINY)
    g = pi3_forward(params, odd, cfg2)
    np.testing.assert_allclose(
        np.asarray(g["points"]), np.asarray(e["points"]), rtol=1e-6, atol=1e-7
    )
