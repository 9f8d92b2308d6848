"""Blockwise (online-softmax) attention parity with exact attention."""

import numpy as np
import jax.numpy as jnp

from pi3_slam_tpu.ops.attention import sdpa_reference
from pi3_slam_tpu.ops.flash_attention import blockwise_attention


def test_blockwise_matches_exact(rng):
    B, T, H, D = 2, 300, 4, 32
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    exact = np.asarray(sdpa_reference(q, k, v))
    for bs in [64, 128, 300, 512]:
        blk = np.asarray(blockwise_attention(q, k, v, block_size=bs))
        np.testing.assert_allclose(blk, exact, atol=2e-5, err_msg=f"block={bs}")


def test_blockwise_nondivisible_and_bf16(rng):
    B, T, H, D = 1, 777, 2, 64
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    exact = np.asarray(sdpa_reference(q, k, v))
    blk = np.asarray(blockwise_attention(q, k, v, block_size=256))
    np.testing.assert_allclose(blk, exact, atol=2e-5)

    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    blk16 = np.asarray(blockwise_attention(qb, kb, vb, block_size=256)).astype(np.float32)
    assert np.abs(blk16 - exact).mean() < 0.02  # bf16 inputs, fp32 accumulation


def test_blockwise_extreme_logits(rng):
    # large-magnitude q/k stress the online softmax's max tracking
    B, T, H, D = 1, 130, 2, 16
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32) * 30)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32) * 30)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    exact = np.asarray(sdpa_reference(q, k, v))
    blk = np.asarray(blockwise_attention(q, k, v, block_size=32))
    np.testing.assert_allclose(blk, exact, atol=1e-4)
    assert np.isfinite(blk).all()
