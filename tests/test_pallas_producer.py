"""CPU interpret-mode parity for the fused qkv producer kernel.

The kernel (ops/pallas_producer.py) fuses per-head qk-LayerNorm + RoPE2D +
softmax scale + q|k|v packing + attention-lattice padding into one pass. The
reference here is the plain jnp chain it replaces (models/layers.attention
fallback path: layer_norm + rope_2d + scale + concat + pad), which itself has
torch parity via tests/test_pi3_parity.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pi3_slam_tpu.models.layers import layer_norm
from pi3_slam_tpu.ops.pallas_attention import LOG2_E
from pi3_slam_tpu.ops.pallas_producer import qkv_rope_producer_tpu
from pi3_slam_tpu.ops.rope import make_patch_positions, rope_2d, rope_tables


def _reference_packed(qkv, positions, norm, out_t, num_heads, eps, base):
    """The jnp producer chain (layers.attention non-kernel path) + pad."""
    b, t, c3 = qkv.shape
    d = c3 // (3 * num_heads)
    c = num_heads * d
    q, k, v = (
        qkv.reshape(b, t, 3, num_heads, d)[:, :, i] for i in range(3)
    )
    if norm is not None:
        q = layer_norm(q, norm["qs"], norm["qb"], eps)
        k = layer_norm(k, norm["ks"], norm["kb"], eps)
    if positions is not None:
        q = rope_2d(q, positions, base)
        k = rope_2d(k, positions, base)
    qs = q * jnp.asarray(d**-0.5 * LOG2_E, q.dtype)
    packed = jnp.concatenate(
        [qs.reshape(b, t, c), k.reshape(b, t, c), v.reshape(b, t, c)], axis=-1
    )
    return jnp.pad(packed, ((0, 0), (0, out_t - t), (0, 0)))


@pytest.mark.parametrize(
    "b,t,h,out_t,with_norm,with_rope",
    [
        (2, 300, 4, 384, True, True),  # decoder-like: norm + rope, ragged T
        (3, 260, 2, 512, False, True),  # head-like: rope only, extra pad blocks
        (1, 384, 4, 384, True, False),  # norm only, exact lattice
    ],
)
def test_producer_matches_reference_chain(rng, b, t, h, out_t, with_norm, with_rope):
    d = 64
    c3 = 3 * h * d
    qkv = jnp.asarray(rng.standard_normal((b, t, c3)).astype(np.float32))
    positions = (
        make_patch_positions(b, t // 10, 10, num_special=t % 10, offset=1)
        if with_rope
        else None
    )
    norm = None
    kw = {}
    if with_norm:
        norm = {
            "qs": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1),
            "qb": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1),
            "ks": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1),
            "kb": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1),
        }
        kw = dict(
            q_norm_scale=norm["qs"], q_norm_bias=norm["qb"],
            k_norm_scale=norm["ks"], k_norm_bias=norm["kb"],
        )

    if positions is not None:
        cos, sin = rope_tables(positions, d, base=100.0)
    else:
        cos = jnp.ones((b, t, d), jnp.float32)
        sin = jnp.zeros((b, t, d), jnp.float32)

    got = qkv_rope_producer_tpu(
        qkv, cos, sin, h, out_t, eps=1e-5, interpret=True, **kw
    )
    want = _reference_packed(qkv, positions, norm, out_t, h, 1e-5, 100.0)
    assert got.shape == (b, out_t, c3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # pad rows are exact zeros (the packed kernels' n_pad correction relies on it)
    assert np.all(np.asarray(got)[:, t:] == 0.0)


def test_rope_tables_match_rope_2d(rng):
    """Applying the tables elementwise reproduces rope_2d exactly."""
    b, t, h, d = 2, 70, 3, 64
    x = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    positions = make_patch_positions(b, 7, 10, offset=1)
    cos, sin = rope_tables(positions, d)
    # rotation partner: within each 32-lane half, [-x2 | x1]
    x1 = x.reshape(b, t, h, 2, 2, 16)
    rot = jnp.concatenate([-x1[..., 1, :], x1[..., 0, :]], axis=-1).reshape(
        b, t, h, d
    )
    got = x * cos[:, :, None, :] + rot * sin[:, :, None, :]
    want = rope_2d(x, positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_packed_kernels_accept_true_t(rng):
    """true_t path: pre-padded input + explicit logical length == the
    pad-inside path on the unpadded input."""
    from pi3_slam_tpu.ops.pallas_attention import (
        attention_single_pass_packed_tpu,
    )

    b, t, h, d = 2, 300, 4, 64
    c3 = 3 * h * d
    qkv = jnp.asarray(rng.standard_normal((b, t, c3)).astype(np.float32) * 0.1)
    padded = jnp.pad(qkv, ((0, 0), (0, 384 - t), (0, 0)))
    ref = attention_single_pass_packed_tpu(qkv, h, interpret=True)
    got = attention_single_pass_packed_tpu(padded, h, true_t=t, interpret=True)
    assert got.shape == ref.shape == (b, t, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_producer_unpadded_out_t(rng):
    """out_t == T (the single-pass path): fully unpadded, exact."""
    b, t, h, d = 2, 317, 4, 64  # prime-ish T: no 128 alignment anywhere
    c3 = 3 * h * d
    qkv = jnp.asarray(rng.standard_normal((b, t, c3)).astype(np.float32))
    positions = make_patch_positions(b, t, 1, offset=1)
    cos, sin = rope_tables(positions, d)
    got = qkv_rope_producer_tpu(qkv, cos, sin, h, t, interpret=True)
    want = _reference_packed(qkv, positions, None, t, h, 1e-5, 100.0)
    assert got.shape == (b, t, c3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_producer_k_norms(rng):
    """return_k_norms: per-head max |k| (post-norm, pre-rotation) matches a
    numpy computation on the reference chain's normed k."""
    from pi3_slam_tpu.ops.pallas_producer import head_k_norms  # noqa: F401

    b, t, h, d = 2, 300, 4, 64
    c3 = 3 * h * d
    qkv = jnp.asarray(rng.standard_normal((b, t, c3)).astype(np.float32))
    positions = make_patch_positions(b, 30, 10, offset=1)
    cos, sin = rope_tables(positions, d)
    norm = {
        "qs": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1),
        "qb": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1),
        "ks": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1),
        "kb": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1),
    }
    packed, kn = qkv_rope_producer_tpu(
        qkv, cos, sin, h, 384,
        q_norm_scale=norm["qs"], q_norm_bias=norm["qb"],
        k_norm_scale=norm["ks"], k_norm_bias=norm["kb"],
        return_k_norms=True, interpret=True,
    )
    assert kn.shape == (b * h,)
    k = qkv.reshape(b, t, 3, h, d)[:, :, 1]
    k = layer_norm(k, norm["ks"], norm["kb"], 1e-5)
    want = np.sqrt(np.max(np.sum(np.asarray(k) ** 2, axis=-1), axis=1)).reshape(-1)
    np.testing.assert_allclose(np.asarray(kn), want, rtol=1e-5)
    # and the flash kernel accepts the operand, matching its internal path
    from pi3_slam_tpu.ops.pallas_attention import flash_attention_packed_tpu

    pl_ = jnp.pad(packed, ((0, 0), (0, 2048 - 384), (0, 0)))
    ref = flash_attention_packed_tpu(pl_, h, true_t=t, interpret=True)
    got = flash_attention_packed_tpu(pl_, h, true_t=t, kn=kn, interpret=True)
    # the producer's bound base is computed pre-rotation in f32, the
    # kernel's internal one post-rotation from the emitted values — the
    # softmax shift cancels analytically, so only rounding-level
    # differences remain
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_single_pass_unpadded_ragged_t(rng):
    """The single-pass kernel runs ragged T directly (no internal pad) and
    matches the reference sdpa."""
    from pi3_slam_tpu.ops.attention import sdpa_reference
    from pi3_slam_tpu.ops.pallas_attention import (
        LOG2_E,
        attention_single_pass_packed_tpu,
    )

    b, t, h, d = 2, 317, 4, 64
    c = h * d
    rngs = rng.standard_normal((3, b, t, h, d)).astype(np.float32) * 0.3
    q, k, v = (jnp.asarray(a) for a in rngs)
    qs = q * (d**-0.5 * LOG2_E)
    packed = jnp.concatenate(
        [qs.reshape(b, t, c), k.reshape(b, t, c), v.reshape(b, t, c)], axis=-1
    )
    got = attention_single_pass_packed_tpu(packed, h, interpret=True)
    want = sdpa_reference(q, k, v).reshape(b, t, c)
    assert got.shape == (b, t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
