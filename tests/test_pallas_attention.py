"""Custom Pallas flash-attention kernel tests.

The kernel itself needs TPU hardware (tests force the CPU backend), so CPU CI
exercises the routing logic only; numerical parity on the real chip was
verified at (2,300,4,64) fp32 (max diff 1.3e-3, TPU default matmul precision)
and (1,64512,16,64) bf16 vs the blockwise path (2.4e-4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pi3_slam_tpu.ops.attention import sdpa, LONG_SEQUENCE_THRESHOLD


def test_long_sequence_routes_to_memory_efficient_path(rng):
    # on CPU the long path must route to blockwise (pallas requires TPU)
    T = LONG_SEQUENCE_THRESHOLD
    q = jnp.asarray(rng.normal(size=(1, T, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, T, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, T, 2, 64)).astype(np.float32))
    out = sdpa(q, k, v)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_flash_kernel_interpret_parity(rng):
    """Flash kernel numerical parity in Pallas interpret mode (runs on CPU CI,
    guarding the hot kernel against regressions between TPU bench runs)."""
    from pi3_slam_tpu.ops.pallas_attention import flash_attention_tpu
    from pi3_slam_tpu.ops.attention import sdpa_reference

    q = jnp.asarray(rng.normal(size=(1, 300, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 300, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 300, 2, 64)).astype(np.float32))
    o = flash_attention_tpu(q, k, v, blk_q=128, blk_k=128, interpret=True)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)

    # block-aligned T exercises the no-bias (unpadded) kernel variant
    q, k, v = q[:, :256], k[:, :256], v[:, :256]
    o = flash_attention_tpu(q, k, v, blk_q=128, blk_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(sdpa_reference(q, k, v)), atol=2e-5)


def test_single_pass_kernel_interpret_parity(rng):
    from pi3_slam_tpu.ops.pallas_attention import attention_single_pass_tpu
    from pi3_slam_tpu.ops.attention import sdpa_reference

    q = jnp.asarray(rng.normal(size=(2, 300, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 300, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 300, 2, 64)).astype(np.float32))
    o = attention_single_pass_tpu(q, k, v, interpret=True)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)

    q, k, v = q[:, :256], k[:, :256], v[:, :256]  # aligned: no-bias variant
    o = attention_single_pass_tpu(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(sdpa_reference(q, k, v)), atol=2e-5)


def test_single_pass_variants_agree(rng):
    """'bound' (Cauchy–Schwarz shift + MXU-fused denominator) must match the
    exact 'max' formulation, including with large-magnitude logits where the
    bound is loose."""
    from pi3_slam_tpu.ops.pallas_attention import attention_single_pass_tpu
    from pi3_slam_tpu.ops.attention import sdpa_reference

    # amp 3 -> logits to ~65 base-2 units with the CS bound ~40 bits loose
    # (well inside the kernel's contract: exact for base-2 logits <= 247)
    for amp in (1.0, 3.0):
        q = jnp.asarray(rng.normal(size=(2, 300, 2, 64)).astype(np.float32) * amp)
        k = jnp.asarray(rng.normal(size=(2, 300, 2, 64)).astype(np.float32) * amp)
        v = jnp.asarray(rng.normal(size=(2, 300, 2, 64)).astype(np.float32))
        ob = attention_single_pass_tpu(q, k, v, variant="bound", interpret=True)
        om = attention_single_pass_tpu(q, k, v, variant="max", interpret=True)
        ref = sdpa_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(ob), np.asarray(ref), atol=3e-5)
        np.testing.assert_allclose(np.asarray(ob), np.asarray(om), atol=3e-5)


def test_flash_variants_agree(rng):
    """Flash 'bound' (fixed per-row shift, fused denominator) must match the
    exact online-softmax 'max' formulation across k-block boundaries."""
    from pi3_slam_tpu.ops.pallas_attention import flash_attention_tpu
    from pi3_slam_tpu.ops.attention import sdpa_reference

    q = jnp.asarray(rng.normal(size=(1, 700, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 700, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 700, 2, 64)).astype(np.float32))
    ob = flash_attention_tpu(
        q, k, v, blk_q=128, blk_k=256, variant="bound", interpret=True
    )
    om = flash_attention_tpu(
        q, k, v, blk_q=128, blk_k=256, variant="max", interpret=True
    )
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(om), np.asarray(ref), atol=3e-5)


def _pack_qkv(q, k, v):
    from pi3_slam_tpu.ops.pallas_attention import LOG2_E

    B, T, H, D = q.shape
    qs = q * (D**-0.5 * LOG2_E)
    return jnp.concatenate(
        [qs.reshape(B, T, H * D), k.reshape(B, T, H * D), v.reshape(B, T, H * D)],
        axis=-1,
    )


def test_packed_kernels_match_reference(rng):
    """Packed-qkv kernels (transpose-free, head-pairs in 128-lane blocks)
    must match plain SDPA; output comes back as (B, T, H*D)."""
    from pi3_slam_tpu.ops.pallas_attention import (
        attention_single_pass_packed_tpu,
        flash_attention_packed_tpu,
    )
    from pi3_slam_tpu.ops.attention import sdpa_reference

    B, T, H, D = 2, 300, 4, 64
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    ref = np.asarray(sdpa_reference(q, k, v)).reshape(B, T, H * D)
    qkv = _pack_qkv(q, k, v)

    o1 = attention_single_pass_packed_tpu(qkv, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), ref, atol=3e-5)
    o1b = attention_single_pass_packed_tpu(qkv, num_heads=H, n_interleave=2, interpret=True)
    np.testing.assert_allclose(np.asarray(o1b), ref, atol=3e-5)

    o2 = flash_attention_packed_tpu(qkv, num_heads=H, blk_q=128, blk_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(o2), ref, atol=3e-5)


def test_flash_kernel_non_lattice_blocks(rng):
    """Tunable block combos where the q superblock does not divide
    max(qb_super, blk_k) must still cover every row: T is padded to the
    lcm of the q superblock and blk_k (regression: blk_q=128, nw=3,
    blk_k=512 used to truncate the grid and NaN rows past 768)."""
    from pi3_slam_tpu.ops.pallas_attention import flash_attention_tpu
    from pi3_slam_tpu.ops.attention import sdpa_reference

    q = jnp.asarray(rng.normal(size=(1, 1000, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1000, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1000, 2, 64)).astype(np.float32))
    o = flash_attention_tpu(
        q, k, v, blk_q=128, blk_k=512, n_interleave=3, interpret=True
    )
    assert np.isfinite(np.asarray(o)).all()
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(sdpa_reference(q, k, v)), atol=2e-5
    )


def test_partial_kernel_shards_sum_to_full_attention(rng):
    """Ring-attention building block: bound-softmax partials over key shards
    (computed with the same global kn) must sum to full attention."""
    from pi3_slam_tpu.ops.pallas_attention import flash_attention_partial_tpu
    from pi3_slam_tpu.ops.attention import sdpa_reference

    B, T, H, D = 1, 256, 2, 64
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k32 = np.asarray(k, np.float32)
    kn = jnp.asarray(np.sqrt((k32**2).sum(-1).max(axis=1)))  # (B, H) global

    acc = jnp.zeros((B, T, H, D), jnp.float32)
    l = jnp.zeros((B, T, H), jnp.float32)
    for s in range(2):  # two key shards of 128
        ks, vs = k[:, s * 128 : (s + 1) * 128], v[:, s * 128 : (s + 1) * 128]
        a_i, l_i = flash_attention_partial_tpu(
            q, ks, vs, kn, blk_q=128, blk_k=128, n_interleave=1, interpret=True
        )
        acc = acc + a_i
        l = l + l_i
    out = acc / l[..., None]
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_partial_kernel_single_shard_asymmetric_lengths(rng):
    """The merged-kv global attention path (models/layers._merged_kv_attention)
    feeds the partial kernel ONE complete kv set with Tk < Tq and divides
    acc/l once — verify that usage against reference SDPA."""
    from pi3_slam_tpu.ops.pallas_attention import flash_attention_partial_tpu
    from pi3_slam_tpu.ops.attention import sdpa_reference

    B, Tq, Tk, H, D = 1, 384, 192, 2, 64
    q = jnp.asarray(rng.normal(size=(B, Tq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Tk, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Tk, H, D)).astype(np.float32))
    k32 = np.asarray(k, np.float32)
    kn = jnp.asarray(np.sqrt((k32**2).sum(-1).max(axis=1)))
    acc, l = flash_attention_partial_tpu(
        q, k, v, kn, blk_q=128, blk_k=128, n_interleave=1, interpret=True
    )
    out = acc / jnp.maximum(l[..., None], 1e-30)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_router_respects_default_device_override(rng):
    """sdpa must NOT route into Pallas kernels for work pinned to the CPU
    backend via jax.default_device inside a TPU process (sfm/device.py) —
    pallas_call cannot lower on CPU."""
    from pi3_slam_tpu.ops.attention import on_tpu_platform

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        assert not on_tpu_platform()
        q = jnp.asarray(rng.normal(size=(1, 300, 2, 64)).astype(np.float32))
        out = sdpa(q, q, q)  # would raise on CPU if routed to pallas
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="needs TPU")
def test_full_model_packed_path_matches_cpu_on_tpu():
    """Whole-model numerics of the packed TPU path vs the CPU reference
    forward (fp32, D=64 heads so the packed kernels engage). Verified on
    v5e 2026-08-17: maxabs <= 5.2e-6 across all four outputs."""
    from pi3_slam_tpu.models import Pi3Config, init_pi3_params, pi3_forward
    from pi3_slam_tpu.models.dinov2 import DinoV2Config

    enc = DinoV2Config(depth=2, embed_dim=128, num_heads=2, mlp_ratio=2)
    cfg = Pi3Config(
        encoder=enc, dec_embed_dim=128, dec_num_heads=2, dec_depth=4,
        mlp_ratio=2, head_dim=128, head_depth=2, head_num_heads=2,
        camera_dim=128,
    )
    params = init_pi3_params(0, cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 3, 3, 224, 238)).astype(np.float32)
    )
    with jax.default_matmul_precision("float32"):
        out_tpu = jax.jit(
            lambda p, x: pi3_forward(p, x, cfg, compute_dtype=jnp.float32)
        )(params, imgs)
        out_tpu = {k: np.asarray(v) for k, v in out_tpu.items()}
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), jax.default_matmul_precision("float32"):
        out_cpu = jax.jit(
            lambda p, x: pi3_forward(p, x, cfg, compute_dtype=jnp.float32)
        )(params, imgs)
        out_cpu = {k: np.asarray(v) for k, v in out_cpu.items()}
    for k in out_cpu:
        np.testing.assert_allclose(out_tpu[k], out_cpu[k], atol=1e-4)


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="needs TPU")
def test_pallas_kernel_matches_reference_on_tpu(rng):
    from pi3_slam_tpu.ops.pallas_attention import flash_attention_tpu
    from pi3_slam_tpu.ops.attention import sdpa_reference

    q = jnp.asarray(rng.normal(size=(2, 300, 4, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 300, 4, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 300, 4, 64)).astype(np.float32))
    o = flash_attention_tpu(q, k, v, blk_q=128, blk_k=128)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-2)  # base-2 softmax + TPU default matmul precision


def test_single_pass_packed_q_scale(rng):
    """q_scale on the f32 logits == pre-scaling q (the encoder no-fold path)."""
    from pi3_slam_tpu.ops.pallas_attention import (
        LOG2_E,
        attention_single_pass_packed_tpu,
    )

    b, t, h, d = 2, 300, 4, 64
    c = h * d
    raw = rng.standard_normal((3, b, t, h, d)).astype(np.float32) * 0.3
    q, k, v = (jnp.asarray(a) for a in raw)
    s = d**-0.5 * LOG2_E
    packed_scaled = jnp.concatenate(
        [(q * s).reshape(b, t, c), k.reshape(b, t, c), v.reshape(b, t, c)], -1
    )
    packed_raw = jnp.concatenate(
        [q.reshape(b, t, c), k.reshape(b, t, c), v.reshape(b, t, c)], -1
    )
    ref = attention_single_pass_packed_tpu(packed_scaled, h, interpret=True)
    got = attention_single_pass_packed_tpu(packed_raw, h, q_scale=s, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
