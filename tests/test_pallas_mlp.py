"""Fused MLP Pallas kernel tests (interpret mode on CPU CI).

Guards the kernels in ops/pallas_mlp.py against the pure-JAX reference
(models/layers.mlp / layer_norm) between TPU bench runs; TPU numerics are
pinned by the whole-model TPU-vs-CPU parity test.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pi3_slam_tpu.models.layers import layer_norm, mlp
from pi3_slam_tpu.ops.pallas_mlp import (
    _n_hidden_blocks,
    block_mlp_fused_tpu,
    mlp_fused_supported,
    mlp_fused_tpu,
)


def _params(rng, c, hidden, dtype=np.float32):
    return {
        "fc1_kernel": jnp.asarray(rng.normal(size=(c, hidden)).astype(dtype) * 0.05),
        "fc1_bias": jnp.asarray(rng.normal(size=(hidden,)).astype(dtype) * 0.1),
        "fc2_kernel": jnp.asarray(rng.normal(size=(hidden, c)).astype(dtype) * 0.05),
        "fc2_bias": jnp.asarray(rng.normal(size=(c,)).astype(dtype) * 0.1),
    }


@pytest.mark.parametrize("t,c,hidden,blk", [(300, 256, 1024, 128), (512, 128, 512, 256)])
def test_mlp_fused_interpret_parity(rng, t, c, hidden, blk):
    p = _params(rng, c, hidden)
    x = jnp.asarray(rng.normal(size=(2, t, c)).astype(np.float32) * 0.5)
    out = mlp_fused_tpu(
        x, p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"], p["fc2_bias"],
        blk_rows=blk, interpret=True,
    )
    ref = mlp(x, p)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("with_ls", [True, False])
@pytest.mark.parametrize("ln_stats", ["vpu", "mxu"])
def test_block_mlp_fused_interpret_parity(rng, with_ls, ln_stats):
    c, hidden, t = 256, 1024, 317  # odd T exercises the row padding
    p = _params(rng, c, hidden)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))
    ls = (
        jnp.asarray(0.9 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
        if with_ls
        else None
    )
    x = jnp.asarray(rng.normal(size=(3, t, c)).astype(np.float32))
    out = block_mlp_fused_tpu(
        x, scale, bias, p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"],
        p["fc2_bias"], ls=ls, eps=1e-6, blk_rows=128, ln_stats=ln_stats,
        interpret=True,
    )
    h = mlp(layer_norm(x, scale, bias, 1e-6), p)
    if ls is not None:
        h = h * ls
    ref = x + h
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5)


def test_mlp_fused_bf16_smoke(rng):
    c, hidden = 256, 1024
    p = _params(rng, c, hidden)
    x = jnp.asarray(rng.normal(size=(1, 200, c)).astype(np.float32) * 0.5)
    out = mlp_fused_tpu(
        x.astype(jnp.bfloat16),
        p["fc1_kernel"].astype(jnp.bfloat16),
        p["fc1_bias"],
        p["fc2_kernel"].astype(jnp.bfloat16),
        p["fc2_bias"],
        blk_rows=128,
        interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    ref = mlp(x, p)  # fp32 reference; the kernel's fp32 GELU sits between
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.15, rtol=0.1
    )


@pytest.mark.parametrize("dp,sp", [(4, 1), (2, 2)])
def test_sharded_block_mlp_matches_plain(rng, dp, sp):
    """Under a dp(/sp) mesh the fused block-MLP runs per-shard inside
    shard_map (interpret mode on the CPU mesh) and matches the plain path."""
    import jax

    if len(jax.devices()) < dp * sp:
        pytest.skip("needs 8 virtual devices")
    from pi3_slam_tpu.parallel import make_mesh
    from pi3_slam_tpu.parallel.context import sharded_block_mlp, tp_mesh_context

    c, hidden, b, t = 256, 1024, 4, 256
    p = _params(rng, c, hidden)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))
    ls = jnp.asarray(0.9 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    mesh = make_mesh(dp, 1, n_sp=sp)
    with tp_mesh_context(mesh):
        out = sharded_block_mlp(
            x, scale, bias, p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"],
            p["fc2_bias"], ls=ls, eps=1e-6, interpret=True,
        )
    ref = x + ls * mlp(layer_norm(x, scale, bias, 1e-6), p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5)


def test_shape_gates():
    assert mlp_fused_supported(1024, 4096)
    assert not mlp_fused_supported(1000, 4096)
    assert not mlp_fused_supported(1024, 4100)
    assert _n_hidden_blocks(4096, None) == 4  # tuned default at the Pi3 shape
    assert _n_hidden_blocks(512, None) == 4
    assert _n_hidden_blocks(1280, None) == 2  # 1280/4 not lane-aligned
    assert _n_hidden_blocks(128, None) == 1
    with pytest.raises(ValueError):
        _n_hidden_blocks(4096, 3)


def test_mlp_fused_2d_and_fallback_paths(rng):
    """ndim==2 inputs and big-prime T take the flatten+pad fallback; both
    must match the exact-3D path numerics."""
    c, hidden = 128, 256
    p = _params(rng, c, hidden)
    # 2D input -> fallback row grid
    x2 = jnp.asarray(rng.normal(size=(317, c)).astype(np.float32))
    out2 = mlp_fused_tpu(
        x2, p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"], p["fc2_bias"],
        blk_rows=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(mlp(x2, p)), atol=2e-5, rtol=1e-5)
    # 3D with prime T > hi -> no exact divisor -> fallback
    x3 = jnp.asarray(rng.normal(size=(2, 2053, c)).astype(np.float32))
    out3 = mlp_fused_tpu(
        x3, p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"], p["fc2_bias"],
        blk_rows=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out3), np.asarray(mlp(x3, p)), atol=2e-5, rtol=1e-5)


def test_token_block_selection():
    from pi3_slam_tpu.ops.pallas_mlp import _token_block

    assert _token_block(643, 256) == 643          # small T: whole-T block
    # 64300 = 2^2 * 5^2 * 643 has no 8-multiple divisor in range: the
    # flattened chunk shape takes the pad fallback (B=1 flatten is free)
    assert _token_block(64300, 256) is None
    assert _token_block(64512, 256) == 256
    assert _token_block(2048, 256) == 256  # prefer the tuned divisor over whole-T
    assert _token_block(2053 * 2, 256) is None    # prime factors too large


def test_block_mlp_defaults_accept_any_gated_hidden(rng):
    """The default n_hidden_blocks must be legal for every hidden dim the
    layers.block gate admits (regression: an explicit default of 4 crashed
    hidden=1280, whose only legal splits are 2 and 1)."""
    c, hidden, t = 128, 1280, 64
    p = _params(rng, c, hidden)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, t, c)).astype(np.float32))
    out = block_mlp_fused_tpu(
        x, scale, bias, p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"],
        p["fc2_bias"], interpret=True,
    )
    ref = x + mlp(layer_norm(x, scale, bias, 1e-6), p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5)
