"""CrossBlockRope parity vs the reference torch layer (random weights) —
the cross-attention zoo entry gets real numerical coverage, not just smoke."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from pi3_slam_tpu.models.cross_attention import cross_block
from pi3_slam_tpu.ops.rope import make_patch_positions

REFERENCE_PATH = "/root/reference"


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _convert_cross_block(sd):
    """Torch CrossBlockRope state_dict -> cross_block params."""
    def attn(prefix):
        p = {
            "qkv_kernel": _t(sd[f"{prefix}.qkv.weight"]),
            "qkv_bias": np.asarray(sd[f"{prefix}.qkv.bias"]),
            "proj_kernel": _t(sd[f"{prefix}.proj.weight"]),
            "proj_bias": np.asarray(sd[f"{prefix}.proj.bias"]),
        }
        if f"{prefix}.q_norm.weight" in sd:
            p["q_norm_scale"] = np.asarray(sd[f"{prefix}.q_norm.weight"])
            p["q_norm_bias"] = np.asarray(sd[f"{prefix}.q_norm.bias"])
            p["k_norm_scale"] = np.asarray(sd[f"{prefix}.k_norm.weight"])
            p["k_norm_bias"] = np.asarray(sd[f"{prefix}.k_norm.bias"])
        return p

    def cross(prefix):
        p = {
            "q_kernel": _t(sd[f"{prefix}.q_proj.weight"]),
            "q_bias": np.asarray(sd[f"{prefix}.q_proj.bias"]),
            "k_kernel": _t(sd[f"{prefix}.k_proj.weight"]),
            "k_bias": np.asarray(sd[f"{prefix}.k_proj.bias"]),
            "v_kernel": _t(sd[f"{prefix}.v_proj.weight"]),
            "v_bias": np.asarray(sd[f"{prefix}.v_proj.bias"]),
            "proj_kernel": _t(sd[f"{prefix}.proj.weight"]),
            "proj_bias": np.asarray(sd[f"{prefix}.proj.bias"]),
        }
        if f"{prefix}.q_norm.weight" in sd:
            p["q_norm_scale"] = np.asarray(sd[f"{prefix}.q_norm.weight"])
            p["q_norm_bias"] = np.asarray(sd[f"{prefix}.q_norm.bias"])
            p["k_norm_scale"] = np.asarray(sd[f"{prefix}.k_norm.weight"])
            p["k_norm_bias"] = np.asarray(sd[f"{prefix}.k_norm.bias"])
        return p

    params = {
        "norm1_scale": np.asarray(sd["norm1.weight"]),
        "norm1_bias": np.asarray(sd["norm1.bias"]),
        "self_attn": attn("attn"),
        "norm2_scale": np.asarray(sd["norm2.weight"]),
        "norm2_bias": np.asarray(sd["norm2.bias"]),
        "norm_y_scale": np.asarray(sd["norm_y.weight"]),
        "norm_y_bias": np.asarray(sd["norm_y.bias"]),
        "cross_attn": cross("cross_attn"),
        "norm3_scale": np.asarray(sd["norm3.weight"]),
        "norm3_bias": np.asarray(sd["norm3.bias"]),
        "mlp": {
            "fc1_kernel": _t(sd["mlp.fc1.weight"]),
            "fc1_bias": np.asarray(sd["mlp.fc1.bias"]),
            "fc2_kernel": _t(sd["mlp.fc2.weight"]),
            "fc2_bias": np.asarray(sd["mlp.fc2.bias"]),
        },
    }
    if "ls1.gamma" in sd:
        params["ls1"] = np.asarray(sd["ls1.gamma"])
        params["ls2"] = np.asarray(sd["ls2.gamma"])
        params["ls_y"] = np.asarray(sd["ls_y.gamma"])
    return params


@pytest.mark.parametrize("qk_norm,init_values", [(True, 0.01), (False, None)])
def test_cross_block_parity(qk_norm, init_values):
    torch = pytest.importorskip("torch")

    sys.path.insert(0, REFERENCE_PATH)
    try:
        from pi3.models.layers.block import CrossBlockRope
        from pi3.models.layers.attention import AttentionRope, CrossAttentionRope
        from pi3.models.layers.pos_embed import RoPE2D
    finally:
        sys.path.remove(REFERENCE_PATH)

    dim, heads = 64, 4
    torch.manual_seed(0)
    rope = RoPE2D(freq=100.0)
    block = CrossBlockRope(
        dim, heads, mlp_ratio=4.0, qkv_bias=True,
        attn_class=AttentionRope, cross_attn_class=CrossAttentionRope,
        init_values=init_values, qk_norm=qk_norm, rope=rope,
    )
    block.eval()

    B, h, w = 2, 3, 5
    T = h * w
    gen = torch.Generator().manual_seed(1)
    x = torch.randn(B, T, dim, generator=gen)
    y = torch.randn(B, T, dim, generator=gen)
    pos = np.asarray(make_patch_positions(B, h, w))
    tpos = torch.from_numpy(pos).long()

    with torch.no_grad():
        ref = block(x, y, xpos=tpos, ypos=tpos).numpy()

    sd = {k: v.numpy() for k, v in block.state_dict().items()}
    params = _convert_cross_block(sd)
    out = cross_block(
        jnp.asarray(x.numpy()), jnp.asarray(y.numpy()), params, heads,
        xpos=jnp.asarray(pos), ypos=jnp.asarray(pos), rope_base=100.0,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
