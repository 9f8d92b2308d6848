"""Cross-attention block (CrossAttentionRope / CrossBlockRope equivalents).

The reference layer library ships RoPE cross-attention blocks
(pi3/models/layers/attention.py:119-236, block.py:338-406) used by related
visual-geometry models; Pi3 inference itself only uses self-attention. Kept
here so the layer zoo is complete for model variants.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .layers import layer_norm, linear
from ..ops.attention import sdpa
from ..ops.rope import rope_2d


def cross_attention(
    x: jnp.ndarray,
    key_in: jnp.ndarray,
    value_in: jnp.ndarray,
    p: Dict[str, Any],
    num_heads: int,
    qpos: jnp.ndarray | None = None,
    kpos: jnp.ndarray | None = None,
    rope_base: float = 100.0,
    qk_norm_eps: float = 1e-5,
) -> jnp.ndarray:
    """Cross attention with separate q/k/v projections and RoPE on q, k."""
    b, tq, c = x.shape
    d = c // num_heads
    q = linear(x, p["q_kernel"], p["q_bias"]).reshape(b, tq, num_heads, d)
    k = linear(key_in, p["k_kernel"], p["k_bias"]).reshape(b, -1, num_heads, d)
    v = linear(value_in, p["v_kernel"], p["v_bias"]).reshape(b, -1, num_heads, d)
    if "q_norm_scale" in p:
        q = layer_norm(q, p["q_norm_scale"], p["q_norm_bias"], qk_norm_eps)
        k = layer_norm(k, p["k_norm_scale"], p["k_norm_bias"], qk_norm_eps)
    if qpos is not None:
        q = rope_2d(q, qpos, rope_base)
    if kpos is not None:
        k = rope_2d(k, kpos, rope_base)
    out = sdpa(q, k, v).reshape(b, tq, c)
    return linear(out, p["proj_kernel"], p["proj_bias"])


def cross_block(
    x: jnp.ndarray,
    y: jnp.ndarray,
    p: Dict[str, Any],
    num_heads: int,
    xpos: jnp.ndarray | None = None,
    ypos: jnp.ndarray | None = None,
    rope_base: float = 100.0,
    norm_eps: float = 1e-6,
) -> jnp.ndarray:
    """CrossBlockRope: self-attn, cross-attn to normed y, MLP — each with
    pre-norm, residual, optional LayerScale."""
    from .layers import attention, mlp

    h = attention(
        layer_norm(x, p["norm1_scale"], p["norm1_bias"], norm_eps),
        p["self_attn"],
        num_heads,
        positions=xpos,
        rope_base=rope_base,
    )
    if "ls1" in p:
        h = h * p["ls1"].astype(h.dtype)
    x = x + h

    y_n = layer_norm(y, p["norm_y_scale"], p["norm_y_bias"], norm_eps)
    h = cross_attention(
        layer_norm(x, p["norm2_scale"], p["norm2_bias"], norm_eps),
        y_n,
        y_n,
        p["cross_attn"],
        num_heads,
        qpos=xpos,
        kpos=ypos,
        rope_base=rope_base,
    )
    if "ls_y" in p:
        h = h * p["ls_y"].astype(h.dtype)
    x = x + h

    h = mlp(layer_norm(x, p["norm3_scale"], p["norm3_bias"], norm_eps), p["mlp"])
    if "ls2" in p:
        h = h * p["ls2"].astype(h.dtype)
    return x + h
