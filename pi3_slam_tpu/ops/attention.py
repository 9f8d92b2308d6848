"""Scaled dot-product attention for (B, T, H, D) layouts.

Uses jax.nn.dot_product_attention so XLA lowers to its fused attention path
on TPU (and can be swapped for the Pallas flash kernel in ops/flash_attention
for long global-attention sequences). Replaces the reference's torch SDPA zoo
(pi3/models/layers/attention.py:36-368).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sequences at least this long route through blockwise online-softmax
# attention: O(T * block) memory instead of the O(T^2) logits tensor, which
# for a 100-frame chunk's global blocks (~65k tokens) would be hundreds of GB.
LONG_SEQUENCE_THRESHOLD = 4096

# Medium sequences (the ~650-token frame-attention / encoder shapes) route
# through the single-pass Pallas kernel on TPU: the whole (T, T) logits tile
# stays in VMEM, ~2.2x faster than XLA SDPA which round-trips logits via HBM.
MEDIUM_SEQUENCE_THRESHOLD = 256


def conservative_kernels() -> bool:
    """PI3_CONSERVATIVE_KERNELS=1 keeps the battle-tested 128-aligned kernel
    paths (internal pads, in-kernel k-norms, 2D MLP row grid) instead of the
    newest layout-free ones — bench.py's crash-retry sets it so a Mosaic
    rejection of a new path can never cost the round's one recorded number."""
    import os

    return os.environ.get("PI3_CONSERVATIVE_KERNELS", "") not in ("", "0")


def on_tpu_platform() -> bool:
    """True when work dispatched here lands on TPU. Respects an active
    ``jax.default_device`` override (e.g. sfm/device.py pinning solvers to
    the CPU backend inside a TPU process) — the process-global
    ``jax.default_backend()`` alone would route those traces into Pallas
    kernels that cannot lower on CPU."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    implementation: str | None = None,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(d)) v over (B, T, H, D) tensors -> (B, T, H, D)."""
    T = q.shape[1]
    on_tpu = on_tpu_platform() and q.shape[-1] % 64 == 0
    if T >= LONG_SEQUENCE_THRESHOLD:
        if on_tpu:
            from .pallas_attention import flash_attention_tpu

            # custom Pallas flash kernel: ~4.4x the XLA blockwise path at the
            # 100-frame global-attention shape (65k tokens) on v5e
            return flash_attention_tpu(q, k, v)
        from .flash_attention import blockwise_attention

        return blockwise_attention(q, k, v)
    if on_tpu and MEDIUM_SEQUENCE_THRESHOLD <= T:
        from .pallas_attention import SINGLE_PASS_MAX_T, attention_single_pass_tpu

        if T <= SINGLE_PASS_MAX_T:
            return attention_single_pass_tpu(q, k, v)
        from .pallas_attention import flash_attention_tpu

        return flash_attention_tpu(q, k, v)
    try:
        return jax.nn.dot_product_attention(q, k, v, implementation=implementation)
    except Exception:
        return sdpa_reference(q, k, v)


def sdpa_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Explicit einsum implementation (numerical debugging / fallback)."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def attention_score_matrix(
    q: jnp.ndarray, k: jnp.ndarray, frame_num: int, token_length: int
) -> jnp.ndarray:
    """Frame-to-frame attention score diagnostic (get_attn_score,
    pi3/models/layers/attention.py:349-368): head-summed raw scores averaged
    over token blocks -> (B, frame_num, frame_num) frame affinity."""
    d = q.shape[-1]
    score = jnp.einsum("bqhd,bkhd->bqk", q * (d**-0.5), k)  # sum over heads
    b = q.shape[0]
    score = score.reshape(b, frame_num, token_length, frame_num, token_length)
    return jnp.mean(score, axis=(2, 4))
