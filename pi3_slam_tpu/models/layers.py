"""Shared transformer building blocks as pure functions.

One generic pre-norm block covers the reference's Block (dinov2) and
BlockRope (pi3) variants: optional LayerScale, optional qk-norm, optional
RoPE2D. Parameters are dicts of (in, out)-oriented kernels so conversion from
torch Linear weights is a transpose.

Reference: pi3/models/layers/block.py:259-335 (BlockRope),
pi3/models/dinov2/layers (Block/Mlp/LayerScale), attention.py:238-345
(AttentionRope/FlashAttentionRope).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.rope import rope_2d


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LayerNorm over the last dim, computed in fp32 (torch autocast keeps
    normalizations in fp32 under AMP)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def linear(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None) -> jnp.ndarray:
    y = x @ kernel.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def mlp(x: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    """fc1 -> exact-erf GELU -> fc2 (dinov2 Mlp)."""
    h = linear(x, p["fc1_kernel"], p["fc1_bias"])
    h = jax.nn.gelu(h, approximate=False)
    return linear(h, p["fc2_kernel"], p["fc2_bias"])


def _pallas_mlp_supported(c: int, hidden: int) -> bool:
    from ..ops.pallas_mlp import _n_hidden_blocks, mlp_fused_supported

    return mlp_fused_supported(c, hidden) and _n_hidden_blocks(hidden, None) >= 2


def attention(
    x: jnp.ndarray,
    p: Dict[str, Any],
    num_heads: int,
    positions: jnp.ndarray | None = None,
    rope_base: float = 100.0,
    qk_norm_eps: float = 1e-5,
    kv_groups: tuple | None = None,
) -> jnp.ndarray:
    """Self-attention with optional qk LayerNorm and RoPE2D.

    x: (B, T, C). Params may contain q_norm_scale/k_norm_scale for qk-norm.
    kv_groups = (n_frames, tokens_per_frame, merge): EXPERIMENTAL token-merge
    acceleration for the decoder's global blocks (Pi3Config.global_kv_merge)
    — see _merged_kv_attention below. merge <= 1 is exact and ignored.
    """
    b, t, c = x.shape
    d = c // num_heads

    from ..ops.attention import (
        MEDIUM_SEQUENCE_THRESHOLD,
        conservative_kernels,
        on_tpu_platform,
    )
    from ..parallel.context import current_tp_mesh, sharded_sdpa

    if (
        kv_groups is not None
        and kv_groups[2] > 1
        and kv_groups[0] % kv_groups[2] == 0
        and current_tp_mesh() is None
    ):
        return _merged_kv_attention(
            x, p, num_heads, positions, rope_base, qk_norm_eps, kv_groups
        )

    use_packed = (
        current_tp_mesh() is None
        and on_tpu_platform()
        and d == 64
        and num_heads % 2 == 0
        and t >= MEDIUM_SEQUENCE_THRESHOLD
    )
    if use_packed:
        # packed transpose-free path: the Pallas kernels read the native
        # (B, T, 3*H*D) qkv-projection layout and emit (B, T, C) directly
        # for proj. The (B,T,H,D)->(B*H,Tp,D) relayouts this kills cost more
        # than the softmax they fed (28 ms/18 ms per global/frame block,
        # measured).
        from ..ops.pallas_attention import (
            LOG2_E,
            SINGLE_PASS_MAX_T,
            _ceil_to,
            attention_single_pass_packed_tpu,
            flash_attention_packed_tpu,
        )

        has_norm = "q_norm_scale" in p
        scale = d**-0.5 * LOG2_E
        if positions is None and not has_norm:
            # no qk-norm / RoPE (DINOv2 encoder blocks): the qkv matmul
            # output IS the packed kernel input — no slice/scale/concat
            # round-trip over the (B, T, 3C) activation (measured ~5 ms/
            # block of fusions+layout copies at the 100x643 encoder shape).
            # The softmax scale rides the kernel's f32 logits (q_scale);
            # the rare long-T case folds it into the q projection weights.
            if t <= SINGLE_PASS_MAX_T:
                packed = linear(x, p["qkv_kernel"], p["qkv_bias"])
                if conservative_kernels():  # restore the 128-aligned lattice
                    tp = _ceil_to(t, 128)
                    packed = jnp.pad(packed, ((0, 0), (0, tp - t), (0, 0)))
                    out = attention_single_pass_packed_tpu(
                        packed, num_heads, true_t=t, q_scale=scale
                    )
                else:
                    out = attention_single_pass_packed_tpu(
                        packed, num_heads, q_scale=scale
                    )
            else:
                kq = jnp.concatenate(
                    [p["qkv_kernel"][:, :c] * scale, p["qkv_kernel"][:, c:]],
                    axis=-1,
                )
                bq = jnp.concatenate([p["qkv_bias"][:c] * scale, p["qkv_bias"][c:]])
                out = flash_attention_packed_tpu(linear(x, kq, bq), num_heads)
            return linear(out, p["proj_kernel"], p["proj_bias"])

        # qk-norm / RoPE producer (decoder + head blocks): per-head LN, the
        # RoPE rotation, the softmax scale, the q|k|v pack AND the pad to the
        # attention lattice all happen in one fused Pallas pass over the raw
        # qkv projection (ops/pallas_producer.py) — replacing ~6 XLA loop
        # fusions + layout copies per block (measured 12.4 ms per decoder
        # pair-step, 5-6x the one-read-one-write HBM floor this kernel hits).
        from ..ops.pallas_attention import flash_packed_lattice
        from ..ops.pallas_producer import qkv_rope_producer_tpu
        from ..ops.rope import rope_tables

        if positions is not None:
            cos, sin = rope_tables(positions, d, rope_base)
        else:  # qk-norm without RoPE: identity rotation
            cos = jnp.ones((b, t, d), jnp.float32)
            sin = jnp.zeros((b, t, d), jnp.float32)
        qkv_raw = linear(x, p["qkv_kernel"], p["qkv_bias"])
        single = t <= SINGLE_PASS_MAX_T
        # single-pass: T is never gridded, so the producer emits the exact
        # unpadded length; flash: the producer writes straight onto the
        # kernel's 2048-lattice and hands over the per-head k norms so the
        # kernel skips its own k re-read (a T-minor layout copy in XLA).
        # conservative_kernels() keeps the 128-aligned producer lattice and
        # the kernels' internal kn (bench.py's crash-retry escape hatch).
        conservative = conservative_kernels()
        if single:
            out_t = _ceil_to(t, 128) if conservative else t
        else:
            out_t = flash_packed_lattice(t)
        want_kn = not single and not conservative
        packed = qkv_rope_producer_tpu(
            qkv_raw,
            cos,
            sin,
            num_heads,
            out_t,
            q_norm_scale=p.get("q_norm_scale"),
            q_norm_bias=p.get("q_norm_bias"),
            k_norm_scale=p.get("k_norm_scale"),
            k_norm_bias=p.get("k_norm_bias"),
            eps=qk_norm_eps,
            return_k_norms=want_kn,
        )
        if single:
            out = attention_single_pass_packed_tpu(packed, num_heads, true_t=t)
        elif want_kn:
            packed, kn = packed
            out = flash_attention_packed_tpu(packed, num_heads, true_t=t, kn=kn)
        else:
            out = flash_attention_packed_tpu(packed, num_heads, true_t=t)
        return linear(out, p["proj_kernel"], p["proj_bias"])

    qkv = linear(x, p["qkv_kernel"], p["qkv_bias"]).reshape(b, t, 3, num_heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if "q_norm_scale" in p:
        q = layer_norm(q, p["q_norm_scale"], p["q_norm_bias"], qk_norm_eps)
        k = layer_norm(k, p["k_norm_scale"], p["k_norm_bias"], qk_norm_eps)
    if positions is not None:
        q = rope_2d(q, positions, rope_base)
        k = rope_2d(k, positions, rope_base)

    # mesh-sharded under an active mesh (parallel/context.py); plain sdpa
    # otherwise — GSPMD alone would all-gather qkv and replicate attention
    out = sharded_sdpa(q, k, v).reshape(b, t, c)
    return linear(out, p["proj_kernel"], p["proj_bias"])


def _merged_kv_attention(
    x: jnp.ndarray,
    p: Dict[str, Any],
    num_heads: int,
    positions: jnp.ndarray | None,
    rope_base: float,
    qk_norm_eps: float,
    kv_groups: tuple,
) -> jnp.ndarray:
    """EXPERIMENTAL global attention with cross-frame key/value merging.

    FastVGGT-style training-free acceleration (arxiv 2509.02560): VGGT-family
    global attention is highly redundant across frames, so keys/values from
    ``merge`` consecutive frames are averaged PER SPATIAL POSITION (after
    qk-norm + RoPE — tokens in a group share a position, so the identical
    rotation commutes with the mean) while queries keep full resolution.
    QK^T and PV FLOPs drop by the merge factor. For exactly-duplicated
    frames this is EXACT (uniform group sizes cancel in the softmax — see
    tests/test_pi3_model.py); for real motion it is an approximation whose
    accuracy must be validated against a pretrained checkpoint before
    production use, which is why Pi3Config.global_kv_merge defaults to 1.
    On TPU the Tq != Tk attention runs through the bound-softmax partial
    kernel (ops/pallas_attention.flash_attention_partial_tpu, the ring-step
    kernel) — numerator/denominator accumulated in one pass, divided here.
    """
    b, t, c = x.shape
    d = c // num_heads
    nf, tpf, m = kv_groups

    from ..ops.attention import on_tpu_platform
    from ..ops.rope import rope_2d

    qkv = linear(x, p["qkv_kernel"], p["qkv_bias"]).reshape(b, t, 3, num_heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if "q_norm_scale" in p:
        q = layer_norm(q, p["q_norm_scale"], p["q_norm_bias"], qk_norm_eps)
        k = layer_norm(k, p["k_norm_scale"], p["k_norm_bias"], qk_norm_eps)
    if positions is not None:
        q = rope_2d(q, positions, rope_base)
        k = rope_2d(k, positions, rope_base)

    def merge(a):
        grouped = a.reshape(b, nf // m, m, tpf, num_heads, d)
        return grouped.mean(axis=2).reshape(b, (nf // m) * tpf, num_heads, d)

    k, v = merge(k), merge(v)

    if on_tpu_platform() and d == 64:
        from ..ops.pallas_attention import flash_attention_partial_tpu

        k32 = k.astype(jnp.float32)
        kn = jnp.sqrt(jnp.max(jnp.sum(k32 * k32, axis=-1), axis=1))  # (B, H)
        acc, l = flash_attention_partial_tpu(q, k, v, kn)
        out = (acc / jnp.maximum(l[..., None], 1e-30)).astype(x.dtype)
    else:
        from ..ops.attention import sdpa_reference

        out = sdpa_reference(q, k, v).astype(x.dtype)
    return linear(out.reshape(b, t, c), p["proj_kernel"], p["proj_bias"])


def block(
    x: jnp.ndarray,
    p: Dict[str, Any],
    num_heads: int,
    positions: jnp.ndarray | None = None,
    rope_base: float = 100.0,
    norm_eps: float = 1e-6,
    kv_groups: tuple | None = None,
) -> jnp.ndarray:
    """Pre-norm transformer block: x + ls1*attn(norm1(x)); x + ls2*mlp(norm2(x)).

    LayerScale applied iff 'ls1' in params; qk-norm iff 'q_norm_scale' in the
    attn params; RoPE iff positions is not None. kv_groups: see attention().
    """
    from ..parallel.context import replicate_over_tp

    x = replicate_over_tp(x)
    h = attention(
        layer_norm(x, p["norm1_scale"], p["norm1_bias"], norm_eps),
        p,
        num_heads,
        positions=positions,
        rope_base=rope_base,
        kv_groups=kv_groups,
    )
    if "ls1" in p:
        h = h * p["ls1"].astype(h.dtype)
    # identity off-mesh; under tp pins the canonical Megatron pattern (one
    # activation psum per residual) — see parallel/context.py
    x = replicate_over_tp(x + h)

    from ..ops.attention import on_tpu_platform
    from ..parallel.context import _tp_degree, current_tp_mesh, sharded_block_mlp

    mesh = current_tp_mesh()
    c, hidden = p["fc1_kernel"].shape[-2:]
    if (
        on_tpu_platform()
        and (mesh is None or _tp_degree(mesh) == 1)
        and _pallas_mlp_supported(c, hidden)
    ):
        # fused LN+MLP+LayerScale+residual kernel: the hidden (T, 4C) tensor
        # never round-trips HBM and the LN/residual elementwise passes fold
        # into the matmul pipeline (ops/pallas_mlp.py). Under a dp/sp mesh it
        # runs inside shard_map on each device's row shard (a pallas_call is
        # opaque to GSPMD); tp>1 keeps the plain matmuls for the Megatron
        # fc1/fc2 split.
        return sharded_block_mlp(
            x,
            p["norm2_scale"],
            p["norm2_bias"],
            p["fc1_kernel"],
            p["fc1_bias"],
            p["fc2_kernel"],
            p["fc2_bias"],
            ls=p.get("ls2"),
            eps=norm_eps,
        )

    h = mlp(layer_norm(x, p["norm2_scale"], p["norm2_bias"], norm_eps), p)
    if "ls2" in p:
        h = h * p["ls2"].astype(h.dtype)
    return replicate_over_tp(x + h)
