"""Fused qkv-producer Pallas TPU kernel: per-head qk-LayerNorm + RoPE2D +
softmax scaling + attention-lattice padding in ONE pass over the packed
(B, T, 3*H*D) qkv projection output.

What it replaces (the decoder/head producer chain of the reference hot loop,
pi3/models/layers/attention.py:238-345 → our models/layers.attention): XLA
compiles the slice-q/k/v → per-head LN → RoPE → scale → concat → pad chain
into ~6 loop fusions + layout copies per block, measured ~12.4 ms per decoder
pair-step at the 100-frame chunk shape (fusion.607/608 et al. in the device
trace) — 5-6x the ideal one-read-one-write HBM cost of the tensor. This
kernel does the whole chain with one read of the (B, T, 3C) projection and
one write of the padded (B, Tp, 3C) kernel input.

TPU-native tricks (per 128-lane head-PAIR block, D == 64, H even — the
packed-kernel layout of ops/pallas_attention.py):

  * per-head LayerNorm statistics via MXU: the mean over each 64-lane half
    of a (rows, 128) tile is ``x @ M`` with M the (128, 128) block-diagonal
    averaging matrix (M[i,j] = 1/64 iff i//64 == j//64) — no 64-lane-strided
    VPU reductions, which Mosaic lays out badly. Variance = (x*x) @ M - m².
  * RoPE rotation via lane rolls: the GPT-NeoX pair rotation (i, i+16
    within each 32-lane half — ops/rope.py layout [y-half | x-half]) is two
    static ``pltpu.roll``s by ±16 lanes + a lane-parity select — exact in
    any dtype, no MXU trip (the wrap-around lanes are never selected).
  * cos/sin tables are computed once per call from the integer positions
    (ops/rope.py::rope_tables) as (B, T, 64) arrays — 64 lanes per token,
    not per-head-replicated — and tiled to the 128-lane pair inside VMEM.
  * the output is written directly on the consuming attention kernel's
    padded lattice (rows >= T zeroed in-kernel), so the separate XLA pad of
    the packed tensor and the post-attention slice disappear; the packed
    kernels take ``true_t`` and correct the zero-pad keys exactly as before.

Input rows are addressed with a clamped block index map (out-of-range row
blocks re-read the last valid block; masked rows are zeroed), so the input
needs NO padding either — T may be arbitrary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import LOG2_E, _ceil_to  # shared kernel-contract constants


@functools.lru_cache(maxsize=None)
def _avg_matrix() -> np.ndarray:
    """(128, 128) block-diagonal averaging matrix: two 64-lane halves."""
    m = np.zeros((128, 128), np.float32)
    m[:64, :64] = 1.0 / 64.0
    m[64:, 64:] = 1.0 / 64.0
    return m


def _rope_rotate(xb: jnp.ndarray) -> jnp.ndarray:
    """[-x2 | x1] within each 32-lane half of a (rows, 128) tile, via two
    static lane rolls + a lane-parity select (exact: pure data movement; the
    roll wrap-around lanes are never selected). Mosaic only implements lane
    rotates for 32-bit data, so bf16 tiles round-trip through f32 — still
    exact, the values are merely moved."""
    n = xb.shape[1]
    dt = xb.dtype
    if hasattr(pltpu, "roll"):
        x32 = xb.astype(jnp.float32)
        fwd = pltpu.roll(x32, 16, 1).astype(dt)  # y[j] = x[j - 16]
        bwd = pltpu.roll(x32, n - 16, 1).astype(dt)  # y[j] = x[j + 16] (shift >= 0)
    else:  # interpret / fallback
        fwd = jnp.roll(xb, 16, axis=1)
        bwd = jnp.roll(xb, n - 16, axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1)
    return jnp.where(lanes % 32 < 16, -bwd, fwd)


def _producer_kernel(
    qkv_ref, cos_ref, sin_ref, qs_ref, qb_ref, ks_ref, kb_ref, m_ref,
    o_ref, kn_ref, *, hp: int, n_valid: int, blk_rows: int, eps: float,
    has_norm: bool, scale: float,
):
    i = pl.program_id(1)
    x = qkv_ref[0]  # (blk_rows, 3C)
    cs = cos_ref[0]  # (blk_rows, 64)
    sn = sin_ref[0]
    cs2 = jnp.concatenate([cs, cs], axis=1)  # (blk_rows, 128): head pair
    sn2 = jnp.concatenate([sn, sn], axis=1)
    mavg = m_ref[...]  # (128, 128) f32
    rows = i * blk_rows + jax.lax.broadcasted_iota(jnp.int32, (blk_rows, 1), 0)
    valid = rows < n_valid

    norm_params = ((qs_ref, qb_ref), (ks_ref, kb_ref))
    outs = []
    for region in range(2):  # q, k
        for j in range(hp):
            lb = (region * hp + j) * 128
            xb = x[:, lb : lb + 128]
            if has_norm:
                # per-64-lane-half stats via the block-diagonal averaging
                # matmul; HIGHEST precision so fp32 inputs are not truncated
                # to bf16 on the MXU (bf16 inputs are exact either way)
                x32 = xb.astype(jnp.float32)
                mean = jax.lax.dot_general(
                    x32, mavg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                xc = x32 - mean
                var = jax.lax.dot_general(
                    xc * xc, mavg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                s_ref, b_ref = norm_params[region]
                xn = xc * jax.lax.rsqrt(var + eps)
                xn = xn * s_ref[0:1, :].astype(jnp.float32) + b_ref[
                    0:1, :
                ].astype(jnp.float32)
                xb = xn.astype(x.dtype)
            if region == 1:
                # per-head max squared k-norm (RoPE is a rotation, so the
                # pre-rotation norm is the post-rotation norm): row sums per
                # 64-lane half via the ones-block matmul, rows masked BEFORE
                # the max so out-of-range garbage can't inflate the bound
                xsq = jnp.where(valid, xb.astype(jnp.float32) ** 2, 0.0)
                sq = jax.lax.dot_general(
                    xsq, mavg * 64.0, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (blk_rows, 128): each lane = its half's row sq-norm
                blk_max = jnp.max(sq, axis=0, keepdims=True)  # (1, 128)
                prev = jnp.where(i > 0, kn_ref[0, j : j + 1, :], 0.0)
                kn_ref[0, j : j + 1, :] = jnp.maximum(prev, blk_max)
            yb = xb * cs2 + _rope_rotate(xb) * sn2
            if region == 0:
                yb = yb * jnp.asarray(scale, x.dtype)
            outs.append(yb)
    v = x[:, 2 * hp * 128 :]
    out = jnp.concatenate(outs + [v], axis=1)
    o_ref[0] = jnp.where(valid, out, 0).astype(o_ref.dtype)


def head_k_norms(knsq: jnp.ndarray) -> jnp.ndarray:
    """(B, hp, 128) per-pair max sq-norms -> (B*H,) per-head max |k|, the
    flash kernels' Cauchy-Schwarz bound base (kn operand)."""
    b, hp, _ = knsq.shape
    pair = jnp.stack([knsq[:, :, 0], knsq[:, :, 64]], axis=-1)  # (B, hp, 2)
    return jnp.sqrt(pair.reshape(b * hp * 2))


def _pick_blk_rows(tp: int, t: int) -> int:
    """Largest row block dividing the padded lattice and not exceeding the
    logical row count (so input blocks never extend a whole block past the
    ragged edge)."""
    for r in (1024, 768, 512, 384, 256, 128):
        if tp % r == 0 and r <= t:
            return r
    return 128 if tp % 128 == 0 else tp


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "out_t", "eps", "apply_scale", "return_k_norms", "interpret"
    ),
)
def qkv_rope_producer_tpu(
    qkv: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    num_heads: int,
    out_t: int,
    q_norm_scale: jnp.ndarray | None = None,
    q_norm_bias: jnp.ndarray | None = None,
    k_norm_scale: jnp.ndarray | None = None,
    k_norm_bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
    apply_scale: bool = True,
    return_k_norms: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused qk-norm + RoPE + scale + pad over packed qkv.

    qkv: (B, T, 3*H*D) raw qkv-projection output, lane order (3, H, D) with
    D == 64, H even. cos/sin: (B, T, 64) RoPE tables (rope_tables). Norm
    params: (64,) per-head LayerNorm scale/bias, or None for no qk-norm
    (head decoder blocks). Returns (B, out_t, 3C): q third normed, rotated
    and scaled by D**-0.5 * log2(e) (the packed attention kernels' input
    contract), k third normed and rotated, v copied; rows >= T are exact
    zeros (out_t is the consuming kernel's padded lattice, out_t >= T —
    out_t == T runs fully unpadded). With ``return_k_norms`` also returns
    the per-head max |k| as (B*H,) f32 (post-norm, pre-rotation — RoPE
    preserves norms), ready to feed flash_attention_packed_tpu's ``kn``
    operand so the flash path skips its own full re-read of k (a ~21 ms/
    chunk layout copy: XLA laid the reduce input out T-minor, copying the
    whole packed tensor — see PARITY round-3 table).
    """
    B, T, C3 = qkv.shape
    H = num_heads
    D = C3 // (3 * H)
    assert D == 64 and H % 2 == 0, (H, D)
    assert out_t >= T, (out_t, T)
    hp = H // 2
    has_norm = q_norm_scale is not None
    blk_rows = _pick_blk_rows(out_t, T)
    if blk_rows > T:
        # corner case (tiny T with a larger padded lattice): a block may not
        # exceed an array dim, so bring the inputs up to one block first
        pad = blk_rows - T
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
        cos = jnp.pad(cos, ((0, 0), (0, pad), (0, 0)))
        sin = jnp.pad(sin, ((0, 0), (0, pad), (0, 0)))
    n_in = -(-T // blk_rows)  # ceil: input row blocks (last may be ragged)

    dt = qkv.dtype
    if has_norm:
        qs = jnp.tile(q_norm_scale.reshape(1, 64), (1, 2)).astype(dt)
        qb = jnp.tile(q_norm_bias.reshape(1, 64), (1, 2)).astype(dt)
        ks = jnp.tile(k_norm_scale.reshape(1, 64), (1, 2)).astype(dt)
        kb = jnp.tile(k_norm_bias.reshape(1, 64), (1, 2)).astype(dt)
    else:
        qs = qb = ks = kb = jnp.zeros((1, 128), dt)

    def row_map(b, i):
        return (b, jnp.minimum(i, n_in - 1), 0)

    grid = (B, out_t // blk_rows)
    out, knsq = pl.pallas_call(
        functools.partial(
            _producer_kernel,
            hp=hp,
            n_valid=T,
            blk_rows=blk_rows,
            eps=eps,
            has_norm=has_norm,
            scale=(D**-0.5 * LOG2_E) if apply_scale else 1.0,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_rows, C3), row_map),
            pl.BlockSpec((1, blk_rows, 64), row_map),
            pl.BlockSpec((1, blk_rows, 64), row_map),
            pl.BlockSpec((1, 128), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 128), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 128), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 128), lambda b, i: (0, 0)),
            pl.BlockSpec((128, 128), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_rows, C3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, hp, 128), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, out_t, C3), dt),
            jax.ShapeDtypeStruct((B, hp, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        qkv,
        cos.astype(dt),
        sin.astype(dt),
        qs,
        qb,
        ks,
        kb,
        jnp.asarray(_avg_matrix()),
    )
    if return_k_norms:
        return out, head_k_norms(knsq)
    return out
