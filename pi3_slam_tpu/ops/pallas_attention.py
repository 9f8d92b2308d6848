"""Custom Pallas TPU attention kernels.

Two kernels cover the Pi3 / DINOv2 attention shapes (reference hot loop
pi3/models/pi3.py:156-166, pi3/models/layers/attention.py:323-347):

  * ``flash_attention_tpu`` — FlashAttention-2 schedule for the decoder's
    global blocks (~65k tokens at 100-frame chunks). XLA-level blockwise
    attention materializes (T, block) logits tiles through HBM and tops out
    around 15 TFLOP/s on v5e; this kernel keeps the online-softmax state
    (q tile, logits tile, accumulator, running max/sum) in VMEM and streams
    k/v blocks: grid = (B*H, num_q_blocks, num_k_blocks), the minor (k)
    dimension is sequential on TPU so VMEM scratch carries (acc, m, l) across
    k steps and the output block is written once on the final k step.
    Measured 66-74 TFLOP/s on v5e — at parity with
    jax.experimental.pallas.ops.tpu.flash_attention (65.9) at the same shape,
    and at the hardware cap for head_dim 64: the MXU contracts 128-deep, so
    D=64 QK^T/PV run at half peak regardless of schedule (measured: the same
    kernel at D=128 hits 120 TFLOP/s).

  * ``attention_single_pass_tpu`` — whole-T single-pass softmax for the
    frame-attention / encoder shapes (~650 tokens, batch ~100 frames). The
    full (T, T) fp32 logits tile fits VMEM, so no online-softmax state or
    k-streaming is needed. ~2.2x faster than XLA SDPA at these shapes
    (measured 8.5 ms vs ~19 ms per decoder frame block).

Padding is masked by adding a precomputed (1, Tk) bias row of 0 / -1e30
(one VPU add per logit, vs 3 ops for iota+cmp+select; skipped entirely when
T is block-aligned).

Forward-only (inference framework); no mask beyond tail padding, matching
Pi3's dense bidirectional attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_bias_row(T: int, Tp: int) -> jnp.ndarray:
    """(1, Tp) fp32 row: 0 for valid key columns, -1e30 for padded ones."""
    col = jnp.arange(Tp, dtype=jnp.int32)
    return jnp.where(col < T, 0.0, NEG_INF).astype(jnp.float32)[None]


# ---------------------------------------------------------------------------
# long-sequence flash kernel
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref, m_ref, l_ref):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (blk_q, D) bf16, pre-scaled by sm_scale * log2(e)
    k = k_ref[0]  # (blk_k, D)
    v = v_ref[0]

    # softmax in the base-2 domain (q carries the log2(e) factor); block size
    # dominates performance: (1024, 1024) runs 2.2x faster than (512, 512) at
    # the 65k-token shape.
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk_q, blk_k), base-2 logits
    if bias_ref is not None:
        logits = logits + bias_ref[:]  # (1, blk_k) broadcast: pad-tail mask

    m_prev = m_ref[:, :1]  # (blk_q, 1)
    l_prev = l_ref[:, :1]
    m_blk = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_blk)
    correction = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(logits - m_new)  # (blk_q, blk_k) fp32
    l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk_q, D)
    acc_ref[:] = acc_ref[:] * correction + pv
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(ik == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "interpret"))
def flash_attention_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    blk_q: int = 1024,
    blk_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v for (B, T, H, D) tensors on TPU.

    T is padded to the block size internally; D should be a multiple of 64.
    """
    B, T, H, D = q.shape
    scale = D**-0.5 * 1.4426950408889634  # sm_scale * log2(e): base-2 softmax
    Tp_q = _ceil_to(T, blk_q)
    Tp_k = _ceil_to(T, blk_k)
    Tp = max(Tp_q, Tp_k)

    def to_bhtd(x, pad_to):
        x = jnp.pad(x, ((0, 0), (0, pad_to - T), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, pad_to, D)

    qf = to_bhtd(q * jnp.asarray(scale, q.dtype), Tp)
    kf = to_bhtd(k, Tp)
    vf = to_bhtd(v, Tp)
    nq = Tp // blk_q
    nk = Tp // blk_k
    padded = Tp != T

    kernel = _flash_fwd_kernel
    in_specs = [
        pl.BlockSpec((1, blk_q, D), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, blk_k, D), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, blk_k, D), lambda bh, iq, ik: (bh, ik, 0)),
    ]
    operands = [qf, kf, vf]
    if padded:
        in_specs.append(pl.BlockSpec((1, blk_k), lambda bh, iq, ik: (0, ik)))
        operands.append(_pad_bias_row(T, Tp))
    else:
        kernel = lambda q_ref, k_ref, v_ref, o_ref, acc, m, l: _flash_fwd_kernel(
            q_ref, k_ref, v_ref, None, o_ref, acc, m, l
        )

    grid = (B * H, nq, nk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_q, D), lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, D), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    out = out.reshape(B, H, Tp, D).transpose(0, 2, 1, 3)
    return out[:, :T]


# ---------------------------------------------------------------------------
# medium-sequence single-pass kernel
# ---------------------------------------------------------------------------


def _attn_single_pass_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One (batch*head) slice per grid step; whole-T single-pass softmax."""
    q = q_ref[0]  # (Tp, D) bf16, pre-scaled by sm_scale * log2(e)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tp, Tp) base-2 logits
    if bias_ref is not None:
        logits = logits + bias_ref[:]
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp2(logits - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (pv / l).astype(o_ref.dtype)


# (Tp, Tp) fp32 logits + exp tile must fit VMEM alongside q/k/v/o blocks.
SINGLE_PASS_MAX_T = 1280


@functools.partial(jax.jit, static_argnames=("interpret",))
def attention_single_pass_tpu(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v for (B, T, H, D) with T <= SINGLE_PASS_MAX_T.

    Grid is one step per (batch, head); the whole (Tp, Tp) logits tile lives
    in VMEM for a plain (non-online) softmax.
    """
    B, T, H, D = q.shape
    scale = D**-0.5 * 1.4426950408889634
    Tp = _ceil_to(T, 128)

    def to_bhtd(x):
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, Tp, D)

    qf = to_bhtd(q * jnp.asarray(scale, q.dtype))
    kf = to_bhtd(k)
    vf = to_bhtd(v)

    in_specs = [
        pl.BlockSpec((1, Tp, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, Tp, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, Tp, D), lambda i: (i, 0, 0)),
    ]
    operands = [qf, kf, vf]
    if Tp != T:
        kernel = _attn_single_pass_kernel
        in_specs.append(pl.BlockSpec((1, Tp), lambda i: (0, 0)))
        operands.append(_pad_bias_row(T, Tp))
    else:
        kernel = lambda q_ref, k_ref, v_ref, o_ref: _attn_single_pass_kernel(
            q_ref, k_ref, v_ref, None, o_ref
        )

    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tp, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, H, Tp, D).transpose(0, 2, 1, 3)[:, :T]
