"""Custom Pallas TPU flash-attention forward kernel.

The Pi3 decoder's global blocks attend over ~65k tokens (100-frame chunk x
~645 tokens/frame). XLA-level blockwise attention (ops/flash_attention.py)
materializes (T, block) logits tiles through HBM and tops out around 15
TFLOP/s on v5e; this kernel keeps the whole online-softmax state (q tile,
logits tile, accumulator, running max/sum) in VMEM and streams k/v blocks, the
FlashAttention-2 schedule mapped onto the Mosaic grid:

  grid = (B*H, num_q_blocks, num_k_blocks) — the minor (k) dimension is
  sequential on TPU, so VMEM scratch carries (acc, m, l) across k steps and
  the output block is written once on the final k step.

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


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, t_actual: int, blk_k: int
):
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

    # mask the padded tail of the final k block
    col = ik * blk_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < t_actual, logits, NEG_INF)

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
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k"))
def flash_attention_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    blk_q: int = 1024,
    blk_k: int = 1024,
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

    grid = (B * H, nq, nk)
    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, t_actual=T, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, D), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, blk_k, D), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, blk_k, D), lambda bh, iq, ik: (bh, ik, 0)),
        ],
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
    )(qf, kf, vf)

    out = out.reshape(B, H, Tp, D).transpose(0, 2, 1, 3)
    return out[:, :T]
