"""Custom Pallas TPU attention kernels.

The kernel family covering the Pi3 / DINOv2 attention shapes (reference hot
loop pi3/models/pi3.py:156-166, pi3/models/layers/attention.py:323-347):

  * ``flash_attention_packed_tpu`` / ``attention_single_pass_packed_tpu`` —
    the production pair: transpose-free attention over the packed
    (B, T, 3·H·D) qkv-projection layout with bound-variant softmax (packed
    section comment below; fed by ops/pallas_producer.py).
  * ``flash_attention_tpu`` / ``attention_single_pass_tpu`` — the
    (B, T, H, D)-layout originals, still used by the mesh-sharded paths
    (parallel/context.py) and as oracles; design notes below.
  * ``flash_attention_partial_tpu`` — unnormalized partial attention
    (acc, bound, denominator) for the sequence-parallel ring steps
    (parallel/ring.py).

The original two-kernel design:

  * ``flash_attention_tpu`` — FlashAttention-2 schedule for the decoder's
    global blocks (~65k tokens at 100-frame chunks). XLA-level blockwise
    attention materializes (T, block) logits tiles through HBM and tops out
    around 15 TFLOP/s on v5e; this kernel keeps the online-softmax state
    (q tile, logits tile, accumulator, running max/sum) in VMEM and streams
    k/v blocks: grid = (B*H, num_q_superblocks, num_k_blocks); the minor (k)
    dimension is sequential on TPU so VMEM scratch carries (acc, m, l) across
    k steps and the output block is written once on the final k step.

    Each grid step processes ``n_interleave`` independent q sub-blocks: their
    QK^T matmuls issue together and the per-sub-block softmax (VPU) then
    overlaps the next sub-block's PV matmul (MXU) in Mosaic's schedule.
    Measured on v5e at the 65k global shape: 82-85 TFLOP/s vs 73 single-
    block, and +26% over jax.experimental.pallas.ops.tpu.flash_attention
    head-to-head (82.3 vs 65.5 TF/s, same shape/session) — against a
    98.5 TFLOP/s hardware cap for head_dim 64 (the MXU contracts 128-deep,
    so D=64 runs at half the 197 TFLOP/s bf16 peak regardless of schedule;
    the same kernel at D=128 hits 120).

  * ``attention_single_pass_tpu`` — whole-T single-pass softmax for the
    frame-attention / encoder shapes (~650 tokens, batch ~100 frames). The
    full (T, T) fp32 logits tile fits VMEM, so no online-softmax state or
    k-streaming is needed. ~2.2x faster than XLA SDPA at these shapes.

Tail padding is handled WITHOUT masking: k/v are zero-padded, so each padded
key contributes logit 0 and exactly ``2^(-m)`` to the softmax denominator
(q is pre-scaled; pad logit = q . 0 = 0). The finalize step subtracts
``n_pad * 2^(-m)`` from l — algebraically exact, and saves the 1-VPU-op-per-
logit bias add a mask row would cost (~6% end-to-end at the global shape).
The running max m is clamped to >= 0 by the pad columns, which only changes
the (invariant) normalization base. The correction loses fp32 precision only
when every real logit is far below 0 while n_pad is large — impossible after
Pi3's qk-norm, whose logits are bounded by |q||k|/sqrt(D) ~ O(10).

Forward-only (inference framework); no mask beyond tail padding, matching
Pi3's dense bidirectional attention.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2_E = 1.4426950408889634


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# long-sequence flash kernel
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, blk_q: int, nw: int, n_pad: int
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    kb = k_ref[0]  # (blk_k, D)
    vb = v_ref[0]

    # all nw QK^T matmuls issue up front; each sub-block's softmax (VPU) then
    # overlaps the neighbouring sub-blocks' PV matmuls (MXU)
    logits = [
        jax.lax.dot_general(
            q_ref[0, w * blk_q : (w + 1) * blk_q],
            kb,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, blk_k) base-2 logits (q pre-scaled by sm_scale*log2(e))
        for w in range(nw)
    ]
    for w in range(nw):
        sl = slice(w * blk_q, (w + 1) * blk_q)
        m_prev = m_ref[sl, :1]
        l_prev = l_ref[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits[w], axis=1, keepdims=True))
        p = jnp.exp2(logits[w] - m_new)
        correction = jnp.exp2(m_prev - m_new)
        l_ref[sl, :1] = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, D)
        acc_ref[sl] = acc_ref[sl] * correction + pv
        m_ref[sl, :1] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        # exact pad correction: each zero-padded key contributed 2^(0 - m)
        denom = l_ref[:, :1] - n_pad * jnp.exp2(-m_ref[:, :1])
        o_ref[0] = (acc_ref[:] / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_bound_kernel(
    kn_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, mh_ref, *, blk_q: int, nw: int, n_pad: int
):
    """Bound-stabilized FlashAttention step (see _attn_single_pass_bound_kernel
    for the math). With m̂ fixed per q row before the k loop there is no
    running-max state: no per-step max lane-reduce, no acc rescale, no
    separate l reduction — the denominator accumulates as column D of
    p @ [v | 1] on the MXU. Removes all per-step VPU reductions, which are
    what kept the exact kernel at ~82 of the 98.5 TF/s cap.
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    kn = kn_ref[pl.program_id(0)]  # SMEM scalar: this head's max |k|

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q32 = q_ref[0].astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(q32 * q32, axis=1, keepdims=True))
        mh_ref[:, :1] = jnp.minimum(qn * kn + 1.0, 120.0)

    kb = k_ref[0]  # (blk_k, D)
    vb_aug = jnp.concatenate(
        [v_ref[0], jnp.ones((v_ref.shape[1], 1), v_ref.dtype)], axis=1
    )  # (blk_k, D+1): PV and the row-sum ride one MXU pass

    logits = [
        jax.lax.dot_general(
            q_ref[0, w * blk_q : (w + 1) * blk_q],
            kb,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for w in range(nw)
    ]
    for w in range(nw):
        sl = slice(w * blk_q, (w + 1) * blk_q)
        p = jnp.exp2(logits[w] - mh_ref[sl, :1]).astype(vb_aug.dtype)
        acc_ref[sl] += jax.lax.dot_general(
            p, vb_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, D+1)

    @pl.when(ik == nk - 1)
    def _finalize():
        # exact pad correction: each zero-padded key contributed 2^(0 - m̂)
        denom = acc_ref[:, -1:] - n_pad * jnp.exp2(-mh_ref[:, :1])
        o_ref[0] = (acc_ref[:, :-1] / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_partial_kernel(
    kn_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, mh_ref, *, blk_q: int, nw: int, n_pad: int
):
    """Bound-softmax PARTIAL attention: identical accumulation to
    _flash_fwd_bound_kernel, but finalize emits the unnormalized numerator
    and denominator instead of dividing — partials over different key shards
    (computed with the same global kn, hence the same per-row shift m̂) sum
    exactly, which is what ring attention (parallel/ring.py) needs. Output
    lanes: [0:D) numerator, D the denominator (local zero-pad keys already
    subtracted), rest zero."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    kn = kn_ref[pl.program_id(0)]  # SMEM scalar: GLOBAL max |k| for this head

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q32 = q_ref[0].astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(q32 * q32, axis=1, keepdims=True))
        mh_ref[:, :1] = jnp.minimum(qn * kn + 1.0, 120.0)

    kb = k_ref[0]
    vb_aug = jnp.concatenate(
        [v_ref[0], jnp.ones((v_ref.shape[1], 1), v_ref.dtype)], axis=1
    )

    logits = [
        jax.lax.dot_general(
            q_ref[0, w * blk_q : (w + 1) * blk_q],
            kb,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for w in range(nw)
    ]
    for w in range(nw):
        sl = slice(w * blk_q, (w + 1) * blk_q)
        p = jnp.exp2(logits[w] - mh_ref[sl, :1]).astype(vb_aug.dtype)
        acc_ref[sl] += jax.lax.dot_general(
            p, vb_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        d = acc_ref.shape[1] - 1
        l = acc_ref[:, -1:] - n_pad * jnp.exp2(-mh_ref[:, :1])
        pad_cols = o_ref.shape[2] - (d + 1)
        o_ref[0] = jnp.concatenate(
            [acc_ref[:, :-1], l, jnp.zeros((acc_ref.shape[0], pad_cols), jnp.float32)],
            axis=1,
        )


@functools.partial(
    jax.jit, static_argnames=("blk_q", "blk_k", "n_interleave", "interpret")
)
def flash_attention_partial_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kn: jnp.ndarray,
    blk_q: int = 256,
    blk_k: int = 1024,
    n_interleave: int = 4,
    interpret: bool = False,
):
    """Unnormalized bound-softmax partial attention for ring / sharded keys.

    q: (B, Tq, H, D) local queries (unscaled); k/v: (B, Tk, H, D) one key
    shard; kn: (B, H) GLOBAL max key L2 norm over ALL shards (one pmax).
    Returns (acc, l): (B, Tq, H, D) fp32 numerator and (B, Tq, H) fp32
    denominator with shift 2^(-m̂_r), m̂_r = min(|q_r|*scale*kn + 1, 120).
    Partials from different shards sum exactly; divide once at the end
    (subtracting any GLOBAL zero-pad count * 2^(-m̂) from l)."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    nw = n_interleave
    qb_super = blk_q * nw
    Tqp = _ceil_to(Tq, qb_super)
    Tkp = _ceil_to(Tk, blk_k)
    scale = D**-0.5 * LOG2_E

    def to_bhtd(x, Tp, scale_by=None):
        if scale_by is not None:
            x = x * jnp.asarray(scale_by, x.dtype)
        x = jnp.pad(x, ((0, 0), (0, Tp - x.shape[1]), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, Tp, x.shape[-1])

    qf = to_bhtd(q, Tqp, scale)
    kf = to_bhtd(k, Tkp)
    vf = to_bhtd(v, Tkp)

    grid = (B * H, Tqp // qb_super, Tkp // blk_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_fwd_partial_kernel, blk_q=blk_q, nw=nw, n_pad=Tkp - Tk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qb_super, D), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, blk_k, D), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, blk_k, D), lambda bh, iq, ik: (bh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, qb_super, 128), lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tqp, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((qb_super, D + 1), jnp.float32),
            pltpu.VMEM((qb_super, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kn.reshape(B * H), qf, kf, vf)
    out = out.reshape(B, H, Tqp, 128).transpose(0, 2, 1, 3)[:, :Tq]
    return out[..., :D], out[..., D]


@functools.partial(
    jax.jit, static_argnames=("blk_q", "blk_k", "n_interleave", "variant", "interpret")
)
def flash_attention_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    blk_q: int = 256,
    blk_k: int = 1024,
    n_interleave: int = 4,
    variant: str = "bound",
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v for (B, T, H, D) tensors on TPU.

    Returns (B, T, H, D) in the input dtype. T is padded to the q-superblock
    (blk_q * n_interleave) / blk_k lattice; padded keys are corrected exactly
    in the softmax denominator (module docstring).

    variant 'bound' (default) fixes the softmax shift per q row from the
    Cauchy–Schwarz bound before the k loop — no running max, no acc rescale,
    denominator fused into the PV matmul (same contract as the single-pass
    bound kernel: exact for base-2 logits <= 247). 'max' is the exact
    online-softmax formulation.
    """
    B, T, H, D = q.shape
    nw = n_interleave
    qb_super = blk_q * nw
    # pad to a common multiple of the q superblock and the k block: padding to
    # max() alone truncates the grid when qb_super does not divide it (e.g.
    # blk_q=128, nw=3, blk_k=512 -> Tp=1024 but 1024 % 384 != 0), silently
    # dropping the tail q rows
    Tp = _ceil_to(T, math.lcm(qb_super, blk_k))
    # base-2 softmax: fold log2(e) into the query scaling, use exp2 on TPU
    scale = D**-0.5 * LOG2_E

    def to_bhtd(x, scale_by=None):
        if scale_by is not None:
            x = x * jnp.asarray(scale_by, x.dtype)
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, Tp, D)

    qf = to_bhtd(q, scale)
    kf = to_bhtd(k)
    vf = to_bhtd(v)

    grid = (B * H, Tp // qb_super, Tp // blk_k)
    common = dict(
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, D), q.dtype),
        interpret=interpret,
    )
    qkv_specs = [
        pl.BlockSpec((1, qb_super, D), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, blk_k, D), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, blk_k, D), lambda bh, iq, ik: (bh, ik, 0)),
    ]
    out_spec = pl.BlockSpec((1, qb_super, D), lambda bh, iq, ik: (bh, iq, 0))
    if variant == "bound":
        # per-(b,h) global max key norm, computed once outside the kernel
        # and read from SMEM inside (scalars are not tileable VMEM blocks)
        kn = jnp.sqrt(
            jnp.max(jnp.sum(kf.astype(jnp.float32) ** 2, axis=2), axis=1)
        )
        out = pl.pallas_call(
            functools.partial(
                _flash_fwd_bound_kernel, blk_q=blk_q, nw=nw, n_pad=Tp - T
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM)
            ] + qkv_specs,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((qb_super, D + 1), jnp.float32),
                pltpu.VMEM((qb_super, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            **common,
        )(kn, qf, kf, vf)
    else:
        out = pl.pallas_call(
            functools.partial(
                _flash_fwd_kernel, blk_q=blk_q, nw=nw, n_pad=Tp - T
            ),
            in_specs=qkv_specs,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((qb_super, D), jnp.float32),
                pltpu.VMEM((qb_super, 128), jnp.float32),
                pltpu.VMEM((qb_super, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                # (bh, iq) grid cells are independent; only the k axis carries
                # online-softmax state
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            **common,
        )(qf, kf, vf)

    out = out.reshape(B, H, Tp, D).transpose(0, 2, 1, 3)
    return out[:, :T]


# ---------------------------------------------------------------------------
# packed-qkv kernels: transpose-free attention on the model's native layout
# ---------------------------------------------------------------------------
#
# The (B,T,H,D)->(B*H,Tp,D) relayout around the kernels costs more than the
# softmax it feeds: measured 28 ms of non-kernel time per global block vs a
# 204 ms kernel, and 18 ms per frame block vs a 15 ms kernel — strided
# transposes of the 64-lane-minor layout run far below HBM bandwidth.
#
# These kernels instead read ONE packed (B, Tp, 3*H*D) array — the fused
# qkv projection's own output order (3, H, D) — and write (B, Tp, H*D),
# exactly the layout the output projection consumes. No transposes exist on
# either side; the only pre-kernel op is a fused elementwise pass
# (qk-norm + RoPE + scale + pad) that XLA folds into one write.
#
# TPU block specs require the last block dim to be a multiple of 128 lanes,
# so heads are addressed in PAIRS: lane-block j of the 3072-wide array holds
# heads (2j, 2j+1) of q (j < H/2), of k (H/2 <= j < H), of v (j >= H).
# Each grid step slices its two heads from the 128-lane block and runs two
# interleaved attentions (the lane slice is a cheap VMEM relayout; the MXU
# work is unchanged). Requires D == 64 and H even — the Pi3/DINOv2 shapes.


def _packed_offsets(H: int):
    """Lane-block offsets of q, k, v head-pair j in the packed array."""
    return 0, H // 2, H


def _flash_packed_kernel(
    kn_ref, qkv_q, qkv_k, qkv_v, o_ref, acc_ref, mh_ref, *, n_pad: int, nq: int
):
    """Bound-variant flash step on a packed head-pair (2 heads per step).

    q block (qb_super, 128) = two heads' q side by side; k/v blocks
    (blk_k, 128) likewise. acc scratch (qb_super, 2*(D+1)); mh (qb_super, 2)
    columns are the two heads' row bounds. ``nq`` splits the q superblock
    into sub-blocks so 2*nq independent QK^T matmuls issue before the
    per-unit softmax/PV — more VPU/MXU overlap for Mosaic to schedule.
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    g = pl.program_id(0)
    sub = qkv_q.shape[1] // nq

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for s in range(2):
            q32 = qkv_q[0][:, s * 64 : (s + 1) * 64].astype(jnp.float32)
            qn = jnp.sqrt(jnp.sum(q32 * q32, axis=1, keepdims=True))
            kn = kn_ref[2 * g + s]
            mh_ref[:, s : s + 1] = jnp.minimum(qn * kn + 1.0, 120.0)

    kb = qkv_k[0]  # (blk_k, 128): two heads' keys
    vb = qkv_v[0]
    ones = jnp.ones((vb.shape[0], 1), vb.dtype)

    units = [(s, w) for s in range(2) for w in range(nq)]
    logits = [
        jax.lax.dot_general(
            qkv_q[0][w * sub : (w + 1) * sub, s * 64 : (s + 1) * 64],
            kb[:, s * 64 : (s + 1) * 64],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for s, w in units
    ]
    vs = [
        jnp.concatenate([vb[:, s * 64 : (s + 1) * 64], ones], axis=1)
        for s in range(2)
    ]
    for i, (s, w) in enumerate(units):
        rows = slice(w * sub, (w + 1) * sub)
        p = jnp.exp2(logits[i] - mh_ref[rows, s : s + 1]).astype(vb.dtype)
        acc_ref[rows, s * 65 : (s + 1) * 65] += jax.lax.dot_general(
            p, vs[s], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        outs = []
        for s in range(2):
            a = acc_ref[:, s * 65 : (s + 1) * 65]
            denom = a[:, -1:] - n_pad * jnp.exp2(-mh_ref[:, s : s + 1])
            outs.append(a[:, :-1] / jnp.maximum(denom, 1e-30))
        o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def flash_packed_lattice(t: int, blk_q: int = 2048, blk_k: int = 2048) -> int:
    """Padded row count flash_attention_packed_tpu uses for logical length t —
    the ``out_t`` a fused producer must emit when passing ``true_t``."""
    return _ceil_to(t, math.lcm(blk_q, blk_k))


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "blk_q", "blk_k", "n_q_blocks", "true_t", "interpret"),
)
def flash_attention_packed_tpu(
    qkv: jnp.ndarray,
    num_heads: int,
    blk_q: int = 2048,
    blk_k: int = 2048,
    n_q_blocks: int = 1,
    true_t: int | None = None,
    kn: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention over a packed (B, T, 3*H*D) qkv tensor -> (B, T, H*D).

    qkv lane order is (3, H, D) with D == 64 and H even; q must already be
    SCALED by sm_scale*log2(e) and carry qk-norm/RoPE (the producer fuses
    those into its single elementwise write). Bound-variant softmax (module
    docstring): exact for base-2 logits <= 247.

    ``true_t``: when the producer already emitted the padded lattice
    (qkv_rope_producer_tpu with out_t = flash_packed_lattice(t)), pass the
    logical length here — the internal pad is skipped, padded keys (exact
    zeros by the producer's row mask) are corrected in the denominator as
    usual, and the output is sliced back to true_t rows.

    ``kn``: optional (B*H,) f32 per-head max |k| (the producer's
    return_k_norms output). Without it the kernel re-reads the k third of
    the packed tensor to compute the Cauchy-Schwarz bound base — and XLA
    lays that reduce out T-minor, inserting a full-tensor layout copy
    (~21 ms at the chunk shape).
    """
    B, T, C3 = qkv.shape
    H = num_heads
    D = C3 // (3 * H)
    assert D == 64 and H % 2 == 0, (H, D)
    qb_super = blk_q
    if true_t is not None:
        assert T == flash_packed_lattice(true_t, blk_q, blk_k), (T, true_t)
        Tp, t_out = T, true_t
        qkv_p = qkv
    else:
        Tp = _ceil_to(T, math.lcm(qb_super, blk_k))
        t_out = T
        qkv_p = jnp.pad(qkv, ((0, 0), (0, Tp - T), (0, 0)))

    if kn is None:
        # per-head max |k| (CS bound base), shaped (B*H,) in (b, h) order
        kf = qkv_p.reshape(B, Tp, 3, H, D)[:, :, 1].astype(jnp.float32)
        kn = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=3), axis=1)).reshape(B * H)

    oq, ok, ov = _packed_offsets(H)
    grid = (B * H // 2, Tp // qb_super, Tp // blk_k)
    out = pl.pallas_call(
        functools.partial(_flash_packed_kernel, n_pad=Tp - t_out, nq=n_q_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, qb_super, 128),
                lambda g, iq, ik, H=H: (g // (H // 2), iq, oq + g % (H // 2)),
            ),
            pl.BlockSpec(
                (1, blk_k, 128),
                lambda g, iq, ik, H=H: (g // (H // 2), ik, ok + g % (H // 2)),
            ),
            pl.BlockSpec(
                (1, blk_k, 128),
                lambda g, iq, ik, H=H: (g // (H // 2), ik, ov + g % (H // 2)),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, qb_super, 128),
            lambda g, iq, ik, H=H: (g // (H // 2), iq, g % (H // 2)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, H * D), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((qb_super, 2 * (D + 1)), jnp.float32),
            pltpu.VMEM((qb_super, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kn, qkv_p, qkv_p, qkv_p)
    return out[:, :t_out]


def _single_pass_packed_kernel(
    qkv_q, qkv_k, qkv_v, o_ref, *, n_pad: int, nw: int, q_scale: float = 1.0
):
    """Single-pass bound softmax over nw packed head-pairs per grid step.

    Blocks are (1, Tp, nw*128): 2*nw heads side by side in the lane dim.
    All QK^T matmuls issue first so each head's softmax (VPU) overlaps the
    neighbours' PV matmuls (MXU). ``q_scale`` multiplies the f32 logits
    (folded into the exp2 chain, effectively free) for callers whose q is
    not pre-scaled — more accurate than scaling bf16 q values.
    """
    nsub = nw * 2
    ones = jnp.ones((qkv_v.shape[1], 1), qkv_v.dtype)

    def head(ref, i):
        return ref[0][:, i * 64 : (i + 1) * 64]

    logits = [
        jax.lax.dot_general(
            head(qkv_q, i), head(qkv_k, i), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for i in range(nsub)
    ]
    outs = []
    for i in range(nsub):
        q32 = head(qkv_q, i).astype(jnp.float32)
        k32 = head(qkv_k, i).astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(q32 * q32, axis=1, keepdims=True))
        kn = jnp.sqrt(jnp.max(jnp.sum(k32 * k32, axis=1)))
        m_hat = jnp.minimum(qn * kn * q_scale + 1.0, 120.0)
        li = logits[i] * q_scale if q_scale != 1.0 else logits[i]
        p = jnp.exp2(li - m_hat).astype(qkv_v.dtype)
        vs = jnp.concatenate([head(qkv_v, i), ones], axis=1)
        pv = jax.lax.dot_general(
            p, vs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        l = pv[:, -1:] - n_pad * jnp.exp2(-m_hat)
        outs.append(pv[:, :-1] / jnp.maximum(l, 1e-30))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "n_interleave", "true_t", "q_scale", "interpret"),
)
def attention_single_pass_packed_tpu(
    qkv: jnp.ndarray,
    num_heads: int,
    n_interleave: int | None = None,
    true_t: int | None = None,
    q_scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-pass attention over packed (B, T, 3*H*D) qkv -> (B, T, H*D).

    Same contract as flash_attention_packed_tpu; for T <= SINGLE_PASS_MAX_T.
    T needs NO alignment: the T dim is never gridded (whole-T blocks are
    legal — a block dim may equal the array dim), so ragged sequences run
    unpadded; the old pad-to-128 + slice-back cost a full HBM round trip of
    the qkv tensor per call (pad.293 et al. in the compiled forward, ~1.3 ms
    at the 100x643 encoder shape). ``true_t`` < T still accepts
    producer-padded input whose pad rows are exact zeros (corrected via the
    denominator as before). Each grid step handles ``n_interleave``
    head-pairs of one batch row (auto: 2 when H/2 is even — measured ~9%
    faster than 1 at the frame shape; more buys nothing).
    """
    B, T, C3 = qkv.shape
    H = num_heads
    D = C3 // (3 * H)
    if n_interleave is None:
        n_interleave = 2 if (H // 2) % 2 == 0 else 1
    assert D == 64 and H % 2 == 0 and (H // 2) % n_interleave == 0, (H, D)
    nw = n_interleave
    Tp = T
    t_out = T if true_t is None else true_t
    assert t_out <= T, (T, true_t)
    qkv_p = qkv

    oq, ok, ov = _packed_offsets(H)
    hp = H // 2  # head pairs per batch row
    grid = (B * hp // nw,)
    out = pl.pallas_call(
        functools.partial(
            _single_pass_packed_kernel, n_pad=Tp - t_out, nw=nw, q_scale=q_scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, Tp, nw * 128),
                lambda g, hp=hp, nw=nw: (g // (hp // nw), 0, (oq + nw * (g % (hp // nw))) // nw),
            ),
            pl.BlockSpec(
                (1, Tp, nw * 128),
                lambda g, hp=hp, nw=nw: (g // (hp // nw), 0, (ok + nw * (g % (hp // nw))) // nw),
            ),
            pl.BlockSpec(
                (1, Tp, nw * 128),
                lambda g, hp=hp, nw=nw: (g // (hp // nw), 0, (ov + nw * (g % (hp // nw))) // nw),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, Tp, nw * 128),
            lambda g, hp=hp, nw=nw: (g // (hp // nw), 0, g % (hp // nw)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, H * D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p)
    return out[:, :t_out]


# ---------------------------------------------------------------------------
# medium-sequence single-pass kernel
# ---------------------------------------------------------------------------


def _attn_single_pass_kernel(q_ref, k_ref, v_ref, o_ref, *, n_pad: int, nw: int):
    """nw (batch*head) slices per grid step; whole-T single-pass softmax.

    All nw QK^T matmuls issue up front, so each slice's softmax (VPU) overlaps
    the neighbouring slices' PV matmuls (MXU) in Mosaic's schedule — the same
    interleaving that buys +13% in the long-sequence flash kernel. At the
    ~650-token frame shapes a single slice leaves the MXU idle during the
    whole (Tp, Tp) softmax, which is why the one-slice variant was pinned at
    ~2.3x the matmul roofline.
    """
    logits = [
        jax.lax.dot_general(
            q_ref[w], k_ref[w], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tp, Tp) base-2 logits; padded key columns are exactly 0
        for w in range(nw)
    ]
    for w in range(nw):
        m = jnp.max(logits[w], axis=1, keepdims=True)
        p = jnp.exp2(logits[w] - m)
        l = jnp.sum(p, axis=1, keepdims=True) - n_pad * jnp.exp2(-m)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[w], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[w] = (pv / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _attn_single_pass_bound_kernel(
    q_ref, k_ref, v_ref, o_ref, *, n_pad: int, nw: int
):
    """Bound-stabilized single-pass softmax, nw slices per grid step.

    The (Tp, Tp) fp32 logits tile dominates this kernel's cost through VMEM
    traffic, not FLOPs (measured ~12 TF/s vs the 98.5 cap at the frame
    shapes). Two passes over it are removed versus the max-based variant:

      * the row max is replaced by the Cauchy–Schwarz bound
        m̂_r = |q_r| · max_c|k_c|  >=  max_c (q_r . k_c),
        computed from the (Tp, D) operands alone — no read of the logits
        tile. Softmax is shift-invariant, so any upper bound works; the
        bound is loose by at most |q||k|/(q.k), keeping 2^(l - m̂) well
        inside fp32/bf16 range (both have 8-bit exponents) for any real
        attention input.
      * the denominator row-sum rides the PV matmul on the MXU: v is
        augmented with a ones column inside the kernel, so sum_c p_rc
        appears as column D of p @ [v | 1] — no separate lane-reduction
        pass over p. Padded keys contribute exactly 2^(0 - m̂_r) each and
        are subtracted at finalize (module docstring).
    """
    ones_col = jnp.ones((v_ref.shape[1], 1), v_ref.dtype)
    for w in range(nw):
        q = q_ref[w]  # (Tp, D) bf16, pre-scaled by sm_scale * log2(e)
        k = k_ref[w]
        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        # row bound: |q_r| * max_c |k_c|  (in base-2 log units, q pre-scaled)
        qn = jnp.sqrt(jnp.sum(q32 * q32, axis=1, keepdims=True))  # (Tp, 1)
        kn = jnp.sqrt(jnp.max(jnp.sum(k32 * k32, axis=1)))  # scalar
        # +1 keeps p strictly < 1 under the bound (free headroom). The CS
        # bound is loose by up to |q||k|/(q.k); clamping it at 120 keeps
        # 2^(l - m̂) inside fp32/bf16 range on BOTH sides for any remotely
        # physical logits (exact while max_logit <= 247 and
        # max_logit >= m̂ - 130 — base-2 logits beyond that are e^+-90
        # softmax saturation territory)
        m_hat = jnp.minimum(qn * kn + 1.0, 120.0)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp2(logits - m_hat).astype(v_ref.dtype)
        pv = jax.lax.dot_general(
            p,
            jnp.concatenate([v_ref[w], ones_col], axis=1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tp, D+1): PV | row-sum
        l = pv[:, -1:] - n_pad * jnp.exp2(-m_hat)
        o_ref[w] = (pv[:, :-1] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


# (Tp, Tp) fp32 logits + exp tile must fit VMEM alongside q/k/v/o blocks.
SINGLE_PASS_MAX_T = 1280


@functools.partial(
    jax.jit, static_argnames=("n_interleave", "variant", "interpret")
)
def attention_single_pass_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_interleave: int | None = None,
    variant: str = "bound",
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v for (B, T, H, D) with T <= SINGLE_PASS_MAX_T.

    Each grid step processes ``n_interleave`` (batch, head) slices (auto: the
    largest of 8/4/2/1 dividing B*H); whole (Tp, Tp) logits tiles live in
    VMEM for a plain (non-online) softmax. Zero-padded keys are corrected
    exactly in the denominator (module docstring).

    variant 'bound' (default) stabilizes with the Cauchy–Schwarz row bound
    and folds the denominator into the PV matmul (two fewer passes over the
    logits tile — the kernel is VMEM-bandwidth-bound); 'max' is the exact
    running-max formulation.
    """
    B, T, H, D = q.shape
    scale = D**-0.5 * LOG2_E
    Tp = _ceil_to(T, 128)
    nw = n_interleave
    if nw is None:
        nw = next(n for n in (8, 4, 2, 1) if (B * H) % n == 0)
    elif (B * H) % nw != 0:
        raise ValueError(f"n_interleave={nw} must divide B*H={B * H}")

    def to_bhtd(x, scale_by=None):
        if scale_by is not None:
            x = x * jnp.asarray(scale_by, x.dtype)
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, Tp, D)

    qf = to_bhtd(q, scale)
    kf = to_bhtd(k)
    vf = to_bhtd(v)

    kernel = (
        _attn_single_pass_bound_kernel if variant == "bound"
        else _attn_single_pass_kernel
    )
    out = pl.pallas_call(
        functools.partial(kernel, n_pad=Tp - T, nw=nw),
        grid=(B * H // nw,),
        in_specs=[
            pl.BlockSpec((nw, Tp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((nw, Tp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((nw, Tp, D), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nw, Tp, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, Tp, D).transpose(0, 2, 1, 3)[:, :T]
