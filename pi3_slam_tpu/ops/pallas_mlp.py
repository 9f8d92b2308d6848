"""Fused transformer-MLP Pallas TPU kernels.

The reference's Mlp (dinov2 ``Mlp``: fc1 -> exact-erf GELU -> fc2,
pi3/models/dinov2/layers/mlp.py) is the second-largest FLOP sink of the Pi3
forward after attention: ~1.1 TFLOP per 1024-dim block at the 65k-token chunk
shape, ~80 TFLOP per chunk. XLA schedules it as two matmuls with the erf-GELU
fused into the first one's epilogue and runs 101-126 TFLOP/s on v5e — the
serialized VPU erf (~25 ops/element over T x 4C elements) gates the MXU, and
the (T, 4C) bf16 hidden tensor (528 MB per block) makes an HBM round trip
between the two matmuls.

These kernels keep the hidden tile in VMEM (no HBM round trip) and split the
hidden dim into ``n_hidden_blocks`` sub-tiles: all fc1 matmuls issue first,
then each sub-tile's GELU (VPU) overlaps the neighbouring sub-tiles' fc2
matmuls (MXU) in Mosaic's schedule — the same interleave the attention
kernels use (ops/pallas_attention.py). Both weight matrices stay resident in
VMEM across the row grid (constant block index), so weight traffic is one
16 MB fetch per call instead of per row tile.

Two entry points:

  * ``mlp_fused_tpu`` — y = fc2(gelu(fc1(x))). Drop-in for
    ``models/layers.mlp``.
  * ``block_mlp_fused_tpu`` — the full second half of a pre-norm block,
    y = x + ls2 * mlp(LN(x)) (reference Block.forward residual,
    pi3/models/layers/block.py:303-335): LayerNorm (fp32, matching
    ``models/layers.layer_norm``), MLP, LayerScale, and the residual add all
    happen in one pass over x — removing the LN and residual elementwise
    HBM round trips as well.

Numerics: fc1/fc2 accumulate fp32 on the MXU; GELU is evaluated in fp32 and
cast to the input dtype before fc2 (the XLA path computes GELU in bf16, so
the kernel is slightly *more* accurate than what it replaces); the residual
adds in fp32. Forward-only, like the rest of the inference framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476

# XLA's f32 erf rational approximation (xla/client/lib/math.cc ErfImpl32):
# erf(x) = x * P4(x^2) / Q6(x^2) with x clamped at erfinv(1 - 2^-23).
# Mosaic has no erf primitive, so the kernel evaluates the same polynomial
# XLA lowers to — bit-matching the fused-GELU epilogue this kernel replaces.
_ERF_ALPHA = (
    2.2905065861350646e-4,
    3.4082910107109506e-3,
    5.0955695062380861e-2,
    1.8520832239976145e-1,
    1.128379143519084e0,
)
_ERF_BETA = (
    -1.1791602954361697e-7,
    2.3547966471313185e-5,
    1.0179625278914885e-3,
    1.4070470171167667e-2,
    1.1098505178285362e-1,
    4.9746925110067538e-1,
    1.0,
)
_ERF_CLAMP = 3.832506856900711


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _horner(coeffs, x):
    acc = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def _erf_f32(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, -_ERF_CLAMP, _ERF_CLAMP)
    x2 = x * x
    return x * _horner(_ERF_ALPHA, x2) / _horner(_ERF_BETA, x2)


def _gelu_erf_f32(h: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU in fp32 (dinov2 uses approximate=False)."""
    return 0.5 * h * (1.0 + _erf_f32(h * _SQRT_HALF))


def _mlp_core(xn, w1_ref, b1_ref, w2_ref, b2_ref, nj: int) -> jnp.ndarray:
    """fc2(gelu(fc1(xn))) with the hidden dim split into nj sub-tiles.

    xn: (RT, C) in the compute dtype. Returns (RT, C) fp32. All fc1 dots
    issue before the gelu/fc2 loop so sub-tile j's GELU (VPU) can overlap
    sub-tile j-1's fc2 matmul (MXU).
    """
    hidden = w1_ref.shape[1]
    jt = hidden // nj
    hs = [
        jax.lax.dot_general(
            xn,
            w1_ref[:, j * jt : (j + 1) * jt],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for j in range(nj)
    ]
    acc = None
    for j in range(nj):
        h = hs[j] + b1_ref[0:1, j * jt : (j + 1) * jt].astype(jnp.float32)
        g = _gelu_erf_f32(h).astype(xn.dtype)
        pj = jax.lax.dot_general(
            g,
            w2_ref[j * jt : (j + 1) * jt, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = pj if acc is None else acc + pj
    return acc + b2_ref[0:1, :].astype(jnp.float32)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, nj: int):
    o_ref[...] = _mlp_core(x_ref[...], w1_ref, b1_ref, w2_ref, b2_ref, nj).astype(
        o_ref.dtype
    )


def _mlp_kernel3(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, nj: int):
    o_ref[0] = _mlp_core(x_ref[0], w1_ref, b1_ref, w2_ref, b2_ref, nj).astype(
        o_ref.dtype
    )


def _block_mlp_kernel3(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, o_ref,
    *, nj: int, eps: float
):
    _block_mlp_body(
        x_ref[0], g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
        lambda v: o_ref.__setitem__(0, v), o_ref.dtype, nj, eps, None,
    )


def _block_mlp_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, o_ref,
    *, nj: int, eps: float
):
    _block_mlp_body(
        x_ref[...], g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
        lambda v: o_ref.__setitem__(..., v), o_ref.dtype, nj, eps, None,
    )


def _block_mlp_kernel3_mxu(
    m_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, o_ref,
    *, nj: int, eps: float
):
    _block_mlp_body(
        x_ref[0], g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
        lambda v: o_ref.__setitem__(0, v), o_ref.dtype, nj, eps, m_ref,
    )


def _block_mlp_kernel_mxu(
    m_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, o_ref,
    *, nj: int, eps: float
):
    _block_mlp_body(
        x_ref[...], g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
        lambda v: o_ref.__setitem__(..., v), o_ref.dtype, nj, eps, m_ref,
    )


def _block_mlp_body(
    x, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, store, odt,
    nj: int, eps: float, m_ref
):
    """o = x + ls * mlp(LN(x)); LN in fp32 like models/layers.layer_norm.

    ``m_ref``: optional (C, 128) averaging matrix (every entry 1/C). When
    given, the LN row statistics are computed on the MXU (x @ M broadcasts
    the full-row mean into every lane) instead of cross-lane VPU reductions
    — the same trick ops/pallas_producer.py uses for its per-head LN, where
    the strided lane reduction was the measured bottleneck.
    """
    x32 = x.astype(jnp.float32)
    if m_ref is not None:
        # (C, 128) averaging matrix: every output lane holds the full-row
        # mean; lane 0 is sliced and lane-broadcast back to C columns.
        mavg = m_ref[...]
        mean = jax.lax.dot_general(
            x32, mavg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0:1]
        xc = x32 - mean
        var = jax.lax.dot_general(
            xc * xc, mavg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0:1]
        xn32 = xc * jax.lax.rsqrt(var + eps)
    else:
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.mean((x32 - mean) * (x32 - mean), axis=1, keepdims=True)
        xn32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    xn32 = xn32 * g_ref[0:1, :].astype(jnp.float32) + b_ref[0:1, :].astype(
        jnp.float32
    )
    xn = xn32.astype(x.dtype)  # layer_norm() casts back before the matmul
    acc = _mlp_core(xn, w1_ref, b1_ref, w2_ref, b2_ref, nj)
    acc = acc * ls_ref[0:1, :].astype(jnp.float32)
    store((x32 + acc).astype(odt))


def mlp_fused_supported(c: int, hidden: int) -> bool:
    """Shapes the kernels accept: lane-aligned C and a hidden dim that splits
    into 128-lane sub-tiles."""
    return c % 128 == 0 and hidden % 128 == 0


def _n_hidden_blocks(hidden: int, requested: int | None) -> int:
    if requested is not None:
        if hidden % requested or (hidden // requested) % 128:
            raise ValueError(f"n_hidden_blocks={requested} for hidden={hidden}")
        return requested
    # 4 first: the tuned sweet spot at the Pi3 hidden=4096 shape (in-model
    # sweep, PARITY round 3); smaller hidden dims fall through to what fits
    for nj in (4, 8, 2, 1):
        if hidden % nj == 0 and (hidden // nj) % 128 == 0:
            return nj
    return 1


def _row_grid(x: jnp.ndarray, blk_rows: int):
    """Flatten (..., C) to padded (Tp, C) rows + a restorer."""
    shape = x.shape
    c = shape[-1]
    t = 1
    for s in shape[:-1]:
        t *= s
    x2 = x.reshape(t, c)
    tp = _ceil_to(t, blk_rows)
    if tp > t:
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
    return x2, t, tp


def _token_block(t: int, requested: int, lo: int = 256, hi: int = 2048) -> int | None:
    """Exact token-dim block for the 3D path: T itself when small, else the
    divisor of T closest to ``requested`` within [lo, hi]. None -> no exact
    tiling exists and the caller must take the flatten+pad fallback.

    Why exact tiling matters (measured in the compiled forward, PARITY round
    3): flattening (B, T, C) to (B*T, C) physically re-tiles the (8, 128)
    TPU layout when B > 1 (each (T, C) slab pads its own row tiles), and the
    pad-to-block + slice-back around the row grid adds two more full HBM
    round trips — together ~0.5-1.3 ms per MLP call at the 100x643 frame
    shape, roughly 10% of the kernel itself.
    """
    from .attention import conservative_kernels

    if conservative_kernels():  # force the 2D row-grid fallback (bench.py)
        return None
    best = None
    for d in range(lo, min(hi, t) + 1):
        # Mosaic's sublane tile is 16 rows for bf16 (8 for f32): only
        # 16-multiple block dims are legal for every dtype unless the block
        # equals the array dim
        if d % 16 == 0 and t % d == 0 and (
            best is None or abs(d - requested) < abs(best - requested)
        ):
            best = d
    if best is None and t <= hi:
        return t  # whole-T block (block dim == array dim: always legal)
    return best


@functools.partial(
    jax.jit, static_argnames=("blk_rows", "n_hidden_blocks", "interpret")
)
def mlp_fused_tpu(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    blk_rows: int = 1024,
    n_hidden_blocks: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """fc2(gelu_erf(fc1(x))) for x (..., C), kernels (C, hidden)/(hidden, C)."""
    c, hidden = w1.shape
    nj = _n_hidden_blocks(hidden, n_hidden_blocks)
    wd = x.dtype
    args = (w1.astype(wd), b1.reshape(1, hidden), w2.astype(wd), b2.reshape(1, c))
    pshapes = [(c, hidden), (1, hidden), (hidden, c), (1, c)]
    t_tok = x.shape[-2] if x.ndim >= 2 else None
    blk_t = _token_block(t_tok, blk_rows) if x.ndim >= 3 else None
    if blk_t is not None:
        # exact 3D tiling: no flatten (re-tiles the (8,128) layout when
        # B > 1), no pad-to-block, no slice-back
        xb = x.reshape(-1, t_tok, c)
        bsz = xb.shape[0]
        out = pl.pallas_call(
            functools.partial(_mlp_kernel3, nj=nj),
            grid=(bsz, t_tok // blk_t),
            in_specs=[pl.BlockSpec((1, blk_t, c), lambda b, i: (b, i, 0))]
            + [pl.BlockSpec(s, lambda b, i: (0, 0)) for s in pshapes],
            out_specs=pl.BlockSpec((1, blk_t, c), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, t_tok, c), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xb, *args)
        return out.reshape(x.shape)
    x2, t, tp = _row_grid(x, blk_rows)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, nj=nj),
        grid=(tp // blk_rows,),
        in_specs=[pl.BlockSpec((blk_rows, c), lambda i: (i, 0))]
        + [pl.BlockSpec(s, lambda i: (0, 0)) for s in pshapes],
        out_specs=pl.BlockSpec((blk_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, *args)
    return out[:t].reshape(x.shape)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "blk_rows", "n_hidden_blocks", "ln_stats", "interpret"),
)
def block_mlp_fused_tpu(
    x: jnp.ndarray,
    norm_scale: jnp.ndarray,
    norm_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    ls: jnp.ndarray | None = None,
    eps: float = 1e-6,
    blk_rows: int = 256,
    n_hidden_blocks: int | None = None,
    ln_stats: str = "vpu",
    interpret: bool = False,
) -> jnp.ndarray:
    """x + ls * mlp(layer_norm(x)) in one pass over x (..., C).

    The pre-norm block's full MLP half (reference Block.forward residual 2,
    pi3/models/layers/block.py:303-335). ``ls`` is the LayerScale gamma or
    None (multiplies by ones — one VPU pass, cheaper than a second kernel
    variant). ``ln_stats``: 'vpu' computes the LN row statistics with lane
    reductions, 'mxu' with averaging matmuls (see _block_mlp_body).

    Measured dead end (round 4, device-loop protocol on the v5e): 'mxu'
    runs 14.2 ms vs 'vpu' 10.6 ms at the 65k x 1024 x 4096 block shape —
    unlike the producer's per-64-lane-half LN (ops/pallas_producer.py),
    the full-row C=1024 lane reduction is NOT the gate here, and the
    HIGHEST-precision stats matmuls cost more than they save. Kept as an
    option so the result is reproducible and not re-attempted. The same
    sweep pinned blk_rows=256/nj=4 (the defaults) as optimal: 10.61 ms =
    103.6 TF/s vs the 116.3 TF/s pure fc1+fc2 matmul chain and the
    ~117 TF/s practical chip peak — the residual is the LN/residual
    elementwise HBM traffic, not schedulable work.
    """
    c, hidden = w1.shape
    nj = _n_hidden_blocks(hidden, n_hidden_blocks)
    wd = x.dtype
    if ls is None:
        ls = jnp.ones((c,), jnp.float32)
    post = (
        norm_scale.reshape(1, c),
        norm_bias.reshape(1, c),
        w1.astype(wd),
        b1.reshape(1, hidden),
        w2.astype(wd),
        b2.reshape(1, c),
        ls.reshape(1, c),
    )
    post_shapes = [(1, c), (1, c), (c, hidden), (1, hidden), (hidden, c), (1, c), (1, c)]
    if ln_stats == "mxu":
        pre = (jnp.full((c, 128), 1.0 / c, jnp.float32),)
        pre_shapes = [(c, 128)]
        k3, k2 = _block_mlp_kernel3_mxu, _block_mlp_kernel_mxu
    else:
        assert ln_stats == "vpu", ln_stats
        pre, pre_shapes = (), []
        k3, k2 = _block_mlp_kernel3, _block_mlp_kernel
    t_tok = x.shape[-2] if x.ndim >= 2 else None
    blk_t = _token_block(t_tok, blk_rows) if x.ndim >= 3 else None
    if blk_t is not None:
        # exact 3D tiling — see mlp_fused_tpu
        xb = x.reshape(-1, t_tok, c)
        bsz = xb.shape[0]
        out = pl.pallas_call(
            functools.partial(k3, nj=nj, eps=eps),
            grid=(bsz, t_tok // blk_t),
            in_specs=[pl.BlockSpec(s, lambda b, i: (0, 0)) for s in pre_shapes]
            + [pl.BlockSpec((1, blk_t, c), lambda b, i: (b, i, 0))]
            + [pl.BlockSpec(s, lambda b, i: (0, 0)) for s in post_shapes],
            out_specs=pl.BlockSpec((1, blk_t, c), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, t_tok, c), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*pre, xb, *post)
        return out.reshape(x.shape)
    x2, t, tp = _row_grid(x, blk_rows)
    out = pl.pallas_call(
        functools.partial(k2, nj=nj, eps=eps),
        grid=(tp // blk_rows,),
        in_specs=[pl.BlockSpec(s, lambda i: (0, 0)) for s in pre_shapes]
        + [pl.BlockSpec((blk_rows, c), lambda i: (i, 0))]
        + [pl.BlockSpec(s, lambda i: (0, 0)) for s in post_shapes],
        out_specs=pl.BlockSpec((blk_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*pre, x2, *post)
    return out[:t].reshape(x.shape)
