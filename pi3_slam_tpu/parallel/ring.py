"""Sequence-parallel ring attention over an ICI mesh axis.

Long-context scaling beyond what one chip's HBM/time budget allows: the
global-attention sequence (N * hw tokens — 650k for a 1000-frame chunk) is
sharded over the mesh's ``sp`` axis, and k/v shards rotate around the ring
via ``jax.lax.ppermute`` while every device accumulates its local queries'
attention — the standard ring-attention schedule, with collectives riding
ICI neighbours only (reference has no analog; its sequences are capped by
single-GPU memory).

The bound-stabilized softmax (ops/pallas_attention.py module docstring)
makes the ring EXACT without online-softmax state: the per-row shift
m̂_r = |q_r| * max_c|k_c| + 1 uses the GLOBAL max key norm (one pmax before
the ring), so every k/v shard's contribution

    acc_r += 2^(logits_r - m̂_r) @ [v | 1]

adds in a fixed base — no running max, no accumulator rescale, no
order dependence. Zero-padded tail keys contribute exactly 2^(-m̂_r) each
and are subtracted once at the end (same correction as the kernels).

Used inside ``shard_map`` by parallel/context.py when the active mesh has
an ``sp`` axis; pure jnp + collectives, so it runs identically on the CPU
mesh (tests, dryrun) and on real pods.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_attention import LOG2_E


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    n_pad: int = 0,
) -> jnp.ndarray:
    """Exact attention over sequence shards. q/k/v: the LOCAL (B, T/sp, H, D)
    shards (call under shard_map with the T dim sharded on ``axis_name``).
    ``n_pad``: number of zero-padded tail keys in the GLOBAL sequence.
    Returns the local output shard (B, T/sp, H, D).
    """
    B, Tq, H, D = q.shape
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    scale = D**-0.5 * LOG2_E

    # global per-(b, h) max key norm -> fixed per-row bound (base-2 units)
    k32 = k.astype(jnp.float32)
    kn_loc = jnp.sqrt(jnp.max(jnp.sum(k32 * k32, axis=-1), axis=1))  # (B, H)
    kn = jax.lax.pmax(kn_loc, axis_name)
    q32 = q.astype(jnp.float32) * scale
    qn = jnp.sqrt(jnp.sum(q32 * q32, axis=-1))  # (B, Tq, H)
    m_hat = jnp.minimum(qn * kn[:, None, :] + 1.0, 120.0)[..., None]  # (B,Tq,H,1)

    qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    # per-step partials at kernel speed on TPU; XLA einsum elsewhere — both
    # compute the same fixed-shift accumulation, so they sum identically
    from ..ops.attention import on_tpu_platform

    use_kernel = D == 64 and on_tpu_platform()
    if use_kernel:
        from ..ops.pallas_attention import flash_attention_partial_tpu

    def step(carry, _):
        acc, l, kc, vc = carry
        if use_kernel:
            acc_i, l_i = flash_attention_partial_tpu(q, kc, vc, kn)
            acc = acc + acc_i
            l = l + l_i[..., None]
        else:
            logits = jnp.einsum(
                "bqhd,bkhd->bqhk", qs, kc, preferred_element_type=jnp.float32
            )
            p = jnp.exp2(logits - m_hat).astype(vc.dtype)
            acc = acc + jnp.einsum(
                "bqhk,bkhd->bqhd", p, vc, preferred_element_type=jnp.float32
            )
            l = l + jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (acc, l, kc, vc), None

    acc0 = jnp.zeros((B, Tq, H, D), jnp.float32)
    l0 = jnp.zeros((B, Tq, H, 1), jnp.float32)
    (acc, l, _, _), _ = jax.lax.scan(step, (acc0, l0, k, v), None, length=sp)

    # exact correction for global zero-padded tail keys (each contributed
    # 2^(0 - m̂) to l and nothing to acc); pads live on whichever shard holds
    # them, but the correction only needs their COUNT
    denom = l - n_pad * jnp.exp2(-m_hat)
    return (acc / jnp.maximum(denom, 1e-30)).astype(q.dtype)
