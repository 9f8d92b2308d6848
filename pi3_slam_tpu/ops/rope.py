"""2D rotary position embedding (RoPE2D).

TPU-native replacement for the reference's cuRoPE2D CUDA kernel
(pi3/models/curope/kernels.cu) and its pure-torch fallback
(pi3/models/layers/pos_embed.py:112-159). Implemented from the math: the
head dim D splits into a Y half and an X half; within each half, GPT-NeoX
style rotation pairs (i, i + D/4) rotate by angle pos * base**(-2i/(D/2)).

This formulation is pure elementwise math on (B, T, H, D) tensors — XLA fuses
it into the surrounding attention projections, so no hand-written kernel is
needed for speed-of-light here (the op is bandwidth-bound and fully fused).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rope_1d(x: jnp.ndarray, pos: jnp.ndarray, base: float) -> jnp.ndarray:
    """Rotate one half. x: (B, T, H, Dh); pos: (B, T) integer positions."""
    dh = x.shape[-1]
    half = dh // 2
    # inv_freq[i] = base ** (-2i / Dh), i in [0, Dh/2)
    inv_freq = 1.0 / (base ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    angle = pos[..., None].astype(jnp.float32) * inv_freq  # (B, T, Dh/2)
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    cos = jnp.concatenate([cos, cos], axis=-1)[..., None, :].astype(x.dtype)  # (B,T,1,Dh)
    sin = jnp.concatenate([sin, sin], axis=-1)[..., None, :].astype(x.dtype)
    x1 = x[..., :half]
    x2 = x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def rope_2d(x: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0) -> jnp.ndarray:
    """Apply 2D RoPE.

    x: (B, T, H, D) q or k tensor; positions: (B, T, 2) integer (y, x) token
    positions. Layout per head dim: [y-half | x-half], each half rotated by its
    coordinate. Special tokens use position (0, 0) => identity rotation.
    """
    d = x.shape[-1]
    half = d // 2
    y = _rope_1d(x[..., :half], positions[..., 0], base)
    xx = _rope_1d(x[..., half:], positions[..., 1], base)
    return jnp.concatenate([y, xx], axis=-1)


def rope_tables(
    positions: jnp.ndarray, d: int, base: float = 100.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token cos/sin tables for the fused producer kernel.

    positions: (B, T, 2) integer (y, x). Returns (cos, sin), each (B, T, d)
    float32 in the head-dim lane order rope_2d applies them:
    [c_y | c_y | c_x | c_x] with quarters of d//4 — the y/x halves each repeat
    their (d//4)-frequency vector over the GPT-NeoX rotation pairs. Identical
    per head, so one 64-lane table serves every head (the kernel tiles it to
    the 128-lane head pair).
    """
    dh = d // 2  # per-coordinate half
    inv_freq = 1.0 / (base ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    ay = positions[..., 0, None].astype(jnp.float32) * inv_freq  # (B, T, d//4)
    ax = positions[..., 1, None].astype(jnp.float32) * inv_freq
    cos = jnp.concatenate(
        [jnp.cos(ay), jnp.cos(ay), jnp.cos(ax), jnp.cos(ax)], axis=-1
    )
    sin = jnp.concatenate(
        [jnp.sin(ay), jnp.sin(ay), jnp.sin(ax), jnp.sin(ax)], axis=-1
    )
    return cos, sin


def make_patch_positions(
    batch: int, h: int, w: int, num_special: int = 0, offset: int = 0
) -> jnp.ndarray:
    """(batch, num_special + h*w, 2) int32 (y, x) positions, y-major raster.

    Mirrors PositionGetter (pos_embed.py:162-174) plus the Pi3 special-token
    convention (pi3/models/pi3.py:146-154): patch positions shifted by
    ``offset`` (Pi3 uses +1) and ``num_special`` leading (0, 0) rows.
    """
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1).reshape(h * w, 2)
    grid = grid + offset
    if num_special:
        grid = jnp.concatenate([jnp.zeros((num_special, 2), jnp.int32), grid], axis=0)
    return jnp.broadcast_to(grid[None], (batch, grid.shape[0], 2))
