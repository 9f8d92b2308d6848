"""Token-grid -> dense-image rearrangement (pixel shuffle).

Matches the reference LinearPts3d head exactly
(pi3/models/layers/transformer_head.py:58-81): per-token features laid out as
(C, p, p) channel-major are scattered to a (H, W, C) image where token (Y, X)
fills pixels [Y*p:(Y+1)*p, X*p:(X+1)*p].
"""

from __future__ import annotations

import jax.numpy as jnp


def tokens_to_image(tokens: jnp.ndarray, grid_hw: tuple[int, int], patch: int, channels: int):
    """tokens: (B, S, channels * patch**2) with S = h*w (y-major raster).

    Returns (B, h*patch, w*patch, channels). Feature layout per token is
    channel-major (c * patch^2 + i * patch + j) — the order produced by
    torch's  feat.transpose(-1,-2).view(B,-1,h,w) + F.pixel_shuffle.
    """
    b, s, d = tokens.shape
    h, w = grid_hw
    assert s == h * w, f"token count {s} != grid {h}x{w}"
    assert d == channels * patch * patch
    x = tokens.reshape(b, h, w, channels, patch, patch)
    # (B, h, p_i, w, p_j, C) -> (B, H, W, C)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * patch, w * patch, channels)
