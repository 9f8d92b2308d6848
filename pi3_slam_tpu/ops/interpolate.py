"""Resampling ops: torch-compatible bicubic position-embedding interpolation
and grid_sample-style bilinear/nearest point sampling.

* ``interpolate_pos_embed`` reproduces DINOv2's
  F.interpolate(mode='bicubic', scale_factor=(h0+offset)/M) call
  (pi3/models/dinov2/models/vision_transformer.py:181-213) bit-for-bit in
  semantics: cubic convolution kernel A=-0.75, half-pixel coordinate mapping
  driven by the *provided* scale factor, edge-clamped taps. Because the source
  grid is static, the interpolation is two small matmuls (MXU-friendly).

* ``bilinear_sample`` / ``nearest_sample`` reproduce torch
  F.grid_sample(align_corners=False, padding_mode='border') semantics used for
  keypoint interpolation (slam/offline_chunk_creator.py:129-159).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, A: float) -> np.ndarray:
    """Cubic convolution kernel (Keys). torch uses A=-0.75 for plain bicubic
    and A=-0.5 (the PIL kernel) on its antialias path."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1,
        (A + 2) * ax3 - (A + 3) * ax2 + 1,
        np.where(ax < 2, A * ax3 - 5 * A * ax2 + 8 * A * ax - 4 * A, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _bicubic_matrix(
    in_size: int, out_size: int, scale: float | None = None, antialias: bool = False
) -> np.ndarray:
    """(out, in) dense interpolation matrix for one axis, matching torch
    F.interpolate(mode='bicubic', align_corners=False).

    * plain path (antialias=False): A=-0.75 kernel, 4 taps around
      src = (dst + 0.5) / scale - 0.5 (explicit scale — the DINOv2 offset
      kludge) or (dst + 0.5) * in/out - 0.5 (size-based); out-of-range taps
      clamp-accumulate onto the edge pixel.
    * antialias path: torch's upsample_*_aa algorithm — A=-0.5 kernel
      stretched by max(in/out, 1), taps clipped to the valid range and
      weights renormalized over the clipped window.
    """
    ratio = (1.0 / scale) if scale is not None else in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    if antialias:
        filt = max(ratio, 1.0)
        support = 2.0 * filt
        for d in range(out_size):
            center = ratio * (d + 0.5)
            xmin = max(0, int(center - support + 0.5))
            xmax = min(in_size, int(center + support + 0.5))
            taps = np.arange(xmin, xmax)
            weights = _cubic_kernel((taps + 0.5 - center) / filt, A=-0.5)
            W[d, taps] = weights / weights.sum()
    else:
        for d in range(out_size):
            src = (d + 0.5) * ratio - 0.5
            x0 = int(np.floor(src))
            frac = src - x0
            taps = np.array([x0 - 1, x0, x0 + 1, x0 + 2])
            weights = _cubic_kernel(np.array([frac + 1, frac, frac - 1, frac - 2]), A=-0.75)
            for t, wgt in zip(taps, weights):
                W[d, min(max(t, 0), in_size - 1)] += wgt
    return W


def interpolate_pos_embed(
    pos_embed: jnp.ndarray,
    grid_hw: tuple[int, int],
    interpolate_offset: float = 0.0,
    antialias: bool = True,
) -> jnp.ndarray:
    """Interpolate a square (M*M, C) patch pos-embed grid to (h0*w0, C).

    Mirrors DINOv2 interpolate_pos_encoding
    (pi3/models/dinov2/models/vision_transformer.py:181-213). The *_reg
    factories used by Pi3 set interpolate_antialias=True, offset=0.0
    (hub/backbones.py:128-140) — those are the defaults here; the plain
    (offset=0.1, antialias=False) variant is also supported.
    """
    n, c = pos_embed.shape
    m = int(round(n**0.5))
    assert m * m == n, "pos embed grid must be square"
    h0, w0 = grid_hw
    if (h0, w0) == (m, m):
        return pos_embed
    if interpolate_offset:
        sy: float | None = float(h0 + interpolate_offset) / m
        sx: float | None = float(w0 + interpolate_offset) / m
    else:
        sy = sx = None
    Wy = jnp.asarray(_bicubic_matrix(m, h0, sy, antialias), dtype=jnp.float32)
    Wx = jnp.asarray(_bicubic_matrix(m, w0, sx, antialias), dtype=jnp.float32)
    grid = pos_embed.astype(jnp.float32).reshape(m, m, c)
    out = jnp.einsum("ym,mnc,xn->yxc", Wy, grid, Wx)
    return out.reshape(h0 * w0, c).astype(pos_embed.dtype)


@functools.lru_cache(maxsize=128)
def _bilinear_matrix(in_size: int, out_size: int, antialias: bool = False) -> np.ndarray:
    """(out, in) dense bilinear interpolation matrix, torch
    F.interpolate(mode='bilinear', align_corners=False) semantics.

    antialias=True uses torch's _aa algorithm (triangle kernel stretched by
    the downscale ratio, taps clipped + renormalized); antialias=False is the
    standard 2-tap kernel with edge clamping.
    """
    ratio = in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    if antialias:
        filt = max(ratio, 1.0)
        support = 1.0 * filt
        for d in range(out_size):
            center = ratio * (d + 0.5)
            xmin = max(0, int(center - support + 0.5))
            xmax = min(in_size, int(center + support + 0.5))
            taps = np.arange(xmin, xmax)
            weights = np.maximum(0.0, 1.0 - np.abs((taps + 0.5 - center) / filt))
            s = weights.sum()
            if s > 0:
                W[d, taps] = weights / s
            else:
                W[d, min(max(int(center), 0), in_size - 1)] = 1.0
    else:
        for d in range(out_size):
            src = (d + 0.5) * ratio - 0.5
            x0 = int(np.floor(src))
            frac = src - x0
            for t, wgt in ((x0, 1 - frac), (x0 + 1, frac)):
                W[d, min(max(t, 0), in_size - 1)] += wgt
    return W


def bilinear_resize_hw(
    x: jnp.ndarray, out_hw: tuple[int, int], antialias: bool = False
) -> jnp.ndarray:
    """Resize (..., H, W, C) maps with torch-bilinear semantics as two small
    matmuls (static shapes => matrices are trace-time constants on the MXU)."""
    H, W = x.shape[-3], x.shape[-2]
    h, w = out_hw
    if (H, W) == (h, w):
        return x
    Wy = jnp.asarray(_bilinear_matrix(H, h, antialias), dtype=jnp.float32)
    Wx = jnp.asarray(_bilinear_matrix(W, w, antialias), dtype=jnp.float32)
    y = jnp.einsum("ym,...mwc->...ywc", Wy, x.astype(jnp.float32))
    y = jnp.einsum("xn,...ync->...yxc", Wx, y)
    return y.astype(x.dtype)


def bicubic_resize_hw(
    x: jnp.ndarray, out_hw: tuple[int, int], antialias: bool = False
) -> jnp.ndarray:
    """Resize (..., H, W, C) maps with torch-bicubic semantics
    (F.interpolate(mode='bicubic', align_corners=False[, antialias=True]))
    as two interpolation-matrix matmuls. MoGe v1 resizes its input this way
    (moge/model/v1.py:280)."""
    H, W = x.shape[-3], x.shape[-2]
    h, w = out_hw
    if (H, W) == (h, w):
        return x
    Wy = jnp.asarray(_bicubic_matrix(H, h, None, antialias), dtype=jnp.float32)
    Wx = jnp.asarray(_bicubic_matrix(W, w, None, antialias), dtype=jnp.float32)
    y = jnp.einsum("ym,...mwc->...ywc", Wy, x.astype(jnp.float32))
    y = jnp.einsum("xn,...ync->...yxc", Wx, y)
    return y.astype(x.dtype)


def _unnormalize_coord(g: jnp.ndarray, size: int) -> jnp.ndarray:
    """grid_sample align_corners=False: g in [-1,1] -> pixel coord."""
    return ((g + 1.0) * size - 1.0) / 2.0


def bilinear_sample(image: jnp.ndarray, coords_xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) at pixel coordinates (N, 2) given as (x, y) floats.

    Border padding: coordinates are clamped to the valid range, matching
    F.grid_sample(padding_mode='border', align_corners=False) after the
    caller's [-1,1] normalization (pixel coords here are pre-unnormalized).
    """
    H, W = image.shape[0], image.shape[1]
    x = jnp.clip(coords_xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(coords_xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = image[y0, x0]
    v01 = image[y0, x1]
    v10 = image[y1, x0]
    v11 = image[y1, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def nearest_sample(image: jnp.ndarray, coords_xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor variant of bilinear_sample (grid_sample mode='nearest').

    torch rounds with floor(x + 0.5) semantics via its nearest indexing.
    """
    H, W = image.shape[0], image.shape[1]
    x = jnp.clip(jnp.floor(coords_xy[..., 0] + 0.5), 0, W - 1).astype(jnp.int32)
    y = jnp.clip(jnp.floor(coords_xy[..., 1] + 0.5), 0, H - 1).astype(jnp.int32)
    return image[y, x]


def grid_sample_frames(
    maps: jnp.ndarray, keypoints_xy: jnp.ndarray, mode: str = "bilinear"
) -> jnp.ndarray:
    """Per-frame sampling: maps (N, H, W, C), keypoints (N, K, 2) in pixel
    (x, y) coords normalized the reference way (kp / (size-1) * 2 - 1 then
    unnormalized with align_corners=False).

    The reference normalizes kp with (size-1) but samples with
    align_corners=False — reproduce that exact (slightly off-center) mapping:
    effective coord = ((kp/(size-1)*2 - 1 + 1) * size - 1) / 2.
    """
    import jax

    H, W = maps.shape[1], maps.shape[2]
    gx = keypoints_xy[..., 0] / (W - 1) * 2.0 - 1.0
    gy = keypoints_xy[..., 1] / (H - 1) * 2.0 - 1.0
    px = _unnormalize_coord(gx, W)
    py = _unnormalize_coord(gy, H)
    coords = jnp.stack([px, py], axis=-1)
    fn = bilinear_sample if mode == "bilinear" else nearest_sample
    return jax.vmap(fn)(maps, coords)
