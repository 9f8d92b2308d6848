"""Dense-map utilities: depth discontinuity masks, normalized view-plane UV,
nearest-neighbor resize (torch F.interpolate 'nearest' semantics).

Reference semantics:
  * ``depth_edge``              — pi3/utils/geometry.py:347-375 (max-pool form)
  * ``normalized_view_plane_uv``— utils/geometry_torch.py:39-51
  * ``nearest_resize``          — F.interpolate(mode='nearest') used by
                                  recover_focal_shift (utils/geometry_torch.py:148-151)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _max_pool_2d_same(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Max pool (..., H, W) with stride 1 and torch-style zero-offset padding.

    torch F.max_pool2d(pad=k//2) pads symmetrically with -inf (implicit), so the
    output has the same H, W for odd k.
    """
    pad = kernel_size // 2
    neg_inf = jnp.array(-jnp.inf, dtype=x.dtype)
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (kernel_size, kernel_size),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)],
    )


def depth_edge(
    depth: jnp.ndarray,
    atol: float | None = None,
    rtol: float | None = None,
    kernel_size: int = 3,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Depth-discontinuity mask: pixels whose kxk neighborhood max-min depth
    difference exceeds atol (absolute) or rtol (relative to center depth).

    depth: (..., H, W) -> bool (..., H, W). Matches the reference max-pool
    formulation exactly (diff = maxpool(d) + maxpool(-d)).
    """
    if mask is None:
        diff = _max_pool_2d_same(depth, kernel_size) + _max_pool_2d_same(-depth, kernel_size)
    else:
        neg_inf = jnp.array(-jnp.inf, dtype=depth.dtype)
        diff = _max_pool_2d_same(jnp.where(mask, depth, neg_inf), kernel_size) + _max_pool_2d_same(
            jnp.where(mask, -depth, neg_inf), kernel_size
        )

    edge = jnp.zeros(depth.shape, dtype=bool)
    if atol is not None:
        edge = edge | (diff > atol)
    if rtol is not None:
        rel = jnp.nan_to_num(diff / depth, nan=0.0, posinf=0.0, neginf=0.0)
        edge = edge | (rel > rtol)
    return edge


def normalized_view_plane_uv(
    width: int, height: int, aspect_ratio: float | None = None, dtype=jnp.float32
) -> jnp.ndarray:
    """UV grid (H, W, 2) spanning the diagonally-normalized view plane:
    corners at (+-w/diag, +-h/diag), sampled at pixel centers."""
    if aspect_ratio is None:
        aspect_ratio = width / height
    span_x = aspect_ratio / (1 + aspect_ratio**2) ** 0.5
    span_y = 1 / (1 + aspect_ratio**2) ** 0.5
    u = jnp.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width, dtype=dtype)
    v = jnp.linspace(
        -span_y * (height - 1) / height, span_y * (height - 1) / height, height, dtype=dtype
    )
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1)


def nearest_resize(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of (..., H, W, C) maps to (..., h, w, C) using
    torch F.interpolate(mode='nearest') index semantics: src = floor(dst * H/h).
    """
    H, W = x.shape[-3], x.shape[-2]
    h, w = out_hw
    rows = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
    return x[..., rows[:, None], cols[None, :], :]
