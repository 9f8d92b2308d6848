"""DINOv2 ViT encoder as a pure function.

Functional rebuild of the reference's vendored DinoVisionTransformer
(pi3/models/dinov2/models/vision_transformer.py) in the dinov2_vitl14_reg
configuration used by Pi3 (hub/backbones.py:18-56: img_size=518, patch=14,
init_values=1.0, ffn='mlp', 4 register tokens, interpolate_offset=0.1).

Blocks are stacked along a leading axis and executed with lax.scan so XLA
compiles one block body regardless of depth. Patch embedding is a reshape +
matmul (identical math to the stride-14 conv, but lands directly on the MXU).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .layers import block, layer_norm
from ..ops.interpolate import interpolate_pos_embed


@dataclass(frozen=True)
class DinoV2Config:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    num_register_tokens: int = 4
    pos_embed_size: int = 37  # 518 // 14
    norm_eps: float = 1e-6
    # *_reg factories: antialias=True, offset=0.0 (hub/backbones.py:128-140)
    interpolate_offset: float = 0.0
    interpolate_antialias: bool = True


def _key_seed(key) -> int:
    """Host int seed from a jax PRNG key (typed or legacy) or a plain int."""
    import numpy as np

    if isinstance(key, int):
        return key
    try:
        data = jax.random.key_data(key)
    except Exception:
        data = key
    return int(np.asarray(data).ravel()[-1])


VIT_SMALL = DinoV2Config(embed_dim=384, depth=12, num_heads=6)
VIT_BASE = DinoV2Config(embed_dim=768, depth=12, num_heads=12)
VIT_LARGE = DinoV2Config()


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, 3, H, W) -> (B, h*w, 3*patch*patch) tokens, y-major raster.

    Per-token feature order is (channel, py, px) to match torch Conv2d
    weight flattening.
    """
    b, c, H, W = images.shape
    h, w = H // patch, W // patch
    x = images.reshape(b, c, h, patch, w, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, h, w, C, p, p)
    return x.reshape(b, h * w, c * patch * patch)


def _block_scan(params_stacked: Dict[str, Any], x: jnp.ndarray, num_heads: int, norm_eps: float):
    def body(h, p):
        return block(h, p, num_heads=num_heads, norm_eps=norm_eps), None

    out, _ = jax.lax.scan(body, x, params_stacked)
    return out


def dinov2_forward(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: DinoV2Config = VIT_LARGE,
    compute_dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Encode (B, 3, H, W) images (already model-normalized).

    Returns dict with 'patch_tokens' (B, h*w, C), 'cls_token' (B, C),
    'register_tokens' (B, R, C) — all post final-norm, mirroring
    x_norm_patchtokens / x_norm_clstoken outputs.
    """
    p = cfg.patch_size
    B, _, H, W = images.shape
    h, w = H // p, W // p

    tokens = patchify(images.astype(compute_dtype), p)
    tokens = tokens @ params["patch_embed_kernel"].astype(compute_dtype)
    tokens = tokens + params["patch_embed_bias"].astype(compute_dtype)

    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (B, 1, cfg.embed_dim)
    )
    x = jnp.concatenate([cls, tokens], axis=1)

    # positional embedding: row 0 is the cls pos, rest is the square patch grid
    pos = params["pos_embed"].astype(jnp.float32)
    patch_pos = interpolate_pos_embed(
        pos[1:],
        (h, w),
        interpolate_offset=cfg.interpolate_offset,
        antialias=cfg.interpolate_antialias,
    )
    full_pos = jnp.concatenate([pos[:1], patch_pos], axis=0).astype(compute_dtype)
    x = x + full_pos[None]

    if cfg.num_register_tokens:
        reg = jnp.broadcast_to(
            params["register_tokens"].astype(compute_dtype),
            (B, cfg.num_register_tokens, cfg.embed_dim),
        )
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    x = _block_scan(params["blocks"], x, cfg.num_heads, cfg.norm_eps)
    x = layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.norm_eps)

    r = cfg.num_register_tokens
    return {
        "cls_token": x[:, 0],
        "register_tokens": x[:, 1 : r + 1],
        "patch_tokens": x[:, r + 1 :],
    }


def dinov2_intermediate_layers(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: DinoV2Config,
    n,
    compute_dtype=jnp.float32,
):
    """get_intermediate_layers equivalent (vision_transformer.py:283-300):
    outputs of the selected blocks, each passed through the final norm,
    returned as [(patch_tokens, cls_token), ...].

    n: int (last n blocks) or explicit list of block indices.
    """
    p = cfg.patch_size
    B, _, H, W = images.shape
    h, w = H // p, W // p

    tokens = patchify(images.astype(compute_dtype), p)
    tokens = tokens @ params["patch_embed_kernel"].astype(compute_dtype)
    tokens = tokens + params["patch_embed_bias"].astype(compute_dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype), (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, tokens], axis=1)
    pos = params["pos_embed"].astype(jnp.float32)
    patch_pos = interpolate_pos_embed(
        pos[1:], (h, w), cfg.interpolate_offset, cfg.interpolate_antialias
    )
    x = x + jnp.concatenate([pos[:1], patch_pos], axis=0).astype(compute_dtype)[None]
    if cfg.num_register_tokens:
        reg = jnp.broadcast_to(
            params["register_tokens"].astype(compute_dtype),
            (B, cfg.num_register_tokens, cfg.embed_dim),
        )
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    indices = list(range(cfg.depth - n, cfg.depth)) if isinstance(n, int) else list(n)

    def body(hx, bp):
        out = block(hx, bp, num_heads=cfg.num_heads, norm_eps=cfg.norm_eps)
        return out, out

    _, all_h = jax.lax.scan(body, x, params["blocks"])  # (L, B, T, C)

    r = cfg.num_register_tokens
    results = []
    for i in indices:
        xi = layer_norm(all_h[i], params["norm_scale"], params["norm_bias"], cfg.norm_eps)
        results.append((xi[:, r + 1 :], xi[:, 0]))
    return results


def init_dinov2_params(key, cfg: DinoV2Config = VIT_LARGE, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init (shapes match the converter's output; values are only for
    tests — real use loads converted pretrained weights).

    Generated host-side with numpy: per-array jax.random dispatches cost ~100ms
    each through the axon remote backend (~2 min for the full tree).
    """
    import numpy as np

    C = cfg.embed_dim
    hidden = C * cfg.mlp_ratio
    L = cfg.depth
    n_pos = cfg.pos_embed_size**2 + 1
    rng = np.random.default_rng(_key_seed(key))
    keys = [None] * 8

    def trunc(_k, shape, std=0.02):
        return (rng.random(shape, dtype=np.float32) - 0.5) * (std * 3.4641016)

    blocks = {
        "norm1_scale": np.ones((L, C), np.float32),
        "norm1_bias": np.zeros((L, C), np.float32),
        "qkv_kernel": trunc(keys[0], (L, C, 3 * C)),
        "qkv_bias": np.zeros((L, 3 * C), np.float32),
        "proj_kernel": trunc(keys[1], (L, C, C)),
        "proj_bias": np.zeros((L, C), np.float32),
        "ls1": np.ones((L, C), np.float32),
        "norm2_scale": np.ones((L, C), np.float32),
        "norm2_bias": np.zeros((L, C), np.float32),
        "fc1_kernel": trunc(keys[2], (L, C, hidden)),
        "fc1_bias": np.zeros((L, hidden), np.float32),
        "fc2_kernel": trunc(keys[3], (L, hidden, C)),
        "fc2_bias": np.zeros((L, C), np.float32),
        "ls2": np.ones((L, C), np.float32),
    }
    return {
        "patch_embed_kernel": trunc(keys[4], (3 * cfg.patch_size**2, C)),
        "patch_embed_bias": np.zeros((C,), np.float32),
        "cls_token": trunc(keys[5], (1, C), std=1e-6),
        "pos_embed": trunc(keys[6], (n_pos, C)),
        "register_tokens": trunc(keys[7], (cfg.num_register_tokens, C), std=1e-6),
        "blocks": blocks,
        "norm_scale": np.ones((C,), np.float32),
        "norm_bias": np.zeros((C,), np.float32),
    }
