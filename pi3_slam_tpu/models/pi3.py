"""Pi3 visual-geometry transformer as a pure function.

Functional TPU rebuild of the reference Pi3 model (pi3/models/pi3.py:16-216):
DINOv2-L/14-reg encoder -> 36-block decoder alternating per-frame and global
attention (RoPE2D + qk-norm + LayerScale 0.01) -> three 5-block transformer
heads (points / confidence / camera) -> pixel-shuffle dense maps, exp-z local
points, SVD-orthogonalized camera poses, world points = pose @ local.

TPU-first choices:
  * decoder pairs (frame attn, global attn) run under one lax.scan — a single
    compiled block body for 36 layers; the last pair's intermediate is carried
    so the 2048-dim head input (cat of final two hidden states) needs no
    per-layer output stacking.
  * frame<->global alternation is two reshapes around the same block fn — the
    token layout (B*N, hw) vs (B, N*hw) is a metadata change XLA handles for
    free inside the fused program.
  * encoder/decoder run in bf16 on TPU (compute_dtype), heads in fp32,
    mirroring the reference AMP split (pi3.py:192-209).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .dinov2 import DinoV2Config, VIT_LARGE, dinov2_forward, init_dinov2_params
from .layers import block, linear
from ..ops.pixel_shuffle import tokens_to_image
from ..ops.rope import make_patch_positions
from ..geometry.transforms import svd_orthogonalize, homogenize_points

IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class Pi3Config:
    encoder: DinoV2Config = VIT_LARGE
    patch_size: int = 14
    dec_embed_dim: int = 1024
    dec_num_heads: int = 16
    dec_depth: int = 36
    mlp_ratio: int = 4
    num_register_tokens: int = 5
    rope_base: float = 100.0
    norm_eps: float = 1e-6
    head_dim: int = 1024
    head_depth: int = 5
    head_num_heads: int = 16
    camera_dim: int = 512


def _head_decoder_forward(
    p: Dict[str, Any],
    hidden: jnp.ndarray,
    positions: jnp.ndarray,
    cfg: Pi3Config,
    num_heads: int,
) -> jnp.ndarray:
    """TransformerDecoder (transformer_head.py:9-56): project, 5 RoPE blocks
    (no qk-norm, no LayerScale), linear out. Frame-wise attention."""
    h = linear(hidden, p["project_kernel"], p["project_bias"])

    def body(x, bp):
        return (
            block(
                x,
                bp,
                num_heads=num_heads,
                positions=positions,
                rope_base=cfg.rope_base,
                norm_eps=cfg.norm_eps,
            ),
            None,
        )

    h, _ = jax.lax.scan(body, h, p["blocks"])
    return linear(h, p["out_kernel"], p["out_bias"])


def _camera_head_forward(p: Dict[str, Any], feat: jnp.ndarray) -> jnp.ndarray:
    """CameraHead (camera_head.py:32-93): 2 residual linear blocks, token-mean
    pool, 2-layer MLP, then fp32 fc_t / fc_rot with SVD orthogonalization."""
    x = feat
    for i in range(2):
        rp = p[f"res_conv{i}"]
        h = jax.nn.relu(linear(x, rp["fc1_kernel"], rp["fc1_bias"]))
        h = jax.nn.relu(linear(h, rp["fc2_kernel"], rp["fc2_bias"]))
        h = jax.nn.relu(linear(h, rp["fc3_kernel"], rp["fc3_bias"]))
        x = x + h  # head_skip is identity (in == out channels)
    pooled = jnp.mean(x, axis=1)  # spatial adaptive-avg-pool over tokens
    h = jax.nn.relu(linear(pooled, p["mlp1_kernel"], p["mlp1_bias"]))
    h = jax.nn.relu(linear(h, p["mlp2_kernel"], p["mlp2_bias"]))
    h32 = h.astype(jnp.float32)
    t = linear(h32, p["fc_t_kernel"].astype(jnp.float32), p["fc_t_bias"].astype(jnp.float32))
    r9 = linear(h32, p["fc_rot_kernel"].astype(jnp.float32), p["fc_rot_bias"].astype(jnp.float32))
    R = svd_orthogonalize(r9)
    bn = feat.shape[0]
    pose = jnp.zeros((bn, 4, 4), jnp.float32)
    pose = pose.at[:, :3, :3].set(R)
    pose = pose.at[:, :3, 3].set(t)
    pose = pose.at[:, 3, 3].set(1.0)
    return pose


def _decode(
    params: Dict[str, Any],
    hidden: jnp.ndarray,
    B: int,
    N: int,
    grid_hw: tuple[int, int],
    cfg: Pi3Config,
):
    """36-block frame/global alternating decoder (pi3.py:132-171).

    hidden: (B*N, hw, C) encoder patch tokens. Returns (hidden_cat, positions)
    with hidden_cat (B*N, hw', 2*C) = concat of the outputs of blocks 34, 35.
    """
    h, w = grid_hw
    BN, hw, C = hidden.shape
    reg = cfg.num_register_tokens

    register = jnp.broadcast_to(
        params["register_token"].astype(hidden.dtype), (BN, reg, cfg.dec_embed_dim)
    )
    x = jnp.concatenate([register, hidden], axis=1)
    hw_full = hw + reg

    # patch positions shifted +1; (0, 0) for the register tokens (pi3.py:146-154)
    pos_frame = make_patch_positions(BN, h, w, num_special=reg, offset=1)
    pos_global = pos_frame.reshape(B, N * hw_full, 2)

    def pair_body(carry, pair_params):
        x, _prev = carry
        even_p, odd_p = pair_params
        # even block: frame attention over (B*N, hw_full)
        x_e = block(
            x,
            even_p,
            num_heads=cfg.dec_num_heads,
            positions=pos_frame,
            rope_base=cfg.rope_base,
            norm_eps=cfg.norm_eps,
        )
        # odd block: global attention over (B, N*hw_full)
        x_g = block(
            x_e.reshape(B, N * hw_full, C),
            odd_p,
            num_heads=cfg.dec_num_heads,
            positions=pos_global,
            rope_base=cfg.rope_base,
            norm_eps=cfg.norm_eps,
        ).reshape(BN, hw_full, C)
        return (x_g, x_e), None

    (x_final, x_penult), _ = jax.lax.scan(
        pair_body,
        (x, x),
        (params["even_blocks"], params["odd_blocks"]),
    )
    hidden_cat = jnp.concatenate([x_penult, x_final], axis=-1)
    return hidden_cat, pos_frame


def pi3_forward(
    params: Dict[str, Any],
    imgs: jnp.ndarray,
    cfg: Pi3Config = Pi3Config(),
    compute_dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Run Pi3 on (B, N, 3, H, W) images in [0, 1].

    Returns {'points': (B,N,H,W,3), 'local_points': (B,N,H,W,3),
    'conf': (B,N,H,W,1), 'camera_poses': (B,N,4,4)} — exactly the reference
    forward contract (pi3/models/pi3.py:173-216).
    """
    B, N, _, H, W = imgs.shape
    p = cfg.patch_size
    ph, pw = H // p, W // p

    mean = jnp.asarray(IMAGE_MEAN, imgs.dtype).reshape(1, 1, 3, 1, 1)
    std = jnp.asarray(IMAGE_STD, imgs.dtype).reshape(1, 1, 3, 1, 1)
    imgs = (imgs - mean) / std

    flat = imgs.reshape(B * N, 3, H, W)
    enc = dinov2_forward(params["encoder"], flat, cfg.encoder, compute_dtype=compute_dtype)
    hidden = enc["patch_tokens"]

    hidden_cat, pos = _decode(params["decoder"], hidden, B, N, (ph, pw), cfg)

    point_hidden = _head_decoder_forward(
        params["point_decoder"], hidden_cat, pos, cfg, cfg.head_num_heads
    )
    conf_hidden = _head_decoder_forward(
        params["conf_decoder"], hidden_cat, pos, cfg, cfg.head_num_heads
    )
    camera_hidden = _head_decoder_forward(
        params["camera_decoder"], hidden_cat, pos, cfg, cfg.head_num_heads
    )

    reg = cfg.num_register_tokens
    # fp32 heads (reference runs them outside autocast)
    with jax.default_matmul_precision("float32"):
        pt = point_hidden[:, reg:].astype(jnp.float32)
        ret = tokens_to_image(
            linear(pt, params["point_head"]["kernel"].astype(jnp.float32),
                   params["point_head"]["bias"].astype(jnp.float32)),
            (ph, pw), p, 3,
        ).reshape(B, N, H, W, 3)
        xy, z = ret[..., :2], ret[..., 2:]
        z = jnp.exp(z)
        local_points = jnp.concatenate([xy * z, z], axis=-1)

        cf = conf_hidden[:, reg:].astype(jnp.float32)
        conf = tokens_to_image(
            linear(cf, params["conf_head"]["kernel"].astype(jnp.float32),
                   params["conf_head"]["bias"].astype(jnp.float32)),
            (ph, pw), p, 1,
        ).reshape(B, N, H, W, 1)

        camera_poses = _camera_head_forward(
            params["camera_head"], camera_hidden[:, reg:]
        ).reshape(B, N, 4, 4)

        points = jnp.einsum(
            "bnij,bnhwj->bnhwi", camera_poses, homogenize_points(local_points)
        )[..., :3]

    return {
        "points": points,
        "local_points": local_points,
        "conf": conf,
        "camera_poses": camera_poses,
    }


def _init_block_stack(key, L, dim, mlp_ratio, qk_norm, layerscale_init, dtype, num_heads=16):
    hidden = dim * mlp_ratio
    keys = jax.random.split(key, 4)

    def trunc(k, shape, std=0.02):
        return (jax.random.truncated_normal(k, -2, 2, shape) * std).astype(dtype)

    blocks = {
        "norm1_scale": jnp.ones((L, dim), dtype),
        "norm1_bias": jnp.zeros((L, dim), dtype),
        "qkv_kernel": trunc(keys[0], (L, dim, 3 * dim)),
        "qkv_bias": jnp.zeros((L, 3 * dim), dtype),
        "proj_kernel": trunc(keys[1], (L, dim, dim)),
        "proj_bias": jnp.zeros((L, dim), dtype),
        "norm2_scale": jnp.ones((L, dim), dtype),
        "norm2_bias": jnp.zeros((L, dim), dtype),
        "fc1_kernel": trunc(keys[2], (L, dim, hidden)),
        "fc1_bias": jnp.zeros((L, hidden), dtype),
        "fc2_kernel": trunc(keys[3], (L, hidden, dim)),
        "fc2_bias": jnp.zeros((L, dim), dtype),
    }
    if qk_norm:
        hd = dim // num_heads  # per-head LayerNorm over head_dim
        blocks["q_norm_scale"] = jnp.ones((L, hd), dtype)
        blocks["k_norm_scale"] = jnp.ones((L, hd), dtype)
        blocks["q_norm_bias"] = jnp.zeros((L, hd), dtype)
        blocks["k_norm_bias"] = jnp.zeros((L, hd), dtype)
    if layerscale_init is not None:
        blocks["ls1"] = jnp.full((L, dim), layerscale_init, dtype)
        blocks["ls2"] = jnp.full((L, dim), layerscale_init, dtype)
    return blocks


def _init_head_decoder(key, in_dim, dim, out_dim, depth, mlp_ratio, dtype):
    keys = jax.random.split(key, 3)

    def trunc(k, shape, std=0.02):
        return (jax.random.truncated_normal(k, -2, 2, shape) * std).astype(dtype)

    return {
        "project_kernel": trunc(keys[0], (in_dim, dim)),
        "project_bias": jnp.zeros((dim,), dtype),
        "blocks": _init_block_stack(keys[1], depth, dim, mlp_ratio, False, None, dtype),
        "out_kernel": trunc(keys[2], (dim, out_dim)),
        "out_bias": jnp.zeros((out_dim,), dtype),
    }


def init_pi3_params(key, cfg: Pi3Config = Pi3Config(), dtype=jnp.float32) -> Dict[str, Any]:
    """Random-initialized parameter pytree (for tests; real use converts the
    HF yyfz233/Pi3 checkpoint via models/convert.py)."""
    C = cfg.dec_embed_dim
    keys = jax.random.split(key, 10)

    def trunc(k, shape, std=0.02):
        return (jax.random.truncated_normal(k, -2, 2, shape) * std).astype(dtype)

    dec_pairs = cfg.dec_depth // 2
    even = _init_block_stack(keys[0], dec_pairs, C, cfg.mlp_ratio, True, 0.01, dtype, cfg.dec_num_heads)
    odd = _init_block_stack(keys[1], dec_pairs, C, cfg.mlp_ratio, True, 0.01, dtype, cfg.dec_num_heads)

    def camera_head(key):
        ks = jax.random.split(key, 10)
        d = cfg.camera_dim
        out = {}
        for i in range(2):
            out[f"res_conv{i}"] = {
                "fc1_kernel": trunc(ks[3 * i], (d, d)),
                "fc1_bias": jnp.zeros((d,), dtype),
                "fc2_kernel": trunc(ks[3 * i + 1], (d, d)),
                "fc2_bias": jnp.zeros((d,), dtype),
                "fc3_kernel": trunc(ks[3 * i + 2], (d, d)),
                "fc3_bias": jnp.zeros((d,), dtype),
            }
        out.update(
            mlp1_kernel=trunc(ks[6], (d, d)),
            mlp1_bias=jnp.zeros((d,), dtype),
            mlp2_kernel=trunc(ks[7], (d, d)),
            mlp2_bias=jnp.zeros((d,), dtype),
            fc_t_kernel=trunc(ks[8], (d, 3)),
            fc_t_bias=jnp.zeros((3,), dtype),
            fc_rot_kernel=trunc(ks[9], (d, 9)),
            fc_rot_bias=jnp.zeros((9,), dtype),
        )
        return out

    psz = cfg.patch_size
    return {
        "encoder": init_dinov2_params(keys[2], cfg.encoder, dtype),
        "decoder": {
            "register_token": trunc(keys[3], (cfg.num_register_tokens, C), std=1e-6),
            "even_blocks": even,
            "odd_blocks": odd,
        },
        "point_decoder": _init_head_decoder(
            keys[4], 2 * C, cfg.head_dim, cfg.head_dim, cfg.head_depth, cfg.mlp_ratio, dtype
        ),
        "conf_decoder": _init_head_decoder(
            keys[5], 2 * C, cfg.head_dim, cfg.head_dim, cfg.head_depth, cfg.mlp_ratio, dtype
        ),
        "camera_decoder": _init_head_decoder(
            keys[6], 2 * C, cfg.head_dim, cfg.camera_dim, cfg.head_depth, cfg.mlp_ratio, dtype
        ),
        "point_head": {
            "kernel": trunc(keys[7], (cfg.head_dim, 3 * psz * psz)),
            "bias": jnp.zeros((3 * psz * psz,), dtype),
        },
        "conf_head": {
            "kernel": trunc(keys[8], (cfg.head_dim, psz * psz)),
            "bias": jnp.zeros((psz * psz,), dtype),
        },
        "camera_head": camera_head(keys[9]),
    }
