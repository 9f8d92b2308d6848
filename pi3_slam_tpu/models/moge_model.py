"""MoGe-2 metric monocular depth model in functional JAX.

Rebuild of microsoft/MoGe v2 as vendored in the reference
(moge/model/v2.py + moge/model/modules.py): DINOv2 encoder (intermediate
layers, 1x1 projections, sum), UV-concat multi-scale pyramid, shared ConvStack
neck, points/mask ConvStack heads, exp scale head on the cls token; infer
recovers focal/shift and returns metric depth.

All convolutions run NHWC (TPU-native layout); the ConvStack's 3x3 replicate-
padded convs, GroupNorms, and pixel-shuffle resamplers are faithful ports.
The model config travels with the converted checkpoint (JSON inside the npz),
so any MoGe-2 variant (vits/vitb/vitl) loads without code changes.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .dinov2 import DinoV2Config, dinov2_intermediate_layers
from ..geometry.focal import recover_focal_shift
from ..geometry.maps import normalized_view_plane_uv
from ..ops.interpolate import bilinear_resize_hw

IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)

_BACKBONES = {
    "dinov2_vits14": dict(embed_dim=384, depth=12, num_heads=6),
    "dinov2_vitb14": dict(embed_dim=768, depth=12, num_heads=12),
    "dinov2_vitl14": dict(embed_dim=1024, depth=24, num_heads=16),
}


@dataclasses.dataclass(frozen=True)
class ConvStackConfig:
    dim_in: Tuple[Optional[int], ...]
    dim_res_blocks: Tuple[int, ...]
    dim_out: Tuple[Optional[int], ...]
    resamplers: Tuple[str, ...] | str = "pixel_shuffle"
    dim_times_res_block_hidden: int = 1
    num_res_blocks: Any = 1
    res_block_in_norm: str = "layer_norm"
    res_block_hidden_norm: str = "group_norm"

    def num_blocks_at(self, level: int) -> int:
        if isinstance(self.num_res_blocks, (list, tuple)):
            return self.num_res_blocks[level]
        return self.num_res_blocks

    def resampler_at(self, level: int) -> str:
        if isinstance(self.resamplers, (list, tuple)):
            return self.resamplers[level]
        return self.resamplers


@dataclasses.dataclass(frozen=True)
class MoGeConfig:
    backbone: str
    intermediate_layers: Any  # int or list
    encoder_dim_out: int
    neck: ConvStackConfig
    points_head: Optional[ConvStackConfig]
    mask_head: Optional[ConvStackConfig]
    normal_head: Optional[ConvStackConfig]
    scale_head_dims: Optional[Tuple[int, ...]]
    remap_output: str = "linear"
    num_tokens_range: Tuple[int, int] = (1200, 3600)

    @property
    def encoder_cfg(self) -> DinoV2Config:
        bb = _BACKBONES[self.backbone]
        # plain (non-reg) dinov2: 0 registers, offset-kludge interpolation
        return DinoV2Config(
            embed_dim=bb["embed_dim"],
            depth=bb["depth"],
            num_heads=bb["num_heads"],
            num_register_tokens=0,
            interpolate_offset=0.1,
            interpolate_antialias=False,
        )

    def to_json(self) -> str:
        def cs(c):
            return None if c is None else dataclasses.asdict(c)

        return json.dumps(
            {
                "backbone": self.backbone,
                "intermediate_layers": self.intermediate_layers,
                "encoder_dim_out": self.encoder_dim_out,
                "neck": cs(self.neck),
                "points_head": cs(self.points_head),
                "mask_head": cs(self.mask_head),
                "normal_head": cs(self.normal_head),
                "scale_head_dims": self.scale_head_dims,
                "remap_output": self.remap_output,
                "num_tokens_range": self.num_tokens_range,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "MoGeConfig":
        d = json.loads(s)

        def cs(x):
            if x is None:
                return None
            x = dict(x)
            for key in ("dim_in", "dim_res_blocks", "dim_out"):
                x[key] = tuple(x[key])
            if isinstance(x.get("resamplers"), list):
                x["resamplers"] = tuple(x["resamplers"])
            return ConvStackConfig(**x)

        return cls(
            backbone=d["backbone"],
            intermediate_layers=d["intermediate_layers"],
            encoder_dim_out=d["encoder_dim_out"],
            neck=cs(d["neck"]),
            points_head=cs(d["points_head"]),
            mask_head=cs(d["mask_head"]),
            normal_head=cs(d["normal_head"]),
            scale_head_dims=None if d["scale_head_dims"] is None else tuple(d["scale_head_dims"]),
            remap_output=d["remap_output"],
            num_tokens_range=tuple(d["num_tokens_range"]),
        )

    @classmethod
    def from_params(cls, params: Dict[str, Any]) -> "MoGeConfig":
        cfg_str = params.get("_config_json")
        if cfg_str is None:
            raise ValueError("converted MoGe params missing _config_json")
        s = cfg_str if isinstance(cfg_str, str) else str(np.asarray(cfg_str).item())
        return cls.from_json(s)


# ----- primitive NHWC ops -----


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None,
           replicate_pad: bool = True) -> jnp.ndarray:
    """NHWC conv with torch-style replicate padding for odd kernels.

    kernel: (kh, kw, in, out).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh > 1 or kw > 1:
        ph, pw = kh // 2, kw // 2
        mode = "edge" if replicate_pad else "constant"
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def group_norm(x: jnp.ndarray, num_groups: int, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC: normalize each group across (H, W, C/G), fp32."""
    b, h, w, c = x.shape
    g = num_groups
    dtype = x.dtype
    x32 = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def pixel_shuffle_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C), channel-major (c, i, j) order
    matching torch PixelShuffle on the converted conv weights."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


# ----- ConvStack -----


def _norm_groups(kind: str, channels: int) -> int | None:
    if kind == "group_norm":
        return channels // 32
    if kind == "layer_norm":
        return 1
    if kind == "none":
        return None
    raise ValueError(f"unsupported norm: {kind}")


def residual_conv_block(x: jnp.ndarray, p: Dict[str, Any], cfg: ConvStackConfig) -> jnp.ndarray:
    c_in = x.shape[-1]
    g_in = _norm_groups(cfg.res_block_in_norm, c_in)
    h = x
    if g_in is not None:
        h = group_norm(h, g_in, p["norm1_scale"], p["norm1_bias"])
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv1_kernel"], p["conv1_bias"])
    g_hidden = _norm_groups(cfg.res_block_hidden_norm, h.shape[-1])
    if g_hidden is not None:
        h = group_norm(h, g_hidden, p["norm2_scale"], p["norm2_bias"])
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv2_kernel"], p["conv2_bias"])
    skip = x if "skip_kernel" not in p else conv2d(x, p["skip_kernel"], p["skip_bias"])
    return skip + h


def resampler_pixel_shuffle(x: jnp.ndarray, p: Dict[str, Any], scale: int = 2) -> jnp.ndarray:
    h = conv2d(x, p["conv1_kernel"], p["conv1_bias"])
    h = pixel_shuffle_nhwc(h, scale)
    return conv2d(h, p["conv2_kernel"], p["conv2_bias"])


def conv_stack_forward(
    params: Dict[str, Any], in_features: List[jnp.ndarray | None], cfg: ConvStackConfig
) -> List[jnp.ndarray]:
    """modules.py:254-268: per level — input 1x1, add, res blocks, output 1x1,
    then upsample into the next level."""
    out_features = []
    x = None
    n_levels = len(cfg.dim_res_blocks)
    for i in range(n_levels):
        ib = params["input_blocks"][i]
        feature = in_features[i]
        if ib is not None and feature is not None:
            feature = conv2d(feature, ib["kernel"], ib["bias"])
        if i == 0:
            x = feature
        elif feature is not None:
            x = x + feature
        for rb in params["res_blocks"][i]:
            x = residual_conv_block(x, rb, cfg)
        ob = params["output_blocks"][i]
        out_features.append(conv2d(x, ob["kernel"], ob["bias"]) if ob is not None else x)
        if i < n_levels - 1:
            assert cfg.resampler_at(i) == "pixel_shuffle", "only pixel_shuffle resamplers are used by MoGe-2"
            x = resampler_pixel_shuffle(x, params["resamplers"][i])
    return out_features


# ----- MoGe forward / infer -----


def moge_forward(
    params: Dict[str, Any],
    image: jnp.ndarray,
    cfg: MoGeConfig,
    num_tokens: int,
    compute_dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """image: (B, 3, H, W) in [0, 1]. Returns points (B,H,W,3), mask (B,H,W),
    metric_scale (B,) — mirroring v2.py:128-179."""
    B, _, H, W = image.shape
    ar = W / H
    base_h = int((num_tokens / ar) ** 0.5)
    base_w = int((num_tokens * ar) ** 0.5)

    # resize to the token grid (bilinear antialias) + normalize
    img_hwc = image.transpose(0, 2, 3, 1)
    img14 = bilinear_resize_hw(img_hwc, (base_h * 14, base_w * 14), antialias=True)
    mean = jnp.asarray(IMAGE_MEAN, img14.dtype)
    std = jnp.asarray(IMAGE_STD, img14.dtype)
    img14 = (img14 - mean) / std

    layers = dinov2_intermediate_layers(
        params["backbone"],
        img14.transpose(0, 3, 1, 2),
        cfg.encoder_cfg,
        cfg.intermediate_layers,
        compute_dtype=compute_dtype,
    )
    cls_token = layers[-1][1]  # (B, C)

    feat = None
    for (tokens, _), proj in zip(layers, params["output_projections"]):
        fmap = tokens.reshape(B, base_h, base_w, -1)
        f = conv2d(fmap, proj["kernel"], proj["bias"])
        feat = f if feat is None else feat + f

    # multi-scale inputs: level 0 = features + uv, levels 1..4 = uv only
    n_levels = len(cfg.neck.dim_res_blocks)
    in_features: List[jnp.ndarray | None] = []
    for level in range(n_levels):
        uv = normalized_view_plane_uv(
            base_w * 2**level, base_h * 2**level, aspect_ratio=ar, dtype=feat.dtype
        )
        uv = jnp.broadcast_to(uv[None], (B,) + uv.shape)
        in_features.append(jnp.concatenate([feat, uv], axis=-1) if level == 0 else uv)

    neck_out = conv_stack_forward(params["neck"], in_features, cfg.neck)

    result: Dict[str, jnp.ndarray] = {}
    if cfg.points_head is not None:
        pts = conv_stack_forward(params["points_head"], neck_out, cfg.points_head)[-1]
        pts = bilinear_resize_hw(pts.astype(jnp.float32), (H, W), antialias=False)
        if cfg.remap_output == "exp":
            xy, z = pts[..., :2], pts[..., 2:]
            z = jnp.exp(z)
            pts = jnp.concatenate([xy * z, z], axis=-1)
        elif cfg.remap_output == "sinh":
            pts = jnp.sinh(pts)
        elif cfg.remap_output == "sinh_exp":
            pts = jnp.concatenate([jnp.sinh(pts[..., :2]), jnp.exp(pts[..., 2:])], axis=-1)
        result["points"] = pts
    if cfg.mask_head is not None:
        m = conv_stack_forward(params["mask_head"], neck_out, cfg.mask_head)[-1]
        m = bilinear_resize_hw(m.astype(jnp.float32), (H, W), antialias=False)
        result["mask"] = jax.nn.sigmoid(m[..., 0])
    if cfg.normal_head is not None:
        nrm = conv_stack_forward(params["normal_head"], neck_out, cfg.normal_head)[-1]
        nrm = bilinear_resize_hw(nrm.astype(jnp.float32), (H, W), antialias=False)
        result["normal"] = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12
        )
    if cfg.scale_head_dims is not None:
        h = cls_token.astype(jnp.float32)
        mls = params["scale_head"]
        for i, lin in enumerate(mls):
            h = h @ lin["kernel"].astype(jnp.float32) + lin["bias"].astype(jnp.float32)
            if i < len(mls) - 1:
                h = jax.nn.relu(h)
        result["metric_scale"] = jnp.exp(h[..., 0])
    return result


def moge_infer_depth(params: Dict[str, Any], image: jnp.ndarray, cfg: MoGeConfig,
                     num_tokens: int | None = None, compute_dtype=jnp.float32) -> jnp.ndarray:
    """(3, H, W) [0,1] -> (H, W) metric depth; inf outside the validity mask
    (v2.py:181-290 with the defaults the SLAM pipeline uses: resolution_level
    9 => max tokens, apply_mask=True)."""
    if num_tokens is None:
        num_tokens = cfg.num_tokens_range[1]
    out = moge_forward(params, image[None], cfg, num_tokens, compute_dtype=compute_dtype)
    points = out["points"][0]
    mask = out.get("mask")
    mask_b = (mask[0] > 0.5) if mask is not None else jnp.ones(points.shape[:2], bool)
    focal, shift = recover_focal_shift(points[None], mask_b[None])
    depth = points[..., 2] + shift[0]
    mask_b = mask_b & (depth > 0)
    if "metric_scale" in out:
        depth = depth * out["metric_scale"][0]
    return jnp.where(mask_b, depth, jnp.inf)
