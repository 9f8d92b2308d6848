"""MoGe v1 monocular geometry model (JAX).

Rebuild of the legacy MoGe model (moge/model/v1.py:24-391). The SLAM
pipeline itself only consumes v2 (slam/offline_chunk_creator.py:74 /
online_reconstructor.py:78 load moge-2 checkpoints), but v1 checkpoints
(Ruicheng/moge-vitl etc.) are part of the reference's model zoo — this
closes the last inventory row.

Architecture (v1.py:63-141):
  * DINOv2 backbone intermediate layers, each projected by a 1x1 conv to
    dim_proj and SUMMED (not concatenated like v2).
  * three upsample blocks: UV-concat -> ConvTranspose2d(k2, s2) + 3x3 conv
    (replicate pad) -> N residual conv blocks (GroupNorm(1) pre-norm,
    hidden GroupNorm(c/32) or LayerNorm-style GN(1)).
  * bilinear resize to the (resized) image resolution, UV-concat, then one
    output block per head (points 3ch, mask 1ch): 3x3 conv -> res blocks ->
    ReLU -> last conv.
  * forward resizes input bicubic-antialias to the num_tokens resolution
    (v1.py:277-281), output back to the original size in fp32, remap
    (linear / sinh / exp / sinh_exp, v1.py:259-273).

TPU-first notes: all convs NHWC; the ConvTranspose2d(k2, s2) is lowered as
a 1x1 conv to 4x channels + pixel shuffle (exactly equivalent: each input
pixel emits one 2x2 output patch); the resizes are torch-semantics
interpolation matrices on the MXU (ops/interpolate.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple, Union

import jax
import jax.numpy as jnp

from .dinov2 import dinov2_intermediate_layers
from .moge_model import (
    ConvStackConfig,
    IMAGE_MEAN,
    IMAGE_STD,
    _BACKBONES,
    conv2d,
    pixel_shuffle_nhwc,
    residual_conv_block,
)
from ..geometry.focal import recover_focal_shift
from ..geometry.maps import normalized_view_plane_uv
from ..ops.interpolate import bicubic_resize_hw, bilinear_resize_hw


@dataclass(frozen=True)
class MoGeV1Config:
    backbone: str = "dinov2_vitb14"
    intermediate_layers: Union[int, Tuple[int, ...]] = 4
    dim_proj: int = 512
    dim_upsample: Tuple[int, ...] = (256, 128, 128)
    dim_times_res_block_hidden: int = 1
    num_res_blocks: int = 1
    remap_output: str = "linear"
    res_block_norm: str = "group_norm"
    num_tokens_range: Tuple[int, int] = (1200, 2500)
    last_res_blocks: int = 0
    last_conv_channels: int = 32
    last_conv_size: int = 1
    mask_threshold: float = 0.5

    @property
    def encoder_cfg(self):
        from .dinov2 import DinoV2Config

        bb = _BACKBONES[self.backbone]
        return DinoV2Config(
            embed_dim=bb["embed_dim"],
            depth=bb["depth"],
            num_heads=bb["num_heads"],
            num_register_tokens=0,
            interpolate_offset=0.1,
            interpolate_antialias=False,
        )

    @property
    def layer_indices(self) -> Tuple[int, ...]:
        if isinstance(self.intermediate_layers, int):
            depth = _BACKBONES[self.backbone]["depth"]
            return tuple(range(depth - self.intermediate_layers, depth))
        return tuple(self.intermediate_layers)

    # residual blocks: first norm is always GroupNorm(1, c) (v1.py:44), the
    # hidden norm follows res_block_norm (v1.py:47)
    @property
    def _res_cfg(self) -> ConvStackConfig:
        return ConvStackConfig(
            dim_in=(), dim_res_blocks=(), dim_out=(),
            res_block_in_norm="layer_norm",
            res_block_hidden_norm=self.res_block_norm,
        )

    @classmethod
    def from_model_config(cls, mc: Dict[str, Any]) -> "MoGeV1Config":
        mc = dict(mc)
        if "encoder" in mc:  # checkpoint model_config names the field 'encoder'
            mc["backbone"] = mc.pop("encoder")
        if "trained_area_range" in mc:  # legacy key (v1.py:168-171)
            lo, hi = mc.pop("trained_area_range")
            mc["num_tokens_range"] = (lo // 14**2, hi // 14**2)
        known = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in mc.items() if k in known}
        for key in ("dim_upsample", "num_tokens_range"):
            if key in kw and isinstance(kw[key], list):
                kw[key] = tuple(kw[key])
        if isinstance(kw.get("intermediate_layers"), list):
            kw["intermediate_layers"] = tuple(kw["intermediate_layers"])
        if isinstance(kw.get("remap_output"), bool):
            kw["remap_output"] = "exp" if kw["remap_output"] else "linear"
        return cls(**kw)


def _deconv2x2(x: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    """ConvTranspose2d(kernel 2, stride 2) as 1x1 conv -> pixel shuffle.

    p['kernel'] is (1, 1, in, out*4) with output channels ordered
    (out, dy, dx) to match pixel_shuffle_nhwc's channel-major layout."""
    y = conv2d(x, p["kernel"], None)
    y = pixel_shuffle_nhwc(y, 2)
    return y + p["bias"].astype(y.dtype)


def _uv_concat(x: jnp.ndarray, aspect_ratio: float) -> jnp.ndarray:
    B, h, w, _ = x.shape
    uv = normalized_view_plane_uv(w, h, aspect_ratio=aspect_ratio, dtype=x.dtype)
    return jnp.concatenate([x, jnp.broadcast_to(uv[None], (B, h, w, 2))], axis=-1)


def _head_forward(
    params: Dict[str, Any],
    features: List[Tuple[jnp.ndarray, jnp.ndarray]],
    grid_hw: Tuple[int, int],
    image_hw: Tuple[int, int],
    cfg: MoGeV1Config,
) -> List[jnp.ndarray]:
    """Head.forward (v1.py:113-141): project+sum, 3 upsample stages with UV
    concat, full-res resize + UV, per-output blocks."""
    hp, wp = grid_hw
    img_h, img_w = image_hw
    ar = img_w / img_h
    B = features[0][0].shape[0]

    x = None
    for (tokens, _cls), proj in zip(features, params["projects"]):
        fmap = tokens.reshape(B, hp, wp, -1)
        f = conv2d(fmap, proj["kernel"], proj["bias"])
        x = f if x is None else x + f

    for blk in params["upsample_blocks"]:
        x = _uv_concat(x, ar)
        x = _deconv2x2(x, blk["deconv"])
        x = conv2d(x, blk["conv_kernel"], blk["conv_bias"])
        for rb in blk.get("res_blocks") or []:
            x = residual_conv_block(x, rb, cfg._res_cfg)

    x = bilinear_resize_hw(x, (img_h, img_w), antialias=False)
    x = _uv_concat(x, ar)

    outputs = []
    for ob in params["output_blocks"]:
        y = conv2d(x, ob["conv_in_kernel"], ob["conv_in_bias"])
        for rb in ob.get("res_blocks") or []:
            y = residual_conv_block(y, rb, cfg._res_cfg)
        y = jax.nn.relu(y)
        y = conv2d(y, ob["conv_out_kernel"], ob["conv_out_bias"])
        outputs.append(y)
    return outputs


def _remap_points(points: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind in ("linear", "none"):
        return points
    if kind == "sinh":
        return jnp.sinh(points)
    if kind == "exp":
        xy, z = points[..., :2], points[..., 2:]
        z = jnp.exp(z)
        return jnp.concatenate([xy * z, z], axis=-1)
    if kind == "sinh_exp":
        return jnp.concatenate(
            [jnp.sinh(points[..., :2]), jnp.exp(points[..., 2:])], axis=-1
        )
    raise ValueError(f"invalid remap_output: {kind}")


def moge_v1_forward(
    params: Dict[str, Any],
    image: jnp.ndarray,
    cfg: MoGeV1Config,
    num_tokens: int,
    compute_dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """image (B, 3, H, W) in [0, 1] -> {'points': (B,H,W,3), 'mask': (B,H,W)}
    (mask is the raw logit-sigmoid-free channel like the reference forward,
    which returns pre-threshold mask scores; v1.py:275-297)."""
    B, _, H, W = image.shape

    # bicubic-antialias resize to the num_tokens resolution (v1.py:277-280)
    resize_factor = ((num_tokens * 14**2) / (H * W)) ** 0.5
    rh, rw = int(H * resize_factor), int(W * resize_factor)
    img = bicubic_resize_hw(image.transpose(0, 2, 3, 1), (rh, rw), antialias=True)

    mean = jnp.asarray(IMAGE_MEAN, img.dtype)
    std = jnp.asarray(IMAGE_STD, img.dtype)
    img = (img - mean) / std
    # bilinear-antialias to the nearest 14-multiple (v1.py:283)
    hp, wp = rh // 14, rw // 14
    img14 = bilinear_resize_hw(img, (hp * 14, wp * 14), antialias=True)

    features = dinov2_intermediate_layers(
        params["backbone"],
        img14.transpose(0, 3, 1, 2),
        cfg.encoder_cfg,
        cfg.layer_indices,
        compute_dtype=compute_dtype,
    )
    points, mask = _head_forward(
        params["head"], features, (hp, wp), (rh, rw), cfg
    )

    points = bilinear_resize_hw(points.astype(jnp.float32), (H, W), antialias=False)
    mask = bilinear_resize_hw(mask.astype(jnp.float32), (H, W), antialias=False)[..., 0]
    points = _remap_points(points, cfg.remap_output)
    return {"points": points, "mask": mask}


def moge_v1_infer(
    params: Dict[str, Any],
    image: jnp.ndarray,
    cfg: MoGeV1Config,
    num_tokens: int | None = None,
    compute_dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """v1.py:301-390 infer: points/depth/intrinsics/mask. v1 predicts
    affine-invariant geometry — there is NO metric scale head (the pipeline
    uses v2 for metric depth). Depth is masked with inf outside validity."""
    if num_tokens is None:
        num_tokens = cfg.num_tokens_range[1]
    squeeze = image.ndim == 3
    if squeeze:
        image = image[None]
    B, _, H, W = image.shape
    ar = W / H

    out = moge_v1_forward(params, image, cfg, num_tokens, compute_dtype=compute_dtype)
    points = out["points"]
    mask_b = out["mask"] > cfg.mask_threshold

    focal, shift = recover_focal_shift(points, mask_b)
    fx = focal / 2 * (1 + ar**2) ** 0.5 / ar
    fy = focal / 2 * (1 + ar**2) ** 0.5
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    intrinsics = jnp.stack(
        [
            jnp.stack([fx, z, 0.5 * o], -1),
            jnp.stack([z, fy, 0.5 * o], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )  # (B, 3, 3), normalized pinhole like utils3d intrinsics_from_focal_center
    depth = points[..., 2] + shift[:, None, None]

    # force_projection (v1.py:371-373): recompute points from the depth map.
    # uv is diagonal-normalized, so points = (uv / focal * depth, depth)
    uv = normalized_view_plane_uv(W, H, aspect_ratio=ar, dtype=jnp.float32)
    xy = uv[None] / focal[:, None, None, None] * depth[..., None]
    pts_proj = jnp.concatenate([xy, depth[..., None]], axis=-1)

    inf = jnp.asarray(jnp.inf, points.dtype)
    result = {
        "points": jnp.where(mask_b[..., None], pts_proj, inf),
        "depth": jnp.where(mask_b, depth, inf),
        "intrinsics": intrinsics,
        "mask": mask_b,
    }
    if squeeze:
        result = {k: v[0] for k, v in result.items()}
    return result
