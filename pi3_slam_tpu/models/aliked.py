"""ALIKED keypoint detector + descriptor network in JAX.

TPU-native reimplementation of the ALIKED architecture (Zhao et al. 2023,
"ALIKED: A Lighter Keypoint and Descriptor Extraction Network via Deformable
Transformation") as consumed by the reference through lightglue
(/root/reference/utils/keypoint_extraction.py:258-307). Since this
environment has no network egress (and no lightglue install), the model is
built from the published architecture; tools/convert_checkpoint.py maps the
lightglue/ALIKED torch state_dict onto this parameter tree by name and
reports any unmatched key so a layout mismatch surfaces at conversion time.

Structure (aliked-n16: c1..c4 = 16/32/64/128, dim = 128, K = 3, M = 16):

  backbone   ConvBlock(3,c1) -> avgpool2 -> ResBlock(c1,c2) -> avgpool4 ->
             ResBlock(c2,c3) -> avgpool4 -> ResBlock(c3,c4); SELU gates,
             BatchNorm (inference statistics), 1x1-conv downsample shortcuts.
  pyramid    1x1 conv each scale to dim/4, bilinear-upsample (align_corners)
             to full res, concat -> L2-normalized dense feature map.
  score head 1x1 conv dim->8, 3x3 8->4, 3x3 4->4, 3x3 4->1 (SELU between),
             sigmoid -> score map.
  DKD        non-max suppression (local max within nms radius) + threshold +
             top-k, soft-argmax sub-pixel refinement over the NMS window.
  SDDH       per-keypoint KxK feature patch -> offset conv (KxK valid conv to
             2M deformable offsets) -> bilinear feature samples at kp+offset
             -> 1x1 sf_conv -> einsum aggregation with (M, dim, dim) weights
             -> L2-normalized descriptor.

All convs run NHWC (TPU-native); upsampling is two einsum contractions with
precomputed 1D interpolation matrices (MXU-friendly, align_corners=True to
match torch nn.Upsample in the original).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ALIKEDConfig:
    c1: int = 16
    c2: int = 32
    c3: int = 64
    c4: int = 128
    dim: int = 128
    kernel_size: int = 3  # SDDH patch size K
    n_pos: int = 16  # SDDH deformable sample count M
    nms_radius: int = 2
    detection_threshold: float = 0.005  # reference uses 0.005 (keypoint_extraction.py:264)
    max_keypoints: int = 1000
    bn_eps: float = 1e-5


CONFIGS = {
    # c1, c2, c3, c4, dim, K, M — the lightglue/ALIKED model zoo
    "aliked-t16": ALIKEDConfig(8, 16, 32, 64, 64, 3, 16),
    "aliked-n16": ALIKEDConfig(16, 32, 64, 128, 128, 3, 16),
    "aliked-n16rot": ALIKEDConfig(16, 32, 64, 128, 128, 3, 16),
    "aliked-n32": ALIKEDConfig(16, 32, 64, 128, 128, 3, 32),
}


# ---------------------------------------------------------------------------
# primitive layers (NHWC)
# ---------------------------------------------------------------------------


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, padding="SAME") -> jnp.ndarray:
    """x (N,H,W,C) * kernel (kh,kw,Cin,Cout)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def batch_norm(x: jnp.ndarray, p: Dict[str, Any], eps: float) -> jnp.ndarray:
    """Inference-mode BatchNorm with stored running statistics."""
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale.astype(x.dtype) + (p["bias"] - p["running_mean"] * scale).astype(x.dtype)


def conv_bn_gate(x, p, name, eps, gate=True):
    y = conv2d(x, p[f"{name}_kernel"])
    y = batch_norm(y, p[f"{name}_bn"], eps)
    return jax.nn.selu(y) if gate else y


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _upsample_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, align_corners=True
    (torch nn.Upsample(mode='bilinear', align_corners=True))."""
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    src = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.floor(src).astype(np.int64).clip(0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = (src - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1.0 - w_hi
    m[np.arange(n_out), hi] += w_hi
    return m


def upsample_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """(N, h, w, C) -> (N, H, W, C) align_corners bilinear via two einsums."""
    N, h, w, C = x.shape
    H, W = out_hw
    mh = jnp.asarray(_upsample_matrix(h, H), x.dtype)
    mw = jnp.asarray(_upsample_matrix(w, W), x.dtype)
    y = jnp.einsum("Hh,nhwc->nHwc", mh, x)
    return jnp.einsum("Ww,nHwc->nHWc", mw, y)


# ---------------------------------------------------------------------------
# backbone + heads
# ---------------------------------------------------------------------------


def _conv_block(x, p, eps):
    """ConvBlock: conv3x3-BN-SELU twice."""
    x = conv_bn_gate(x, p, "conv1", eps)
    return conv_bn_gate(x, p, "conv2", eps)


def _res_block(x, p, eps):
    """ResBlock: conv3x3-BN-SELU, conv3x3-BN, + 1x1-conv shortcut, SELU."""
    out = conv_bn_gate(x, p, "conv1", eps)
    out = conv_bn_gate(out, p, "conv2", eps, gate=False)
    shortcut = conv2d(x, p["downsample_kernel"], p.get("downsample_bias"))
    return jax.nn.selu(out + shortcut)


def aliked_dense_maps(
    params: Dict[str, Any], images: jnp.ndarray, cfg: ALIKEDConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images (N, 3, H, W) in [0,1] -> (feature_map (N,H,W,dim) L2-normalized,
    score_map (N,H,W) in (0,1))."""
    x = images.transpose(0, 2, 3, 1)  # NHWC
    N, H, W, _ = x.shape
    eps = cfg.bn_eps

    x1 = _conv_block(x, params["block1"], eps)  # (H, W, c1)
    x2 = _res_block(avg_pool(x1, 2), params["block2"], eps)  # (H/2, c2)
    x3 = _res_block(avg_pool(x2, 4), params["block3"], eps)  # (H/8, c3)
    x4 = _res_block(avg_pool(x3, 4), params["block4"], eps)  # (H/32, c4)

    f1 = jax.nn.selu(conv2d(x1, params["conv1_kernel"]))
    f2 = jax.nn.selu(conv2d(x2, params["conv2_kernel"]))
    f3 = jax.nn.selu(conv2d(x3, params["conv3_kernel"]))
    f4 = jax.nn.selu(conv2d(x4, params["conv4_kernel"]))

    feats = jnp.concatenate(
        [
            f1,
            upsample_bilinear(f2, (H, W)),
            upsample_bilinear(f3, (H, W)),
            upsample_bilinear(f4, (H, W)),
        ],
        axis=-1,
    )  # (N, H, W, dim)
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
    ).astype(feats.dtype)

    s = params["score_head"]
    y = jax.nn.selu(conv2d(feats, s["conv1_kernel"], s.get("conv1_bias")))
    y = jax.nn.selu(conv2d(y, s["conv2_kernel"], s.get("conv2_bias")))
    y = jax.nn.selu(conv2d(y, s["conv3_kernel"], s.get("conv3_bias")))
    y = conv2d(y, s["conv4_kernel"], s.get("conv4_bias"))
    score = jax.nn.sigmoid(y[..., 0].astype(jnp.float32))  # (N, H, W)
    return feats, score


# ---------------------------------------------------------------------------
# DKD — differentiable keypoint detection (NMS + top-k + soft-argmax)
# ---------------------------------------------------------------------------


def detect_keypoints(
    score_map: jnp.ndarray,
    max_keypoints: int,
    nms_radius: int = 2,
    threshold: float = 0.005,
    temperature: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    """score_map (N, H, W) -> top-k NMS keypoints with sub-pixel refinement.

    Returns {'keypoints': (N, K, 2) float (x, y) pixel coords,
    'scores': (N, K), 'valid': (N, K) bool} with K = max_keypoints; invalid
    slots (below threshold / beyond NMS survivors) have valid=False and
    coordinates clamped inside the image.
    """
    N, H, W = score_map.shape
    r = nms_radius
    win = 2 * r + 1

    pooled = jax.lax.reduce_window(
        score_map, -jnp.inf, jax.lax.max, (1, win, win), (1, 1, 1), "SAME"
    )
    is_max = score_map >= pooled
    # suppress the image border (patch extraction stays in bounds)
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    interior = (yy >= r) & (yy < H - r) & (xx >= r) & (xx < W - r)
    cand = jnp.where(is_max & interior, score_map, 0.0)

    flat = cand.reshape(N, H * W)
    scores, idx = jax.lax.top_k(flat, max_keypoints)  # (N, K)
    ky = idx // W
    kx = idx % W
    valid = scores > threshold

    # soft-argmax refinement over the NMS window around each integer keypoint
    offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")  # (win, win)
    patch_y = ky[..., None, None] + oy  # (N, K, win, win)
    patch_x = kx[..., None, None] + ox
    patch = jax.vmap(lambda sm, py, px: sm[py, px])(score_map, patch_y, patch_x)
    w_soft = jax.nn.softmax(
        patch.reshape(N, max_keypoints, -1) / temperature, axis=-1
    ).reshape(patch.shape)
    dy = jnp.sum(w_soft * oy.astype(jnp.float32), axis=(-2, -1))
    dx = jnp.sum(w_soft * ox.astype(jnp.float32), axis=(-2, -1))

    kp = jnp.stack(
        [kx.astype(jnp.float32) + dx, ky.astype(jnp.float32) + dy], axis=-1
    )  # (N, K, 2) as (x, y)
    # invalid top-k slots land on tied zero-score candidates whose soft-argmax
    # patch can wrap around the border; keep every returned coordinate inside
    # the image so downstream interpolation stays in bounds
    kp = jnp.clip(
        kp, 0.0, jnp.asarray([W - 1.0, H - 1.0], jnp.float32)
    )
    return {"keypoints": kp, "scores": scores, "valid": valid}


# ---------------------------------------------------------------------------
# SDDH — sparse deformable descriptor head
# ---------------------------------------------------------------------------


def _bilinear_sample(fmap: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """fmap (H, W, C); xy (..., 2) pixel coords -> (..., C)."""
    H, W, C = fmap.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    v00 = fmap[y0, x0]
    v01 = fmap[y0, x1]
    v10 = fmap[y1, x0]
    v11 = fmap[y1, x1]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def describe_keypoints(
    params: Dict[str, Any],
    feature_map: jnp.ndarray,
    keypoints: jnp.ndarray,
    cfg: ALIKEDConfig,
) -> jnp.ndarray:
    """SDDH: feature_map (N,H,W,dim), keypoints (N,K,2) (x,y) ->
    descriptors (N,K,dim), L2-normalized."""
    K = cfg.kernel_size
    r = K // 2
    M = cfg.n_pos
    N, H, W, dim = feature_map.shape

    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    patch_offsets = jnp.stack([ox, oy], axis=-1).reshape(-1, 2)  # (K*K, 2)

    def per_frame(fmap, kps):
        # (Kp, K*K, dim) feature patches around each keypoint
        patches = _bilinear_sample(fmap, kps[:, None, :] + patch_offsets[None])
        # offset conv: a KxK valid conv on a KxK patch == full contraction.
        # torch kernel (2M, dim, K, K) -> stored as (K, K, dim, 2M)
        flat = patches.reshape(patches.shape[0], -1)  # (Kp, K*K*dim)
        w1 = params["offset_conv1_kernel"].reshape(-1, 2 * M)
        off = jax.nn.selu(flat.astype(w1.dtype) @ w1 + params["offset_conv1_bias"])
        off = off @ params["offset_conv2_kernel"].reshape(2 * M, 2 * M) + params[
            "offset_conv2_bias"
        ]
        offsets = off.reshape(-1, M, 2)  # (Kp, M, 2) in (x, y)

        pos = kps[:, None, :] + offsets  # (Kp, M, 2)
        samples = _bilinear_sample(fmap, pos)  # (Kp, M, dim)
        # sf_conv: 1x1 conv over dim, no bias
        sf = samples @ params["sf_conv_kernel"].reshape(dim, dim).astype(samples.dtype)
        # aggregation: einsum with (M, dim, dim) weights
        desc = jnp.einsum(
            "kmc,mcd->kd", sf.astype(jnp.float32), params["agg_weights"].astype(jnp.float32)
        )
        return desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

    return jax.vmap(per_frame)(feature_map, keypoints)


# ---------------------------------------------------------------------------
# full forward + init
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "max_keypoints"))
def aliked_extract(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: ALIKEDConfig = CONFIGS["aliked-n16"],
    max_keypoints: int = 1000,
) -> Dict[str, jnp.ndarray]:
    """Full ALIKED forward: images (N,3,H,W) in [0,1] (or uint8 bytes) ->
    {'keypoints': (N,K,2) float pixel (x,y), 'descriptors': (N,K,dim),
    'scores': (N,K), 'valid': (N,K)}."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    feats, score = aliked_dense_maps(params, images, cfg)
    det = detect_keypoints(
        score, max_keypoints, cfg.nms_radius, cfg.detection_threshold
    )
    desc = describe_keypoints(params, feats, det["keypoints"], cfg)
    return {
        "keypoints": det["keypoints"],
        "descriptors": desc,
        "scores": det["scores"],
        "valid": det["valid"],
    }


def init_aliked_params(seed: int, cfg: ALIKEDConfig = CONFIGS["aliked-n16"]) -> Dict[str, Any]:
    """Random host-side (numpy) init — used by tests and as the documented
    parameter-tree layout the converter targets."""
    rng = np.random.default_rng(seed)

    def conv(kh, kw, cin, cout, scale=None):
        std = scale or (1.0 / np.sqrt(kh * kw * cin))
        return (rng.random((kh, kw, cin, cout)).astype(np.float32) - 0.5) * 2 * std

    def bn(c):
        return {
            "weight": np.ones(c, np.float32),
            "bias": np.zeros(c, np.float32),
            "running_mean": np.zeros(c, np.float32),
            "running_var": np.ones(c, np.float32),
        }

    def conv_block(cin, cout):
        return {
            "conv1_kernel": conv(3, 3, cin, cout),
            "conv1_bn": bn(cout),
            "conv2_kernel": conv(3, 3, cout, cout),
            "conv2_bn": bn(cout),
        }

    def res_block(cin, cout):
        return {
            "conv1_kernel": conv(3, 3, cin, cout),
            "conv1_bn": bn(cout),
            "conv2_kernel": conv(3, 3, cout, cout),
            "conv2_bn": bn(cout),
            "downsample_kernel": conv(1, 1, cin, cout),
            "downsample_bias": np.zeros(cout, np.float32),
        }

    d4 = cfg.dim // 4
    M = cfg.n_pos
    K = cfg.kernel_size
    return {
        "block1": conv_block(3, cfg.c1),
        "block2": res_block(cfg.c1, cfg.c2),
        "block3": res_block(cfg.c2, cfg.c3),
        "block4": res_block(cfg.c3, cfg.c4),
        "conv1_kernel": conv(1, 1, cfg.c1, d4),
        "conv2_kernel": conv(1, 1, cfg.c2, d4),
        "conv3_kernel": conv(1, 1, cfg.c3, d4),
        "conv4_kernel": conv(1, 1, cfg.dim, d4),
        "score_head": {
            "conv1_kernel": conv(1, 1, cfg.dim, 8),
            "conv1_bias": np.zeros(8, np.float32),
            "conv2_kernel": conv(3, 3, 8, 4),
            "conv2_bias": np.zeros(4, np.float32),
            "conv3_kernel": conv(3, 3, 4, 4),
            "conv3_bias": np.zeros(4, np.float32),
            "conv4_kernel": conv(3, 3, 4, 1),
            "conv4_bias": np.zeros(1, np.float32),
        },
        "offset_conv1_kernel": conv(K, K, cfg.dim, 2 * M),
        "offset_conv1_bias": np.zeros(2 * M, np.float32),
        "offset_conv2_kernel": conv(1, 1, 2 * M, 2 * M),
        "offset_conv2_bias": np.zeros(2 * M, np.float32),
        "sf_conv_kernel": conv(1, 1, cfg.dim, cfg.dim),
        "agg_weights": rng.random((M, cfg.dim, cfg.dim)).astype(np.float32) * 0.1,
    }
