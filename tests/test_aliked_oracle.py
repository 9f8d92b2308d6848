"""Whole-model ALIKED oracle: a straight-line numpy re-evaluation of the
composed extractor (backbone -> pyramid -> score head -> DKD -> SDDH) pins the
end-to-end wiring, not just the NMS/soft-argmax units — a shape-preserving
wiring bug in models/aliked.py now fails numerically.

The oracle is written independently of jax/lax: convolutions via
sliding_window_view + einsum, pooling via reshape means, align_corners
upsampling from the torch nn.Upsample formula, NMS via an explicit window
max. Reference behavior being pinned: the lightglue ALIKED extractor the
reference consumes (utils/keypoint_extraction.py:258-307).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pi3_slam_tpu.models.aliked import (
    ALIKEDConfig,
    aliked_extract,
    init_aliked_params,
)

# jax.nn.selu constants
pytestmark = pytest.mark.slow  # torch-oracle parity: minutes per test


_SELU_SCALE = 1.0507009873554805
_SELU_ALPHA = 1.6732632423543772


def np_selu(x):
    return _SELU_SCALE * np.where(x > 0, x, _SELU_ALPHA * (np.exp(x) - 1.0))


def np_conv2d_same(x, kernel, bias=None):
    """x (N,H,W,Cin), kernel (kh,kw,Cin,Cout), zero SAME padding."""
    kh, kw = kernel.shape[:2]
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    win = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(1, 2))
    # win: (N, H, W, Cin, kh, kw)
    y = np.einsum("nhwcij,ijco->nhwo", win, kernel)
    if bias is not None:
        y = y + bias
    return y


def np_batch_norm(x, p, eps):
    scale = p["weight"] / np.sqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def np_conv_bn_gate(x, p, name, eps, gate=True):
    y = np_batch_norm(np_conv2d_same(x, p[f"{name}_kernel"]), p[f"{name}_bn"], eps)
    return np_selu(y) if gate else y


def np_avg_pool(x, k):
    n, h, w, c = x.shape
    return x.reshape(n, h // k, k, w // k, k, c).mean(axis=(2, 4))


def np_upsample_align_corners(x, H, W):
    """(N,h,w,C) -> (N,H,W,C), torch nn.Upsample(bilinear, align_corners=True)."""
    n, h, w, c = x.shape
    out = np.empty((n, H, W, c), x.dtype)
    ys = np.linspace(0.0, h - 1.0, H) if h > 1 else np.zeros(H)
    xs = np.linspace(0.0, w - 1.0, W) if w > 1 else np.zeros(W)
    y0 = np.floor(ys).astype(int).clip(0, h - 1)
    x0 = np.floor(xs).astype(int).clip(0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cc = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + cc * wy * (1 - wx) + d * wy * wx
    return out


def np_bilinear_sample(fmap, xy):
    """fmap (H,W,C); xy (...,2) -> (...,C)."""
    H, W, C = fmap.shape
    x = np.clip(xy[..., 0], 0.0, W - 1.0)
    y = np.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    return (
        fmap[y0, x0] * (1 - wy) * (1 - wx)
        + fmap[y0, x1] * (1 - wy) * wx
        + fmap[y1, x0] * wy * (1 - wx)
        + fmap[y1, x1] * wy * wx
    )


def numpy_aliked_forward(params, images, cfg: ALIKEDConfig, max_keypoints: int):
    """Full ALIKED forward in straight-line numpy (float64 accumulations)."""
    eps = cfg.bn_eps
    x = np.transpose(np.asarray(images, np.float64), (0, 2, 3, 1))
    N, H, W, _ = x.shape
    p = {k: np.asarray(v, np.float64) if not isinstance(v, dict) else v
         for k, v in params.items()}

    # backbone
    def conv_block(x, bp):
        x = np_conv_bn_gate(x, bp, "conv1", eps)
        return np_conv_bn_gate(x, bp, "conv2", eps)

    def res_block(x, bp):
        out = np_conv_bn_gate(x, bp, "conv1", eps)
        out = np_conv_bn_gate(out, bp, "conv2", eps, gate=False)
        short = np_conv2d_same(x, bp["downsample_kernel"], bp.get("downsample_bias"))
        return np_selu(out + short)

    x1 = conv_block(x, params["block1"])
    x2 = res_block(np_avg_pool(x1, 2), params["block2"])
    x3 = res_block(np_avg_pool(x2, 4), params["block3"])
    x4 = res_block(np_avg_pool(x3, 4), params["block4"])

    f1 = np_selu(np_conv2d_same(x1, p["conv1_kernel"]))
    f2 = np_selu(np_conv2d_same(x2, p["conv2_kernel"]))
    f3 = np_selu(np_conv2d_same(x3, p["conv3_kernel"]))
    f4 = np_selu(np_conv2d_same(x4, p["conv4_kernel"]))
    feats = np.concatenate(
        [f1,
         np_upsample_align_corners(f2, H, W),
         np_upsample_align_corners(f3, H, W),
         np_upsample_align_corners(f4, H, W)],
        axis=-1,
    )
    feats = feats / np.maximum(np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)

    s = params["score_head"]
    y = np_selu(np_conv2d_same(feats, s["conv1_kernel"], s["conv1_bias"]))
    y = np_selu(np_conv2d_same(y, s["conv2_kernel"], s["conv2_bias"]))
    y = np_selu(np_conv2d_same(y, s["conv3_kernel"], s["conv3_bias"]))
    y = np_conv2d_same(y, s["conv4_kernel"], s["conv4_bias"])
    score = 1.0 / (1.0 + np.exp(-y[..., 0]))

    # DKD: window NMS + interior mask + top-k + soft-argmax
    r = cfg.nms_radius
    win = 2 * r + 1
    sp = np.pad(score, ((0, 0), (r, r), (r, r)), constant_values=-np.inf)
    swin = np.lib.stride_tricks.sliding_window_view(sp, (win, win), axis=(1, 2))
    pooled = swin.max(axis=(-2, -1))
    is_max = score >= pooled
    yy = np.arange(H)[None, :, None]
    xx = np.arange(W)[None, None, :]
    interior = (yy >= r) & (yy < H - r) & (xx >= r) & (xx < W - r)
    cand = np.where(is_max & interior, score, 0.0)

    flat = cand.reshape(N, H * W)
    order = np.argsort(-flat, axis=-1, kind="stable")[:, :max_keypoints]
    scores = np.take_along_axis(flat, order, axis=-1)
    ky, kx = order // W, order % W
    valid = scores > cfg.detection_threshold

    offs = np.arange(-r, r + 1)
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    py = ky[..., None, None] + oy
    px = kx[..., None, None] + ox
    patch = np.stack([score[i][py[i], px[i]] for i in range(N)])
    e = np.exp((patch - patch.max(axis=(-2, -1), keepdims=True)) / 0.1)
    wsoft = e / e.sum(axis=(-2, -1), keepdims=True)
    dy = (wsoft * oy).sum(axis=(-2, -1))
    dx = (wsoft * ox).sum(axis=(-2, -1))
    kp = np.stack([kx + dx, ky + dy], axis=-1)
    kp = np.clip(kp, 0.0, np.array([W - 1.0, H - 1.0]))

    # SDDH
    K, M, dim = cfg.kernel_size, cfg.n_pos, cfg.dim
    rk = K // 2
    o = np.arange(-rk, rk + 1, dtype=np.float64)
    poy, pox = np.meshgrid(o, o, indexing="ij")
    patch_offsets = np.stack([pox, poy], axis=-1).reshape(-1, 2)
    descs = []
    for i in range(N):
        patches = np_bilinear_sample(feats[i], kp[i][:, None, :] + patch_offsets[None])
        flatp = patches.reshape(patches.shape[0], -1)
        w1 = p["offset_conv1_kernel"].reshape(-1, 2 * M)
        off = np_selu(flatp @ w1 + p["offset_conv1_bias"])
        off = off @ p["offset_conv2_kernel"].reshape(2 * M, 2 * M) + p["offset_conv2_bias"]
        offsets = off.reshape(-1, M, 2)
        samples = np_bilinear_sample(feats[i], kp[i][:, None, :] + offsets)
        sf = samples @ p["sf_conv_kernel"].reshape(dim, dim)
        d = np.einsum("kmc,mcd->kd", sf, p["agg_weights"])
        descs.append(d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12))
    return {
        "keypoints": kp,
        "scores": scores,
        "valid": valid,
        "descriptors": np.stack(descs),
        "score_map": score,
    }


@pytest.mark.parametrize("seed", [0, 3])
def test_aliked_full_forward_matches_numpy_oracle(seed):
    cfg = ALIKEDConfig(c1=8, c2=16, c3=32, c4=64, dim=64, kernel_size=3, n_pos=8)
    params = init_aliked_params(seed, cfg)
    rng = np.random.default_rng(100 + seed)
    # smooth texture + noise: isolated maxima, no score ties
    H = W = 64
    base = rng.random((2, 3, H, W)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    tex = 0.3 * np.sin(xx / 3.0) * np.cos(yy / 4.0)
    images = np.clip(base * 0.5 + 0.25 + tex[None, None], 0.0, 1.0).astype(np.float32)

    K = 64
    got = aliked_extract(params, jnp.asarray(images), cfg, max_keypoints=K)
    want = numpy_aliked_forward(params, images, cfg, max_keypoints=K)

    got_valid = np.asarray(got["valid"])
    assert got_valid.shape == (2, K)
    np.testing.assert_array_equal(got_valid, want["valid"])
    assert got_valid.sum() > 20, "test needs real detections to pin anything"

    # valid slots: detection, refinement, and description all line up
    for i in range(2):
        v = got_valid[i]
        np.testing.assert_allclose(
            np.asarray(got["scores"])[i][v], want["scores"][i][v], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got["keypoints"])[i][v], want["keypoints"][i][v], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["descriptors"])[i][v].astype(np.float64),
            want["descriptors"][i][v],
            atol=5e-4,
        )


def test_aliked_oracle_catches_wiring_swap():
    """The oracle has teeth: swapping two pyramid levels must fail it."""
    cfg = ALIKEDConfig(c1=8, c2=16, c3=32, c4=64, dim=64, kernel_size=3, n_pos=8)
    params = init_aliked_params(0, cfg)
    rng = np.random.default_rng(7)
    images = rng.random((1, 3, 64, 64)).astype(np.float32)

    K = 32
    want = numpy_aliked_forward(params, images, cfg, max_keypoints=K)

    # sabotage: transpose the score-head conv3 kernel's in/out channels —
    # shape-preserving (3,3,4,4), so only a numeric gate can catch it
    bad = dict(params)
    bad["score_head"] = dict(params["score_head"])
    bad["score_head"]["conv3_kernel"] = np.transpose(
        params["score_head"]["conv3_kernel"], (0, 1, 3, 2)
    ).copy()
    got = aliked_extract(bad, jnp.asarray(images), cfg, max_keypoints=K)
    v = np.asarray(got["valid"])[0] & want["valid"][0]
    assert v.sum() > 0
    diff = np.abs(np.asarray(got["scores"])[0][v] - want["scores"][0][v]).max()
    assert diff > 1e-3, "sabotaged weights still matched — oracle is toothless"
