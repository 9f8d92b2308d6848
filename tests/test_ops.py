"""Ops parity tests against torch reference semantics (RoPE2D, pixel shuffle,
bicubic pos-embed interpolation, grid_sample keypoint interpolation)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pi3_slam_tpu.ops import (
    rope_2d,
    make_patch_positions,
    sdpa,
    tokens_to_image,
    interpolate_pos_embed,
    grid_sample_frames,
)


def torch_rope2d(tokens, positions, base=100.0):
    """Reference RoPE2D fallback (pi3/models/layers/pos_embed.py:112-159)
    reimplemented minimally. tokens: (B, H, T, D); positions: (B, T, 2)."""

    def rotate_half(x):
        x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2 :]
        return torch.cat((-x2, x1), dim=-1)

    D = tokens.size(3) // 2
    inv_freq = 1.0 / (base ** (torch.arange(0, D, 2).float() / D))
    seq = int(positions.max()) + 1
    t = torch.arange(seq).float()
    freqs = torch.einsum("i,j->ij", t, inv_freq)
    freqs = torch.cat((freqs, freqs), dim=-1)
    cos_t, sin_t = freqs.cos(), freqs.sin()

    def apply_1d(tok, pos1d):
        cos = F.embedding(pos1d, cos_t)[:, None, :, :]
        sin = F.embedding(pos1d, sin_t)[:, None, :, :]
        return tok * cos + rotate_half(tok) * sin

    y, x = tokens.chunk(2, dim=-1)
    y = apply_1d(y, positions[:, :, 0])
    x = apply_1d(x, positions[:, :, 1])
    return torch.cat((y, x), dim=-1)


def test_rope2d_matches_reference(rng):
    B, H, T, D = 2, 4, 30, 64
    tokens = rng.normal(size=(B, H, T, D)).astype(np.float32)
    pos = rng.integers(0, 20, size=(B, T, 2))
    ref = torch_rope2d(torch.from_numpy(tokens), torch.from_numpy(pos)).numpy()
    # ours uses (B, T, H, D)
    ours = np.asarray(
        rope_2d(jnp.asarray(tokens.transpose(0, 2, 1, 3)), jnp.asarray(pos))
    ).transpose(0, 2, 1, 3)
    # XLA's vectorized sin/cos differs from libm by ~1e-4 at large angles;
    # well below bf16 resolution, irrelevant for model parity.
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_rope2d_zero_position_is_identity(rng):
    x = rng.normal(size=(1, 7, 2, 32)).astype(np.float32)
    pos = np.zeros((1, 7, 2), dtype=np.int32)
    out = np.asarray(rope_2d(jnp.asarray(x), jnp.asarray(pos)))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_make_patch_positions():
    pos = np.asarray(make_patch_positions(2, 3, 4, num_special=5, offset=1))
    assert pos.shape == (2, 17, 2)
    np.testing.assert_array_equal(pos[0, :5], 0)
    np.testing.assert_array_equal(pos[0, 5], [1, 1])
    np.testing.assert_array_equal(pos[0, 6], [1, 2])  # x-fastest raster
    np.testing.assert_array_equal(pos[1, -1], [3, 4])


def test_sdpa_matches_torch(rng):
    B, T, H, D = 2, 16, 4, 32
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, H, D)).astype(np.float32)
    v = rng.normal(size=(B, T, H, D)).astype(np.float32)
    ref = (
        F.scaled_dot_product_attention(
            torch.from_numpy(q.transpose(0, 2, 1, 3)),
            torch.from_numpy(k.transpose(0, 2, 1, 3)),
            torch.from_numpy(v.transpose(0, 2, 1, 3)),
        )
        .numpy()
        .transpose(0, 2, 1, 3)
    )
    ours = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_tokens_to_image_matches_pixel_shuffle(rng):
    B, h, w, C, p = 2, 3, 5, 3, 4
    tokens = rng.normal(size=(B, h * w, C * p * p)).astype(np.float32)
    # reference path: (B,S,D) -> transpose -> view(B,-1,h,w) -> pixel_shuffle
    t = torch.from_numpy(tokens)
    feat = t.transpose(-1, -2).reshape(B, -1, h, w)
    ref = F.pixel_shuffle(feat, p).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(tokens_to_image(jnp.asarray(tokens), (h, w), p, C))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_interpolate_pos_embed_matches_torch_offset_mode(rng):
    """Plain dinov2 config: offset=0.1, antialias=False, scale_factor call."""
    M, C = 37, 8
    pe = rng.normal(size=(M * M, C)).astype(np.float32)
    for h0, w0 in [(24, 31), (37, 37), (10, 47)]:
        ours = np.asarray(
            interpolate_pos_embed(jnp.asarray(pe), (h0, w0), interpolate_offset=0.1, antialias=False)
        )
        pt = torch.from_numpy(pe).reshape(1, M, M, C).permute(0, 3, 1, 2)
        if (h0, w0) == (M, M):
            ref = pe
        else:
            sy = float(h0 + 0.1) / M
            sx = float(w0 + 0.1) / M
            ref = (
                F.interpolate(pt, scale_factor=(sy, sx), mode="bicubic", antialias=False)
                .permute(0, 2, 3, 1)
                .reshape(h0 * w0, C)
                .numpy()
            )
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_interpolate_pos_embed_matches_torch_reg_mode(rng):
    """Pi3's encoder config (vitl14_reg): size-based, antialias=True."""
    M, C = 37, 8
    pe = rng.normal(size=(M * M, C)).astype(np.float32)
    for h0, w0 in [(4, 4), (24, 31), (10, 47), (40, 45)]:
        ours = np.asarray(
            interpolate_pos_embed(jnp.asarray(pe), (h0, w0), interpolate_offset=0.0, antialias=True)
        )
        pt = torch.from_numpy(pe).reshape(1, M, M, C).permute(0, 3, 1, 2)
        ref = (
            F.interpolate(pt, size=(h0, w0), mode="bicubic", antialias=True)
            .permute(0, 2, 3, 1)
            .reshape(h0 * w0, C)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_grid_sample_frames_matches_torch(rng):
    N, H, W, C, K = 3, 20, 28, 4, 17
    maps = rng.normal(size=(N, H, W, C)).astype(np.float32)
    kp = np.stack(
        [rng.uniform(0, W - 1, size=(N, K)), rng.uniform(0, H - 1, size=(N, K))], axis=-1
    ).astype(np.float32)

    # reference path (slam/offline_chunk_creator.py:129-152)
    gx = torch.from_numpy(kp[..., 0] / (W - 1) * 2 - 1)
    gy = torch.from_numpy(kp[..., 1] / (H - 1) * 2 - 1)
    grid = torch.stack([gx, gy], dim=-1).unsqueeze(1)  # (N, 1, K, 2)
    for mode in ["bilinear", "nearest"]:
        ref = (
            F.grid_sample(
                torch.from_numpy(maps.transpose(0, 3, 1, 2)),
                grid,
                mode=mode,
                align_corners=False,
                padding_mode="border",
            )
            .squeeze(2)
            .permute(0, 2, 1)
            .numpy()
        )
        ours = np.asarray(grid_sample_frames(jnp.asarray(maps), jnp.asarray(kp), mode=mode))
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=mode)
