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

from .dinov2 import DinoV2Config, VIT_LARGE, dinov2_forward, init_dinov2_params, _key_seed
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
    # EXPERIMENTAL inference acceleration (off by default = exact): merge
    # this many consecutive frames' key/value tokens (per spatial position,
    # mean after qk-norm + RoPE) in the decoder's GLOBAL attention blocks —
    # the FastVGGT/token-merging observation that cross-frame global
    # attention is highly redundant (arxiv 2509.02560). Queries stay
    # per-token, so outputs keep full resolution; global-attention FLOPs
    # drop by this factor. Approximate: accuracy impact must be validated
    # against a real checkpoint before production use. Applied only when
    # the frame count divides evenly and no tensor-parallel mesh is active.
    global_kv_merge: int = 1

    def to_json(self) -> str:
        """Serialize (incl. the nested encoder config) for embedding in
        checkpoints as the '_pi3_config_json' leaf — mirrors MoGe's
        '_config_json' self-description so non-default model sizes load
        through the CLIs without a side-channel config."""
        import dataclasses as _dc
        import json as _json

        return _json.dumps(_dc.asdict(self))

    @staticmethod
    def from_json(s: str) -> "Pi3Config":
        import json as _json

        d = _json.loads(s)
        enc = d.pop("encoder")
        return Pi3Config(encoder=DinoV2Config(**enc), **d)


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
            kv_groups=(N, hw_full, cfg.global_kv_merge),
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


def _np_rng(key):
    import numpy as np

    return np.random.default_rng(_key_seed(key))


def _init_block_stack(key, L, dim, mlp_ratio, qk_norm, layerscale_init, dtype, num_heads=16):
    """Host-side (numpy) random block-stack init. Values only matter for
    tests; real weights come from the checkpoint converter. Pure numpy because
    per-array device dispatches cost seconds each through the axon tunnel."""
    import numpy as np

    hidden = dim * mlp_ratio
    rng = _np_rng(key)

    def trunc(shape, std=0.02):
        # uniform with matching std: one float32 pass, ~5x faster than
        # gaussian+clip+cast for the ~1B-element full-size tree
        return (rng.random(shape, dtype=np.float32) - 0.5) * (std * 3.4641016)

    blocks = {
        "norm1_scale": np.ones((L, dim), np.float32),
        "norm1_bias": np.zeros((L, dim), np.float32),
        "qkv_kernel": trunc((L, dim, 3 * dim)),
        "qkv_bias": np.zeros((L, 3 * dim), np.float32),
        "proj_kernel": trunc((L, dim, dim)),
        "proj_bias": np.zeros((L, dim), np.float32),
        "norm2_scale": np.ones((L, dim), np.float32),
        "norm2_bias": np.zeros((L, dim), np.float32),
        "fc1_kernel": trunc((L, dim, hidden)),
        "fc1_bias": np.zeros((L, hidden), np.float32),
        "fc2_kernel": trunc((L, hidden, dim)),
        "fc2_bias": np.zeros((L, dim), np.float32),
    }
    if qk_norm:
        hd = dim // num_heads  # per-head LayerNorm over head_dim
        blocks["q_norm_scale"] = np.ones((L, hd), np.float32)
        blocks["k_norm_scale"] = np.ones((L, hd), np.float32)
        blocks["q_norm_bias"] = np.zeros((L, hd), np.float32)
        blocks["k_norm_bias"] = np.zeros((L, hd), np.float32)
    if layerscale_init is not None:
        blocks["ls1"] = np.full((L, dim), layerscale_init, np.float32)
        blocks["ls2"] = np.full((L, dim), layerscale_init, np.float32)
    return blocks


def _init_head_decoder(key, in_dim, dim, out_dim, depth, mlp_ratio, dtype):
    import numpy as np

    rng = _np_rng(key)

    def trunc(shape, std=0.02):
        # uniform with matching std: one float32 pass, ~5x faster than
        # gaussian+clip+cast for the ~1B-element full-size tree
        return (rng.random(shape, dtype=np.float32) - 0.5) * (std * 3.4641016)

    return {
        "project_kernel": trunc((in_dim, dim)),
        "project_bias": np.zeros((dim,), np.float32),
        "blocks": _init_block_stack(_key_seed(key) + 1, depth, dim, mlp_ratio, False, None, dtype),
        "out_kernel": trunc((dim, out_dim)),
        "out_bias": np.zeros((out_dim,), np.float32),
    }


def init_pi3_params(key, cfg: Pi3Config = Pi3Config(), dtype=jnp.float32) -> Dict[str, Any]:
    """Random-initialized parameter pytree, generated entirely on host
    (numpy float32 leaves; jit ingests them directly). Real use converts the
    HF yyfz233/Pi3 checkpoint via models/convert.py."""
    import numpy as np

    C = cfg.dec_embed_dim
    base = _key_seed(key)
    keys = [base * 31 + i for i in range(10)]

    dec_pairs = cfg.dec_depth // 2
    even = _init_block_stack(keys[0], dec_pairs, C, cfg.mlp_ratio, True, 0.01, dtype, cfg.dec_num_heads)
    odd = _init_block_stack(keys[1], dec_pairs, C, cfg.mlp_ratio, True, 0.01, dtype, cfg.dec_num_heads)

    def camera_head(seed):
        rng = np.random.default_rng(seed)

        def trunc(shape, std=0.02):
            return np.clip(rng.standard_normal(shape), -2, 2).astype(np.float32) * std

        d = cfg.camera_dim
        out = {}
        for i in range(2):
            out[f"res_conv{i}"] = {
                "fc1_kernel": trunc((d, d)),
                "fc1_bias": np.zeros((d,), np.float32),
                "fc2_kernel": trunc((d, d)),
                "fc2_bias": np.zeros((d,), np.float32),
                "fc3_kernel": trunc((d, d)),
                "fc3_bias": np.zeros((d,), np.float32),
            }
        out.update(
            mlp1_kernel=trunc((d, d)),
            mlp1_bias=np.zeros((d,), np.float32),
            mlp2_kernel=trunc((d, d)),
            mlp2_bias=np.zeros((d,), np.float32),
            fc_t_kernel=trunc((d, 3)),
            fc_t_bias=np.zeros((3,), np.float32),
            fc_rot_kernel=trunc((d, 9)),
            fc_rot_bias=np.zeros((9,), np.float32),
        )
        return out

    rng = np.random.default_rng(keys[3])

    def trunc(shape, std=0.02):
        # uniform with matching std: one float32 pass, ~5x faster than
        # gaussian+clip+cast for the ~1B-element full-size tree
        return (rng.random(shape, dtype=np.float32) - 0.5) * (std * 3.4641016)

    psz = cfg.patch_size
    return {
        "encoder": init_dinov2_params(keys[2], cfg.encoder, dtype),
        "decoder": {
            "register_token": trunc((cfg.num_register_tokens, C), std=1e-6),
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
            "kernel": trunc((cfg.head_dim, 3 * psz * psz)),
            "bias": np.zeros((3 * psz * psz,), np.float32),
        },
        "conf_head": {
            "kernel": trunc((cfg.head_dim, psz * psz)),
            "bias": np.zeros((psz * psz,), np.float32),
        },
        "camera_head": camera_head(keys[7]),
    }
