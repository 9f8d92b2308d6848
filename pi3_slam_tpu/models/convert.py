"""Torch checkpoint -> JAX parameter-pytree conversion for Pi3.

Maps the reference Pi3 state_dict (HF hub ``yyfz233/Pi3`` — the module tree
defined in pi3/models/pi3.py) onto the stacked functional layout used by
pi3_slam_tpu.models.pi3. All Linear weights (out, in) transpose to (in, out)
kernels; Conv2d patch-embed weights flatten (C_out, C_in, kh, kw) ->
(C_in*kh*kw, C_out) matching models.dinov2.patchify's token feature order.

The converter is pure numpy (no torch import needed when fed a dict of
arrays), so it runs in TPU-only environments. Use tools/convert_checkpoint.py
to go from a downloaded .safetensors/.pt file to an .npz the runtime loads.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> (in, out) kernel."""
    return np.ascontiguousarray(np.asarray(w).T)


def _stack_block_params(
    get: Callable[[str], np.ndarray],
    prefixes: list[str],
    qk_norm: bool,
    layerscale: bool,
) -> Dict[str, np.ndarray]:
    """Stack per-block torch params along a leading scan axis."""
    out: Dict[str, list] = {}

    def put(name, arrs):
        out[name] = np.stack(arrs, axis=0)

    put("norm1_scale", [get(f"{p}.norm1.weight") for p in prefixes])
    put("norm1_bias", [get(f"{p}.norm1.bias") for p in prefixes])
    put("qkv_kernel", [_t(get(f"{p}.attn.qkv.weight")) for p in prefixes])
    put("qkv_bias", [get(f"{p}.attn.qkv.bias") for p in prefixes])
    put("proj_kernel", [_t(get(f"{p}.attn.proj.weight")) for p in prefixes])
    put("proj_bias", [get(f"{p}.attn.proj.bias") for p in prefixes])
    put("norm2_scale", [get(f"{p}.norm2.weight") for p in prefixes])
    put("norm2_bias", [get(f"{p}.norm2.bias") for p in prefixes])
    put("fc1_kernel", [_t(get(f"{p}.mlp.fc1.weight")) for p in prefixes])
    put("fc1_bias", [get(f"{p}.mlp.fc1.bias") for p in prefixes])
    put("fc2_kernel", [_t(get(f"{p}.mlp.fc2.weight")) for p in prefixes])
    put("fc2_bias", [get(f"{p}.mlp.fc2.bias") for p in prefixes])
    if qk_norm:
        put("q_norm_scale", [get(f"{p}.attn.q_norm.weight") for p in prefixes])
        put("q_norm_bias", [get(f"{p}.attn.q_norm.bias") for p in prefixes])
        put("k_norm_scale", [get(f"{p}.attn.k_norm.weight") for p in prefixes])
        put("k_norm_bias", [get(f"{p}.attn.k_norm.bias") for p in prefixes])
    if layerscale:
        put("ls1", [get(f"{p}.ls1.gamma") for p in prefixes])
        put("ls2", [get(f"{p}.ls2.gamma") for p in prefixes])
    return out


def convert_dinov2(sd: Mapping[str, Any], prefix: str, depth: int) -> Dict[str, Any]:
    """Convert an encoder subtree (DinoVisionTransformer with block_chunks=0)."""

    def get(name):
        return np.asarray(sd[f"{prefix}{name}"])

    conv_w = get("patch_embed.proj.weight")  # (C, 3, p, p)
    C = conv_w.shape[0]
    params = {
        "patch_embed_kernel": np.ascontiguousarray(conv_w.reshape(C, -1).T),
        "patch_embed_bias": get("patch_embed.proj.bias"),
        "cls_token": get("cls_token").reshape(1, C),
        "pos_embed": get("pos_embed").reshape(-1, C),
        "register_tokens": get("register_tokens").reshape(-1, C),
        "blocks": _stack_block_params(
            get, [f"blocks.{i}" for i in range(depth)], qk_norm=False, layerscale=True
        ),
        "norm_scale": get("norm.weight"),
        "norm_bias": get("norm.bias"),
    }
    return params


def _convert_head_decoder(sd: Mapping[str, Any], prefix: str, depth: int = 5) -> Dict[str, Any]:
    def get(name):
        return np.asarray(sd[f"{prefix}{name}"])

    return {
        "project_kernel": _t(get("projects.weight")),
        "project_bias": get("projects.bias"),
        "blocks": _stack_block_params(
            get, [f"blocks.{i}" for i in range(depth)], qk_norm=False, layerscale=False
        ),
        "out_kernel": _t(get("linear_out.weight")),
        "out_bias": get("linear_out.bias"),
    }


def _convert_camera_head(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    def get(name):
        return np.asarray(sd[f"{prefix}{name}"])

    out: Dict[str, Any] = {}
    for i in range(2):
        out[f"res_conv{i}"] = {
            "fc1_kernel": _t(get(f"res_conv.{i}.res_conv1.weight")),
            "fc1_bias": get(f"res_conv.{i}.res_conv1.bias"),
            "fc2_kernel": _t(get(f"res_conv.{i}.res_conv2.weight")),
            "fc2_bias": get(f"res_conv.{i}.res_conv2.bias"),
            "fc3_kernel": _t(get(f"res_conv.{i}.res_conv3.weight")),
            "fc3_bias": get(f"res_conv.{i}.res_conv3.bias"),
        }
    out.update(
        mlp1_kernel=_t(get("more_mlps.0.weight")),
        mlp1_bias=get("more_mlps.0.bias"),
        mlp2_kernel=_t(get("more_mlps.2.weight")),
        mlp2_bias=get("more_mlps.2.bias"),
        fc_t_kernel=_t(get("fc_t.weight")),
        fc_t_bias=get("fc_t.bias"),
        fc_rot_kernel=_t(get("fc_rot.weight")),
        fc_rot_bias=get("fc_rot.bias"),
    )
    return out


def convert_pi3_state_dict(
    sd: Mapping[str, Any],
    encoder_depth: int = 24,
    dec_depth: int = 36,
) -> Dict[str, Any]:
    """Full Pi3 state_dict (numpy-valued mapping) -> functional param pytree.

    Accepts torch tensors or numpy arrays as values.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def get(name):
        return sd[name]

    even = _stack_block_params(
        get, [f"decoder.{i}" for i in range(0, dec_depth, 2)], qk_norm=True, layerscale=True
    )
    odd = _stack_block_params(
        get, [f"decoder.{i}" for i in range(1, dec_depth, 2)], qk_norm=True, layerscale=True
    )
    C = even["qkv_kernel"].shape[1]
    return {
        "encoder": convert_dinov2(sd, "encoder.", encoder_depth),
        "decoder": {
            "register_token": get("register_token").reshape(-1, C),
            "even_blocks": even,
            "odd_blocks": odd,
        },
        "point_decoder": _convert_head_decoder(sd, "point_decoder."),
        "conf_decoder": _convert_head_decoder(sd, "conf_decoder."),
        "camera_decoder": _convert_head_decoder(sd, "camera_decoder."),
        "point_head": {
            "kernel": _t(get("point_head.proj.weight")),
            "bias": get("point_head.proj.bias"),
        },
        "conf_head": {
            "kernel": _t(get("conf_head.proj.weight")),
            "bias": get("conf_head.proj.bias"),
        },
        "camera_head": _convert_camera_head(sd, "camera_head."),
    }


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    """Flatten a param pytree to an .npz with '/'-joined keys."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict[str, Any]:
    """Inverse of save_params_npz."""
    flat = np.load(path)
    out: Dict[str, Any] = {}
    for key in flat.files:
        parts = key.split("/")
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = flat[key]
    return out
