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
    has_registers = f"{prefix}register_tokens" in sd
    params = {
        "patch_embed_kernel": np.ascontiguousarray(conv_w.reshape(C, -1).T),
        "patch_embed_bias": get("patch_embed.proj.bias"),
        "cls_token": get("cls_token").reshape(1, C),
        "pos_embed": get("pos_embed").reshape(-1, C),
        # plain (non-reg) dinov2 backbones have no register tokens
        "register_tokens": (
            get("register_tokens").reshape(-1, C) if has_registers else np.zeros((0, C), np.float32)
        ),
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


def load_pi3_checkpoint(path: str):
    """Load a Pi3 .npz checkpoint -> (params, Pi3Config | None).

    Pops the optional '_pi3_config_json' self-description leaf (written by
    convert_pi3_state_dict / save_pi3_checkpoint) so the param tree handed to
    pi3_forward carries only weights."""
    from .pi3 import Pi3Config

    params = load_params_npz(path)
    cfg_json = params.pop("_pi3_config_json", None)
    cfg = Pi3Config.from_json(str(cfg_json)) if cfg_json is not None else None
    return params, cfg


def check_pi3_config(params: Dict[str, Any], config) -> None:
    """Validate every shape-derivable Pi3Config field against a converted
    param tree; raise ValueError naming the first mismatch.

    Guards the checkpoint self-description (save_pi3_checkpoint embeds the
    config as '_pi3_config_json'): converting a non-default Pi3 variant with
    a default config would otherwise produce a checkpoint whose embedded
    config lies about its weights, and the CLIs that trust it would crash
    deep inside pi3_forward. Head *counts* are not derivable from weight
    shapes and are not checked.
    """
    enc = params["encoder"]
    even = params["decoder"]["even_blocks"]
    odd = params["decoder"]["odd_blocks"]
    pd = params["point_decoder"]
    derived = {
        "encoder.patch_size": int(
            round((enc["patch_embed_kernel"].shape[0] // 3) ** 0.5)
        ),
        "encoder.embed_dim": int(enc["patch_embed_kernel"].shape[1]),
        "encoder.depth": int(enc["blocks"]["qkv_kernel"].shape[0]),
        "encoder.mlp_ratio": int(
            enc["blocks"]["fc1_kernel"].shape[-1] // enc["blocks"]["fc1_kernel"].shape[-2]
        ),
        "encoder.num_register_tokens": int(enc["register_tokens"].shape[0]),
        "dec_embed_dim": int(even["qkv_kernel"].shape[1]),
        "dec_depth": int(even["qkv_kernel"].shape[0] + odd["qkv_kernel"].shape[0]),
        "mlp_ratio": int(even["fc1_kernel"].shape[-1] // even["fc1_kernel"].shape[-2]),
        "num_register_tokens": int(params["decoder"]["register_token"].shape[0]),
        "head_dim": int(pd["project_kernel"].shape[-1]),
        "head_depth": int(pd["blocks"]["qkv_kernel"].shape[0]),
        "camera_dim": int(params["camera_head"]["res_conv0"]["fc1_kernel"].shape[0]),
    }
    expected = {
        "encoder.patch_size": config.encoder.patch_size,
        "encoder.embed_dim": config.encoder.embed_dim,
        "encoder.depth": config.encoder.depth,
        "encoder.mlp_ratio": config.encoder.mlp_ratio,
        "encoder.num_register_tokens": config.encoder.num_register_tokens,
        "dec_embed_dim": config.dec_embed_dim,
        "dec_depth": config.dec_depth,
        "mlp_ratio": config.mlp_ratio,
        "num_register_tokens": config.num_register_tokens,
        "head_dim": config.head_dim,
        "head_depth": config.head_depth,
        "camera_dim": config.camera_dim,
    }
    for field, want in expected.items():
        got = derived[field]
        if got != want:
            raise ValueError(
                f"Pi3 checkpoint/config mismatch: weights imply {field}={got} "
                f"but the config says {want}. Pass the variant's config "
                f"(Pi3Config json) instead of the default."
            )


def save_pi3_checkpoint(path: str, params: Dict[str, Any], config) -> None:
    """Save Pi3 params with the config embedded (see load_pi3_checkpoint)."""
    flat = dict(params)
    flat["_pi3_config_json"] = np.asarray(config.to_json())
    save_params_npz(path, flat)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight (out, in, kh, kw) -> HWIO (kh, kw, in, out)."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def moge_config_from_model_config(model_config: Dict[str, Any]):
    """Checkpoint 'model_config' dict (moge/model/v2.py:91) -> MoGeConfig."""
    from .moge_model import ConvStackConfig, MoGeConfig

    def cs(d):
        if d is None:
            return None
        return ConvStackConfig(
            dim_in=tuple(d["dim_in"]),
            dim_res_blocks=tuple(d["dim_res_blocks"]),
            dim_out=tuple(d["dim_out"]) if isinstance(d["dim_out"], (list, tuple)) else (d["dim_out"],) * len(d["dim_res_blocks"]),
            resamplers=tuple(d["resamplers"]) if isinstance(d.get("resamplers", "pixel_shuffle"), (list, tuple)) else d.get("resamplers", "pixel_shuffle"),
            dim_times_res_block_hidden=d.get("dim_times_res_block_hidden", 1),
            num_res_blocks=d.get("num_res_blocks", 1),
            res_block_in_norm=d.get("res_block_in_norm", "layer_norm"),
            res_block_hidden_norm=d.get("res_block_hidden_norm", "group_norm"),
        )

    enc = model_config["encoder"]
    scale_head = model_config.get("scale_head")
    return MoGeConfig(
        backbone=enc["backbone"],
        intermediate_layers=enc["intermediate_layers"],
        encoder_dim_out=enc["dim_out"],
        neck=cs(model_config["neck"]),
        points_head=cs(model_config.get("points_head")),
        mask_head=cs(model_config.get("mask_head")),
        normal_head=cs(model_config.get("normal_head")),
        scale_head_dims=tuple(scale_head["dims"]) if scale_head else None,
        remap_output=model_config.get("remap_output", "linear"),
        num_tokens_range=tuple(model_config.get("num_tokens_range", (1200, 3600))),
    )


def _convert_conv_stack(sd: Mapping[str, Any], prefix: str, cfg) -> Dict[str, Any]:
    """ConvStack (moge/model/modules.py:195-254) -> params dict with
    input_blocks / res_blocks / resamplers / output_blocks lists."""
    n = len(cfg.dim_res_blocks)

    def maybe_conv(name):
        wkey = f"{prefix}{name}.weight"
        if wkey not in sd:
            return None
        return {"kernel": _conv(sd[wkey]), "bias": np.asarray(sd[f"{prefix}{name}.bias"])}

    input_blocks = [maybe_conv(f"input_blocks.{i}") for i in range(n)]
    output_blocks = [maybe_conv(f"output_blocks.{i}") for i in range(n)]

    res_blocks = []
    for i in range(n):
        level = []
        for j in range(cfg.num_blocks_at(i)):
            base = f"{prefix}res_blocks.{i}.{j}."
            blk: Dict[str, Any] = {
                "conv1_kernel": _conv(sd[base + "layers.2.weight"]),
                "conv1_bias": np.asarray(sd[base + "layers.2.bias"]),
                "conv2_kernel": _conv(sd[base + "layers.5.weight"]),
                "conv2_bias": np.asarray(sd[base + "layers.5.bias"]),
            }
            if base + "layers.0.weight" in sd:  # in-norm present (not 'none')
                blk["norm1_scale"] = np.asarray(sd[base + "layers.0.weight"])
                blk["norm1_bias"] = np.asarray(sd[base + "layers.0.bias"])
            if base + "layers.3.weight" in sd:
                blk["norm2_scale"] = np.asarray(sd[base + "layers.3.weight"])
                blk["norm2_bias"] = np.asarray(sd[base + "layers.3.bias"])
            if base + "skip_connection.weight" in sd:
                blk["skip_kernel"] = _conv(sd[base + "skip_connection.weight"])
                blk["skip_bias"] = np.asarray(sd[base + "skip_connection.bias"])
            level.append(blk)
        res_blocks.append(level)

    resamplers = []
    for i in range(n - 1):
        base = f"{prefix}resamplers.{i}."
        resamplers.append(
            {
                "conv1_kernel": _conv(sd[base + "0.weight"]),
                "conv1_bias": np.asarray(sd[base + "0.bias"]),
                "conv2_kernel": _conv(sd[base + "2.weight"]),
                "conv2_bias": np.asarray(sd[base + "2.bias"]),
            }
        )
    return {
        "input_blocks": input_blocks,
        "res_blocks": res_blocks,
        "resamplers": resamplers,
        "output_blocks": output_blocks,
    }


def convert_moge_state_dict(sd: Mapping[str, Any], model_config: Dict[str, Any]) -> Dict[str, Any]:
    """MoGe-2 torch checkpoint ('model' state dict + 'model_config') ->
    functional param pytree with the config embedded as _config_json."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    cfg = moge_config_from_model_config(model_config)
    enc_depth = cfg.encoder_cfg.depth

    n_proj = (
        cfg.intermediate_layers
        if isinstance(cfg.intermediate_layers, int)
        else len(cfg.intermediate_layers)
    )
    params: Dict[str, Any] = {
        "backbone": convert_dinov2(sd, "encoder.backbone.", enc_depth),
        "output_projections": [
            {
                "kernel": _conv(sd[f"encoder.output_projections.{i}.weight"]),
                "bias": np.asarray(sd[f"encoder.output_projections.{i}.bias"]),
            }
            for i in range(n_proj)
        ],
        "neck": _convert_conv_stack(sd, "neck.", cfg.neck),
        "_config_json": np.asarray(cfg.to_json()),
    }
    for head in ("points_head", "mask_head", "normal_head"):
        head_cfg = getattr(cfg, head)
        if head_cfg is not None:
            params[head] = _convert_conv_stack(sd, f"{head}.", head_cfg)
    if cfg.scale_head_dims is not None:
        mls = []
        i = 0
        while f"scale_head.{i}.weight" in sd:
            mls.append(
                {"kernel": _t(sd[f"scale_head.{i}.weight"]), "bias": np.asarray(sd[f"scale_head.{i}.bias"])}
            )
            i += 2  # Linear at even indices (ReLU between)
        params["scale_head"] = mls
    return params


def convert_moge_v1_state_dict(sd: Mapping[str, Any], model_config: Dict[str, Any]) -> Dict[str, Any]:
    """MoGe v1 torch state_dict (moge/model/v1.py) -> models/moge_v1.py tree."""
    import json as _json

    from .moge_v1 import MoGeV1Config

    cfg = MoGeV1Config.from_model_config(model_config)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def get(name):
        return sd[name]

    def conv(prefix):
        return {"kernel": _conv(get(f"{prefix}.weight")), "bias": get(f"{prefix}.bias")}

    def deconv2x2(prefix):
        # ConvTranspose2d weight (in, out, 2, 2) -> 1x1 conv to out*4 channels
        # ordered (out, dy, dx) for pixel_shuffle_nhwc
        w = get(f"{prefix}.weight")
        cin, cout = w.shape[0], w.shape[1]
        return {
            "kernel": np.ascontiguousarray(w.reshape(cin, cout * 4))[None, None],
            "bias": get(f"{prefix}.bias"),
        }

    def res_block(prefix):
        out = {
            "norm1_scale": get(f"{prefix}.layers.0.weight"),
            "norm1_bias": get(f"{prefix}.layers.0.bias"),
            "conv1_kernel": _conv(get(f"{prefix}.layers.2.weight")),
            "conv1_bias": get(f"{prefix}.layers.2.bias"),
            "norm2_scale": get(f"{prefix}.layers.3.weight"),
            "norm2_bias": get(f"{prefix}.layers.3.bias"),
            "conv2_kernel": _conv(get(f"{prefix}.layers.5.weight")),
            "conv2_bias": get(f"{prefix}.layers.5.bias"),
        }
        if f"{prefix}.skip_connection.weight" in sd:
            out["skip_kernel"] = _conv(get(f"{prefix}.skip_connection.weight"))
            out["skip_bias"] = get(f"{prefix}.skip_connection.bias")
        return out

    n_features = len(cfg.layer_indices)
    head: Dict[str, Any] = {
        "projects": [conv(f"head.projects.{i}") for i in range(n_features)],
        "upsample_blocks": [],
        "output_blocks": [],
    }
    for i in range(len(cfg.dim_upsample)):
        blk = {
            "deconv": deconv2x2(f"head.upsample_blocks.{i}.0.0"),
            "conv_kernel": _conv(get(f"head.upsample_blocks.{i}.0.1.weight")),
            "conv_bias": get(f"head.upsample_blocks.{i}.0.1.bias"),
            "res_blocks": [
                res_block(f"head.upsample_blocks.{i}.{1 + j}")
                for j in range(cfg.num_res_blocks)
            ],
        }
        head["upsample_blocks"].append(blk)
    for k in range(2):  # points (3ch), mask (1ch)
        lrb = cfg.last_res_blocks
        head["output_blocks"].append(
            {
                "conv_in_kernel": _conv(get(f"head.output_block.{k}.0.weight")),
                "conv_in_bias": get(f"head.output_block.{k}.0.bias"),
                "res_blocks": [
                    res_block(f"head.output_block.{k}.{1 + j}") for j in range(lrb)
                ],
                "conv_out_kernel": _conv(get(f"head.output_block.{k}.{lrb + 2}.weight")),
                "conv_out_bias": get(f"head.output_block.{k}.{lrb + 2}.bias"),
            }
        )

    return {
        "backbone": convert_dinov2(sd, "backbone.", cfg.encoder_cfg.depth),
        "head": head,
        "_v1_config_json": _json.dumps(
            {
                k: getattr(cfg, k)
                for k in MoGeV1Config.__dataclass_fields__
            }
        ),
    }


def convert_aliked_state_dict(sd: Mapping[str, Any], model_name: str = "aliked-n16") -> Dict[str, Any]:
    """lightglue/ALIKED torch state_dict -> pi3_slam_tpu.models.aliked tree.

    Maps by name from the lightglue ALIKED module layout (blockN.conv{1,2} +
    bn{1,2}, blockN.downsample, convN projections, score_head.{0,2,4,6},
    desc_head.offset_conv.{0,2}, desc_head.sf_conv, desc_head.agg_weights).
    Unmatched source keys are reported (raised) so a layout drift in the
    upstream checkpoint surfaces here instead of producing silent garbage.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    used = set()

    def get(name):
        used.add(name)
        return sd[name]

    def bn(prefix):
        return {
            "weight": get(f"{prefix}.weight"),
            "bias": get(f"{prefix}.bias"),
            "running_mean": get(f"{prefix}.running_mean"),
            "running_var": get(f"{prefix}.running_var"),
        }

    def conv_block(prefix):
        return {
            "conv1_kernel": _conv(get(f"{prefix}.conv1.weight")),
            "conv1_bn": bn(f"{prefix}.bn1"),
            "conv2_kernel": _conv(get(f"{prefix}.conv2.weight")),
            "conv2_bn": bn(f"{prefix}.bn2"),
        }

    def res_block(prefix):
        out = conv_block(prefix)
        out["downsample_kernel"] = _conv(get(f"{prefix}.downsample.weight"))
        bkey = f"{prefix}.downsample.bias"
        if bkey in sd:
            out["downsample_bias"] = get(bkey)
        return out

    params = {
        "block1": conv_block("block1"),
        "block2": res_block("block2"),
        "block3": res_block("block3"),
        "block4": res_block("block4"),
        "conv1_kernel": _conv(get("conv1.weight")),
        "conv2_kernel": _conv(get("conv2.weight")),
        "conv3_kernel": _conv(get("conv3.weight")),
        "conv4_kernel": _conv(get("conv4.weight")),
        "score_head": {
            "conv1_kernel": _conv(get("score_head.0.weight")),
            "conv2_kernel": _conv(get("score_head.2.weight")),
            "conv3_kernel": _conv(get("score_head.4.weight")),
            "conv4_kernel": _conv(get("score_head.6.weight")),
        },
        "offset_conv1_kernel": _conv(get("desc_head.offset_conv.0.weight")),
        "offset_conv1_bias": get("desc_head.offset_conv.0.bias"),
        "offset_conv2_kernel": _conv(get("desc_head.offset_conv.2.weight")),
        "offset_conv2_bias": get("desc_head.offset_conv.2.bias"),
        "sf_conv_kernel": _conv(get("desc_head.sf_conv.weight")),
        "agg_weights": get("desc_head.agg_weights"),
    }
    for i in range(1, 5):
        bkey = f"score_head.{2 * (i - 1)}.bias"
        if bkey in sd:
            params["score_head"][f"conv{i}_bias"] = get(bkey)

    unmatched = sorted(k for k in sd if k not in used and "num_batches_tracked" not in k)
    if unmatched:
        raise ValueError(
            f"ALIKED state_dict has {len(unmatched)} unmatched keys (layout "
            f"drift?): {unmatched[:10]}{'...' if len(unmatched) > 10 else ''}"
        )
    params["_model_name"] = model_name
    return params


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    """Flatten a param pytree (dicts, lists, arrays, None) to an .npz.

    Keys are '/'-joined; list elements use '#<i>' segments; None leaves are
    stored as '__none__' marker arrays so structure round-trips exactly.
    """
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}/#{i}")
        elif node is None:
            flat[f"{prefix}/__none__"] = np.int8(1)
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
        is_none = parts[-1] == "__none__"
        if is_none:
            parts = parts[:-1]
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = None if is_none else flat[key]

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.startswith("#") for k in node):
                items = sorted(node.items(), key=lambda kv: int(kv[0][1:]))
                return [listify(v) for _, v in items]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(out)
