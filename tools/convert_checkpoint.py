#!/usr/bin/env python
"""Convert reference torch checkpoints to pi3_slam_tpu .npz parameter files.

Usage (on a machine with network/checkpoint access):

  # Pi3 (HF hub yyfz233/Pi3 or a local safetensors/.pt file)
  python tools/convert_checkpoint.py --model pi3 --input yyfz233/Pi3 --output pi3.npz
  python tools/convert_checkpoint.py --model pi3 --input model.safetensors --output pi3.npz

  # MoGe-2 (HF hub Ruicheng/moge-2-vits-normal or a local model.pt)
  python tools/convert_checkpoint.py --model moge --input Ruicheng/moge-2-vits-normal --output moge.npz

  # ALIKED keypoint extractor (lightglue model zoo .pth, e.g. aliked-n16)
  python tools/convert_checkpoint.py --model aliked --input aliked-n16.pth --output aliked.npz

The .npz then feeds --model-path / --moge-path of the pipeline CLIs. Only
numpy + safetensors/torch are needed for local files; HF hub ids additionally
need huggingface_hub + network access.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_torch_file(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path), None
    import torch

    data = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(data, dict) and "model" in data and "model_config" in data:
        sd = {k: v.numpy() for k, v in data["model"].items()}
        return sd, data["model_config"]
    sd = data.get("state_dict", data) if isinstance(data, dict) else data
    return {k: v.numpy() for k, v in sd.items()}, None


def _resolve(path_or_repo: str, model: str) -> str:
    if os.path.exists(path_or_repo):
        return path_or_repo
    from huggingface_hub import hf_hub_download

    filename = "model.safetensors" if model == "pi3" else "model.pt"
    return hf_hub_download(repo_id=path_or_repo, filename=filename)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=["pi3", "moge", "aliked"], required=True)
    parser.add_argument("--aliked-name", default="aliked-n16",
                        help="ALIKED variant (aliked-t16/n16/n16rot/n32)")
    parser.add_argument("--input", required=True, help="Local checkpoint file or HF repo id")
    parser.add_argument("--output", required=True, help="Output .npz path")
    parser.add_argument(
        "--pi3-config", default=None, metavar="JSON_PATH",
        help="Pi3Config JSON file describing a non-default Pi3 variant "
        "(Pi3Config.to_json format); the embedded self-description is "
        "validated against the converted weights either way",
    )
    args = parser.parse_args(argv)

    from pi3_slam_tpu.models.convert import (
        convert_pi3_state_dict,
        convert_moge_state_dict,
        convert_aliked_state_dict,
        save_params_npz,
    )

    path = _resolve(args.input, args.model)
    sd, model_config = _load_torch_file(path)
    print(f"loaded {len(sd)} tensors from {path}")

    if args.model == "pi3":
        params = convert_pi3_state_dict(sd)
    elif args.model == "aliked":
        params = convert_aliked_state_dict(sd, model_name=args.aliked_name)
    else:
        if model_config is None:
            raise SystemExit("MoGe checkpoint must carry model_config (expected model.pt format)")
        if isinstance(model_config.get("encoder"), str):
            # v1 checkpoints carry a flat encoder name; v2 an encoder dict
            from pi3_slam_tpu.models.convert import convert_moge_v1_state_dict

            params = convert_moge_v1_state_dict(sd, model_config)
            print("detected MoGe v1 checkpoint layout")
        else:
            params = convert_moge_state_dict(sd, model_config)

    if args.model == "pi3":
        # embed the model config so the CLIs can size the model from the
        # checkpoint alone (models/convert.load_pi3_checkpoint)
        from pi3_slam_tpu.models import Pi3Config
        from pi3_slam_tpu.models.convert import check_pi3_config, save_pi3_checkpoint

        # the embedded config must describe THESE weights: a non-default Pi3
        # variant silently stamped with the default config would crash the
        # CLIs at load with no hint the self-description is wrong
        if args.pi3_config is not None:
            with open(args.pi3_config) as f:
                config = Pi3Config.from_json(f.read())
        else:
            config = Pi3Config()
        check_pi3_config(params, config)
        save_pi3_checkpoint(args.output, params, config)
    else:
        save_params_npz(args.output, params)
    n = sum(
        int(np.asarray(a).size)
        for a in _iter_arrays(params)
    )
    print(f"wrote {args.output} ({n/1e6:.1f}M params)")
    return 0


def _iter_arrays(node):
    if isinstance(node, dict):
        for v in node.values():
            yield from _iter_arrays(v)
    elif isinstance(node, (list, tuple)):
        for v in node:
            yield from _iter_arrays(v)
    elif node is not None and not isinstance(node, str):
        arr = np.asarray(node)
        if arr.dtype.kind in "fiu":
            yield arr


if __name__ == "__main__":
    sys.exit(main())
