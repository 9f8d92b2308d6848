"""tools/convert_checkpoint.py CLI flow on a local MoGe model.pt."""

import os
import sys

import numpy as np
import pytest


def test_pi3_checkpoint_self_description(tmp_path):
    """save_pi3_checkpoint embeds the Pi3Config; load_pi3_checkpoint returns
    it, and the CLIs size the model from the checkpoint alone (no side-channel
    config) — so non-default model sizes run through the stock entry points."""
    from test_pi3_model import TINY, make_tiny_params

    from pi3_slam_tpu.models import Pi3Config
    from pi3_slam_tpu.models.convert import load_pi3_checkpoint, save_pi3_checkpoint

    assert Pi3Config.from_json(TINY.to_json()) == TINY  # round-trip

    path = str(tmp_path / "pi3_tiny.npz")
    save_pi3_checkpoint(path, make_tiny_params(), TINY)
    params, cfg = load_pi3_checkpoint(path)
    assert cfg == TINY
    assert "_pi3_config_json" not in params  # weights-only tree for jit

    from pi3_slam_tpu.slam import Pi3SLAMOnline, OnlineConfig

    slam = Pi3SLAMOnline(
        OnlineConfig(
            checkpoint_path=path, use_metric_depth=False,
            compute_dtype="float32", output_dir=str(tmp_path / "o"),
        )
    )
    assert slam.pi3_config == TINY


def test_check_pi3_config_catches_mismatch():
    """check_pi3_config validates every shape-derivable field, so the convert
    tool can never stamp a checkpoint with a config that lies about its
    weights (the CLIs trust the embedded self-description)."""
    import dataclasses

    from test_pi3_model import TINY, make_tiny_params

    from pi3_slam_tpu.models.convert import check_pi3_config

    params = make_tiny_params()
    check_pi3_config(params, TINY)  # matching config passes

    from pi3_slam_tpu.models import Pi3Config

    with pytest.raises(ValueError, match="embed_dim"):
        check_pi3_config(params, Pi3Config())  # full-size default vs tiny tree
    for field, wrong in [
        ("dec_depth", TINY.dec_depth + 2),
        ("head_dim", TINY.head_dim * 2),
        ("camera_dim", TINY.camera_dim * 2),
        ("num_register_tokens", TINY.num_register_tokens + 1),
    ]:
        bad = dataclasses.replace(TINY, **{field: wrong})
        with pytest.raises(ValueError, match=field):
            check_pi3_config(params, bad)
    with pytest.raises(ValueError, match="encoder.depth"):
        check_pi3_config(
            params,
            dataclasses.replace(
                TINY, encoder=dataclasses.replace(TINY.encoder, depth=3)
            ),
        )


def test_convert_tool_moge_local_file(tmp_path, reference_moge_checkpoint):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))
    import convert_checkpoint

    out = str(tmp_path / "moge.npz")
    rc = convert_checkpoint.main(
        ["--model", "moge", "--input", reference_moge_checkpoint, "--output", out]
    )
    assert rc == 0
    from pi3_slam_tpu.models.convert import load_params_npz
    from pi3_slam_tpu.models.moge_model import MoGeConfig

    params = load_params_npz(out)
    cfg = MoGeConfig.from_params(params)
    assert cfg.backbone == "dinov2_vits14"


@pytest.fixture(scope="module")
def reference_moge_checkpoint(tmp_path_factory):
    """Write a reference-format MoGe model.pt (model + model_config)."""
    import types

    import torch

    from test_moge_parity import MODEL_CONFIG, REFERENCE_PATH

    if "utils3d" not in sys.modules:
        stub = types.ModuleType("utils3d")
        stub.torch = types.SimpleNamespace()
        sys.modules["utils3d"] = stub
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from moge.model.v2 import MoGeModel as TorchMoGe
    finally:
        sys.path.remove(REFERENCE_PATH)
    torch.manual_seed(0)
    m = TorchMoGe(**MODEL_CONFIG)
    path = str(tmp_path_factory.mktemp("ckpt") / "model.pt")
    torch.save({"model": m.state_dict(), "model_config": MODEL_CONFIG}, path)
    return path
