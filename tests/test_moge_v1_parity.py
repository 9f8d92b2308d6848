"""MoGe v1 parity vs the reference torch implementation (random weights
through the converter, like test_moge_parity for v2)."""

import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

from pi3_slam_tpu.models.convert import convert_moge_v1_state_dict
from pi3_slam_tpu.models.moge_v1 import (
    MoGeV1Config,
    moge_v1_forward,
    moge_v1_infer,
)

pytestmark = pytest.mark.slow  # torch-oracle parity: minutes per test


REFERENCE_PATH = "/root/reference"

MODEL_CONFIG = {
    "encoder": "dinov2_vits14",
    "intermediate_layers": 4,
    "dim_proj": 64,
    "dim_upsample": [64, 32, 32],
    "dim_times_res_block_hidden": 1,
    "num_res_blocks": 1,
    "remap_output": "exp",
    "res_block_norm": "group_norm",
    "num_tokens_range": [1200, 2500],
    "last_res_blocks": 0,
    "last_conv_channels": 32,
    "last_conv_size": 1,
}


@pytest.fixture(scope="module")
def reference_v1():
    import torch

    # v1.py imports utils3d + huggingface_hub at module scope; only infer
    # paths we re-implement ourselves use them — stub both.
    for mod in ("utils3d",):
        if mod not in sys.modules:
            stub = types.ModuleType(mod)
            stub.torch = types.SimpleNamespace()
            stub.numpy = types.SimpleNamespace()
            sys.modules[mod] = stub

    sys.path.insert(0, REFERENCE_PATH)
    try:
        from moge.model.v1 import MoGeModel as TorchMoGeV1
    finally:
        sys.path.remove(REFERENCE_PATH)

    torch.manual_seed(0)
    model = TorchMoGeV1(**MODEL_CONFIG)
    model.eval()
    image = torch.rand(1, 3, 126, 168, generator=torch.Generator().manual_seed(1))
    num_tokens = 81
    with torch.no_grad():
        out = model.forward(image, num_tokens=num_tokens)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return {
        "state_dict": sd,
        "image": image.numpy(),
        "num_tokens": num_tokens,
        "out": {k: v.numpy() for k, v in out.items()},
    }


def test_moge_v1_forward_parity(reference_v1):
    params = convert_moge_v1_state_dict(reference_v1["state_dict"], MODEL_CONFIG)
    cfg = MoGeV1Config.from_model_config(MODEL_CONFIG)
    out = moge_v1_forward(
        params, jnp.asarray(reference_v1["image"]), cfg, reference_v1["num_tokens"]
    )
    ref = reference_v1["out"]
    np.testing.assert_allclose(np.asarray(out["mask"]), ref["mask"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["points"]), ref["points"], atol=5e-3)


def test_moge_v1_infer_contract(reference_v1, tmp_path):
    from pi3_slam_tpu.models.convert import load_params_npz, save_params_npz

    params = convert_moge_v1_state_dict(reference_v1["state_dict"], MODEL_CONFIG)
    path = str(tmp_path / "moge_v1.npz")
    save_params_npz(path, params)
    back = load_params_npz(path)

    import json

    cfg = MoGeV1Config.from_model_config(json.loads(str(back.pop("_v1_config_json"))))
    assert cfg.backbone == "dinov2_vits14" and cfg.remap_output == "exp"

    out = moge_v1_infer(back, jnp.asarray(reference_v1["image"][0]), cfg, num_tokens=81)
    assert out["points"].shape == (126, 168, 3)
    assert out["depth"].shape == (126, 168)
    assert out["intrinsics"].shape == (3, 3)
    d = np.asarray(out["depth"])
    finite = np.isfinite(d)
    if finite.any():
        assert (d[finite] > 0).all()
    K = np.asarray(out["intrinsics"])
    assert K[0, 2] == pytest.approx(0.5) and K[1, 2] == pytest.approx(0.5)
