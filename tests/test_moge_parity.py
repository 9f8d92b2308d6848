"""MoGe-2 parity vs the reference torch implementation (random weights
through the converter, like test_pi3_parity)."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pi3_slam_tpu.models.convert import (
    convert_moge_state_dict,
    moge_config_from_model_config,
    save_params_npz,
    load_params_npz,
)
from pi3_slam_tpu.models.moge_model import MoGeConfig, moge_forward, moge_infer_depth

pytestmark = pytest.mark.slow  # torch-oracle parity: minutes per test


REFERENCE_PATH = "/root/reference"

MODEL_CONFIG = {
    "encoder": {"backbone": "dinov2_vits14", "intermediate_layers": 4, "dim_out": 64},
    "neck": {
        "dim_in": [66, 2, 2, 2, 2],
        "dim_res_blocks": [64, 64, 32, 32, 32],
        "dim_out": [None, None, None, None, None],
        "resamplers": ["pixel_shuffle", "pixel_shuffle", "pixel_shuffle", "pixel_shuffle"],
        "num_res_blocks": 1,
        "res_block_in_norm": "layer_norm",
        "res_block_hidden_norm": "group_norm",
    },
    "points_head": {
        "dim_in": [64, 64, 32, 32, 32],
        "dim_res_blocks": [64, 32, 32, 32, 32],
        "dim_out": [None, None, None, None, 3],
        "resamplers": ["pixel_shuffle", "pixel_shuffle", "pixel_shuffle", "pixel_shuffle"],
        "num_res_blocks": 1,
        "res_block_in_norm": "layer_norm",
        "res_block_hidden_norm": "group_norm",
    },
    "mask_head": {
        "dim_in": [64, 64, 32, 32, 32],
        "dim_res_blocks": [32, 32, 32, 32, 32],
        "dim_out": [None, None, None, None, 1],
        "resamplers": ["pixel_shuffle", "pixel_shuffle", "pixel_shuffle", "pixel_shuffle"],
        "num_res_blocks": 1,
        "res_block_in_norm": "layer_norm",
        "res_block_hidden_norm": "group_norm",
    },
    "scale_head": {"dims": [384, 64, 1]},
    "remap_output": "linear",
    "num_tokens_range": [1200, 3600],
}


@pytest.fixture(scope="module")
def reference_moge():
    import torch

    # v2.py imports utils3d at module scope (not installed here; only used by
    # infer paths we don't exercise) — stub it.
    if "utils3d" not in sys.modules:
        stub = types.ModuleType("utils3d")
        stub.torch = types.SimpleNamespace()
        stub.numpy = types.SimpleNamespace()
        sys.modules["utils3d"] = stub

    sys.path.insert(0, REFERENCE_PATH)
    try:
        from moge.model.v2 import MoGeModel as TorchMoGe
    finally:
        sys.path.remove(REFERENCE_PATH)

    torch.manual_seed(0)
    model = TorchMoGe(**{k: v for k, v in MODEL_CONFIG.items()})
    model.eval()
    image = torch.rand(1, 3, 140, 140, generator=torch.Generator().manual_seed(1))
    num_tokens = 100
    with torch.no_grad():
        out = model.forward(image, num_tokens=num_tokens)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return {
        "state_dict": sd,
        "image": image.numpy(),
        "num_tokens": num_tokens,
        "out": {k: v.numpy() for k, v in out.items()},
    }


def test_moge_forward_parity(reference_moge):
    params = convert_moge_state_dict(reference_moge["state_dict"], MODEL_CONFIG)
    cfg = MoGeConfig.from_params(params)
    out = moge_forward(
        params, jnp.asarray(reference_moge["image"]), cfg, reference_moge["num_tokens"]
    )
    ref = reference_moge["out"]
    np.testing.assert_allclose(
        np.asarray(out["metric_scale"]), ref["metric_scale"], rtol=1e-3, err_msg="metric_scale"
    )
    np.testing.assert_allclose(np.asarray(out["mask"]), ref["mask"], atol=2e-3, err_msg="mask")
    np.testing.assert_allclose(
        np.asarray(out["points"]), ref["points"], atol=5e-3, err_msg="points"
    )


def test_moge_npz_roundtrip_and_infer(tmp_path, reference_moge):
    params = convert_moge_state_dict(reference_moge["state_dict"], MODEL_CONFIG)
    path = str(tmp_path / "moge.npz")
    save_params_npz(path, params)
    back = load_params_npz(path)
    cfg = MoGeConfig.from_params(back)
    assert cfg.backbone == "dinov2_vits14"
    assert back["neck"]["input_blocks"][0] is not None

    depth = np.asarray(
        moge_infer_depth(back, jnp.asarray(reference_moge["image"][0]), cfg, num_tokens=100)
    )
    assert depth.shape == (140, 140)
    finite = np.isfinite(depth)
    # random weights: just require a coherent depth map (some valid pixels, positive)
    if finite.any():
        assert (depth[finite] > 0).all()


def test_moge_runner_via_pipeline_interface(tmp_path, reference_moge):
    from pi3_slam_tpu.models.moge import MoGeRunner

    params = convert_moge_state_dict(reference_moge["state_dict"], MODEL_CONFIG)
    path = str(tmp_path / "moge.npz")
    save_params_npz(path, params)
    runner = MoGeRunner(path)
    depth = runner.infer_depth(reference_moge["image"][0])
    assert depth.shape == (140, 140)

    with pytest.raises(FileNotFoundError):
        MoGeRunner(None)


def test_moge_batched_dp_matches_single(tmp_path, reference_moge):
    """The dp-sharded batch path (shard_map at the top: replicated params,
    batch over dp, zero collectives) must match per-image inference."""
    from pi3_slam_tpu.models.moge import MoGeRunner
    from pi3_slam_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    params = convert_moge_state_dict(reference_moge["state_dict"], MODEL_CONFIG)
    path = str(tmp_path / "moge.npz")
    save_params_npz(path, params)
    runner = MoGeRunner(path)

    rng = np.random.default_rng(4)
    imgs = rng.uniform(size=(4, 3, 140, 140)).astype(np.float32)
    single = np.stack([runner.infer_depth(im) for im in imgs])

    runner.shard_params(make_mesh(2, 1))
    batched = np.asarray(runner.infer_depth_batch_async(imgs))
    assert batched.shape == single.shape
    np.testing.assert_allclose(batched, single, atol=1e-4)
