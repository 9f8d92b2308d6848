"""End-to-end Pi3 parity vs the reference torch implementation.

Instantiates the reference model (read-only import from /root/reference) with
random weights, converts its state_dict through models/convert.py, and checks
our functional JAX forward reproduces the torch outputs. This validates the
architecture AND the checkpoint converter in one shot — the exact path real
pretrained weights take.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pi3_slam_tpu.models import Pi3Config, pi3_forward
from pi3_slam_tpu.models.convert import convert_pi3_state_dict, save_params_npz, load_params_npz

pytestmark = pytest.mark.slow  # torch-oracle parity: minutes per test


REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def reference_oracle():
    """Reference Pi3-large outputs on a tiny random input (torch CPU)."""
    import torch

    sys.path.insert(0, REFERENCE_PATH)
    try:
        from pi3.models.pi3 import Pi3 as TorchPi3
    finally:
        sys.path.remove(REFERENCE_PATH)

    torch.manual_seed(0)
    model = TorchPi3(decoder_size="large")
    model.eval()
    imgs = torch.rand(1, 2, 3, 56, 56, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        out = model(imgs)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return {
        "state_dict": sd,
        "imgs": imgs.numpy(),
        "out": {k: v.numpy() for k, v in out.items()},
    }


def test_pi3_forward_parity(reference_oracle):
    params = convert_pi3_state_dict(reference_oracle["state_dict"])
    imgs = jnp.asarray(reference_oracle["imgs"])
    ours = jax.jit(lambda p, x: pi3_forward(p, x, Pi3Config()))(params, imgs)
    ref = reference_oracle["out"]

    np.testing.assert_allclose(
        np.asarray(ours["conf"]), ref["conf"], atol=2e-3, err_msg="conf"
    )
    np.testing.assert_allclose(
        np.asarray(ours["local_points"]), ref["local_points"], atol=2e-3, err_msg="local_points"
    )
    np.testing.assert_allclose(
        np.asarray(ours["camera_poses"]), ref["camera_poses"], atol=2e-3, err_msg="camera_poses"
    )
    np.testing.assert_allclose(
        np.asarray(ours["points"]), ref["points"], atol=5e-3, err_msg="points"
    )


def test_params_npz_roundtrip(tmp_path, reference_oracle):
    params = convert_pi3_state_dict(reference_oracle["state_dict"])
    path = str(tmp_path / "pi3.npz")
    save_params_npz(path, params)
    back = load_params_npz(path)
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(back)
    assert len(leaves1) == len(leaves2)
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(back)[0]
    for (p1, v1), (p2, v2) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
