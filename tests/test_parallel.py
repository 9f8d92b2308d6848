"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pi3_slam_tpu.models import Pi3Config
from pi3_slam_tpu.models.dinov2 import DinoV2Config
from pi3_slam_tpu.models.pi3 import init_pi3_params, pi3_forward
from pi3_slam_tpu.parallel import make_mesh, make_sharded_pi3_step, pi3_input_sharding

TINY = Pi3Config(
    encoder=DinoV2Config(embed_dim=64, depth=2, num_heads=2, pos_embed_size=37),
    dec_embed_dim=64,
    dec_num_heads=2,
    dec_depth=4,
    num_register_tokens=5,
    head_dim=64,
    head_depth=2,
    head_num_heads=2,
    camera_dim=32,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single_device(rng):
    params = init_pi3_params(0, TINY)
    imgs = jnp.asarray(rng.uniform(size=(4, 2, 3, 28, 28)).astype(np.float32))

    ref = pi3_forward(params, imgs, TINY)

    mesh = make_mesh(4, 2)
    step, sharded_params = make_sharded_pi3_step(params, TINY, mesh, compute_dtype=jnp.float32)
    imgs_sharded = jax.device_put(imgs, pi3_input_sharding(mesh))
    out = step(sharded_params, imgs_sharded)

    np.testing.assert_allclose(
        np.asarray(out["points"]), np.asarray(ref["points"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["camera_poses"]), np.asarray(ref["camera_poses"]), atol=2e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_only_mesh(rng):
    params = init_pi3_params(0, TINY)
    mesh = make_mesh(8, 1)
    step, sp = make_sharded_pi3_step(params, TINY, mesh, compute_dtype=jnp.float32)
    imgs = jax.device_put(
        jnp.asarray(rng.uniform(size=(8, 2, 3, 28, 28)).astype(np.float32)),
        pi3_input_sharding(mesh),
    )
    out = step(sp, imgs)
    assert out["points"].shape == (8, 2, 28, 28, 3)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))
