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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_attention_matches_reference(rng):
    """Sequence-parallel ring attention (bound-stabilized, k/v shards rotated
    via ppermute) must equal plain attention, including with a padded tail."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from pi3_slam_tpu.ops.attention import sdpa_reference
    from pi3_slam_tpu.parallel import make_mesh
    from pi3_slam_tpu.parallel.ring import ring_attention

    mesh = make_mesh(1, 1, n_sp=8)
    assert mesh.axis_names == ("dp", "tp", "sp")
    B, T, H, D = 2, 512, 2, 64
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    spec = P(None, "sp", None, None)
    out = shard_map(
        lambda a, b, c: ring_attention(a, b, c, "sp"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )(q, k, v)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # padded tail: global zero keys corrected by count, wherever they land
    Tr = 480  # pads to 512, 4 zero rows on the last shard
    qp = jnp.pad(q[:, :Tr], ((0, 0), (0, T - Tr), (0, 0), (0, 0)))
    kp = jnp.pad(k[:, :Tr], ((0, 0), (0, T - Tr), (0, 0), (0, 0)))
    vp = jnp.pad(v[:, :Tr], ((0, 0), (0, T - Tr), (0, 0), (0, 0)))
    out2 = shard_map(
        lambda a, b, c: ring_attention(a, b, c, "sp", n_pad=T - Tr),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )(qp, kp, vp)
    ref2 = sdpa_reference(q[:, :Tr], k[:, :Tr], v[:, :Tr])
    np.testing.assert_allclose(np.asarray(out2[:, :Tr]), np.asarray(ref2), atol=3e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_sdpa_routes_long_sequences_to_ring(rng):
    """Under a dp x tp x sp mesh, sharded_sdpa rings long sequences over sp
    (non-divisible T exercises the pad+correction path) and matches plain
    attention."""
    from pi3_slam_tpu.ops.attention import sdpa_reference
    from pi3_slam_tpu.parallel import make_mesh
    from pi3_slam_tpu.parallel.context import sharded_sdpa, tp_mesh_context

    mesh = make_mesh(1, 2, n_sp=4)
    B, T, H, D = 1, 4100, 2, 64  # >= LONG threshold; 4100 % 4 != 0
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    with tp_mesh_context(mesh):
        out = sharded_sdpa(q, k, v)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
