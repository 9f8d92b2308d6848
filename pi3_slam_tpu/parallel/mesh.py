"""Device-mesh sharding for Pi3 chunk inference.

The reference has no device parallelism at all (SURVEY §2.5: its concurrency
is host-process pipelining). The TPU-native scaling story built here:

  * ``dp`` axis — data parallelism over chunks (the B dimension): each chunk
    is an independent inference, so chunk-level DP is embarrassingly parallel
    and rides ICI only for parameter broadcast.
  * ``tp`` axis — tensor parallelism over attention heads / MLP hidden dim:
    qkv+fc1 kernels are column-sharded, proj+fc2 row-sharded, so each block
    is a pair of (all-gather-free) local matmuls with a psum on the row-
    sharded output — the standard Megatron split, expressed purely through
    NamedSharding constraints and GSPMD propagation.

Everything goes through jax.jit with explicit in_shardings; XLA inserts the
collectives. No NCCL-style hand-written communication.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int, n_tp: int, devices=None, *, n_sp: int = 1) -> Mesh:
    """(dp, tp[, sp]) device mesh. sp — sequence parallelism for ring
    attention over very long chunks (parallel/ring.py) — is only added as a
    mesh axis when > 1 so dp/tp-only programs keep their 2D mesh shape."""
    devices = devices if devices is not None else jax.devices()
    n = n_dp * n_tp * n_sp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if n_sp > 1:
        arr = np.asarray(devices[:n]).reshape(n_dp, n_tp, n_sp)
        return Mesh(arr, axis_names=("dp", "tp", "sp"))
    arr = np.asarray(devices[:n]).reshape(n_dp, n_tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _block_stack_spec(has_qk_norm: bool, has_ls: bool) -> Dict[str, P]:
    """PartitionSpecs for a stacked block dict (leading scan axis L).

    Megatron split: qkv/fc1 column-parallel (out features on tp), proj/fc2
    row-parallel (in features on tp); norms/biases of row-parallel outputs
    replicated.
    """
    spec = {
        "norm1_scale": P(), "norm1_bias": P(),
        # qkv stays REPLICATED: the packed [q|k|v] column layout shards 3C at
        # 1.5C, which GSPMD cannot reconcile with per-tensor head sharding —
        # a column-sharded qkv forced an all-gather of the full 3C activation
        # per block (measured in the compiled HLO). Recomputing the qkv
        # matmul per tp shard (~2 ms/block at Pi3 shapes) is cheaper than
        # gathering its 395 MB output (~8 ms/block on ICI). Attention then
        # runs head-sharded via shard_map (parallel/context.py) and proj's
        # row-parallel contraction issues the single Megatron psum.
        "qkv_kernel": P(),
        "qkv_bias": P(),
        "proj_kernel": P(None, "tp", None),
        "proj_bias": P(),
        "norm2_scale": P(), "norm2_bias": P(),
        "fc1_kernel": P(None, None, "tp"),
        "fc1_bias": P(None, "tp"),
        "fc2_kernel": P(None, "tp", None),
        "fc2_bias": P(),
    }
    if has_qk_norm:
        spec.update(q_norm_scale=P(), q_norm_bias=P(), k_norm_scale=P(), k_norm_bias=P())
    if has_ls:
        spec.update(ls1=P(), ls2=P())
    return spec


def pi3_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding tree matching a Pi3 param pytree."""

    def ns(spec):
        return NamedSharding(mesh, spec)

    def map_blocks(block_params):
        has_qk = "q_norm_scale" in block_params
        has_ls = "ls1" in block_params
        spec = _block_stack_spec(has_qk, has_ls)
        return {k: ns(spec[k]) for k in block_params}

    enc = params["encoder"]
    out: Dict[str, Any] = {
        "encoder": {
            "patch_embed_kernel": ns(P(None, "tp")),
            "patch_embed_bias": ns(P("tp")),
            "cls_token": ns(P()),
            "pos_embed": ns(P()),
            "register_tokens": ns(P()),
            "blocks": map_blocks(enc["blocks"]),
            "norm_scale": ns(P()),
            "norm_bias": ns(P()),
        },
        "decoder": {
            "register_token": ns(P()),
            "even_blocks": map_blocks(params["decoder"]["even_blocks"]),
            "odd_blocks": map_blocks(params["decoder"]["odd_blocks"]),
        },
    }
    for head in ("point_decoder", "conf_decoder", "camera_decoder"):
        hp = params[head]
        out[head] = {
            "project_kernel": ns(P(None, "tp")),
            "project_bias": ns(P("tp")),
            "blocks": map_blocks(hp["blocks"]),
            "out_kernel": ns(P("tp", None)),
            "out_bias": ns(P()),
        }
    for head in ("point_head", "conf_head"):
        out[head] = {"kernel": ns(P(None, "tp")), "bias": ns(P("tp"))}
    ch = {}
    for i in range(2):
        ch[f"res_conv{i}"] = {
            "fc1_kernel": ns(P(None, "tp")), "fc1_bias": ns(P("tp")),
            "fc2_kernel": ns(P("tp", None)), "fc2_bias": ns(P()),
            "fc3_kernel": ns(P(None, "tp")), "fc3_bias": ns(P("tp")),
        }
    ch.update(
        mlp1_kernel=ns(P(None, "tp")), mlp1_bias=ns(P("tp")),
        mlp2_kernel=ns(P("tp", None)), mlp2_bias=ns(P()),
        fc_t_kernel=ns(P()), fc_t_bias=ns(P()),
        fc_rot_kernel=ns(P()), fc_rot_bias=ns(P()),
    )
    out["camera_head"] = ch
    return out


def pi3_input_sharding(mesh: Mesh) -> NamedSharding:
    """Chunk-batch data parallelism: (B, N, 3, H, W) sharded on B."""
    return NamedSharding(mesh, P("dp"))


def make_sharded_pi3_step(params, cfg, mesh: Mesh, compute_dtype=jnp.bfloat16):
    """jit the Pi3 chunk-inference step over the mesh.

    Returns (step_fn, sharded_params). step_fn(sharded_params, imgs) runs the
    full forward with dp over chunks and tp over heads/hidden.
    """
    from ..models.pi3 import pi3_forward
    from .context import tp_mesh_context

    param_shardings = pi3_param_shardings(params, mesh)
    sharded_params = jax.device_put(params, param_shardings)
    in_img = pi3_input_sharding(mesh)

    jitted = jax.jit(
        lambda p, x: pi3_forward(p, x, cfg, compute_dtype=compute_dtype),
        in_shardings=(param_shardings, in_img),
        out_shardings=NamedSharding(mesh, P("dp")),
    )

    def step(p, x):
        # tp context active while the jitted forward traces: attention runs
        # head-sharded via shard_map instead of GSPMD's all-gather+replicate
        with tp_mesh_context(mesh):
            return jitted(p, x)

    return step, sharded_params
