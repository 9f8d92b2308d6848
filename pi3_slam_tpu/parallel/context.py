"""Tensor-parallel tracing context.

GSPMD propagates the Megatron column/row sharding cleanly through the
matmuls, but it has no partitioning rule for the attention itself: the
(B, T, 3, H, D) reshape + SDPA (a Pallas call on TPU) makes XLA all-gather
the full qkv on every block and run attention replicated — measured on the
compiled HLO of the dp×tp step (all-gather of the 3C activation per block,
zero attention speedup from tp). The fix is the standard one: run SDPA under
``shard_map`` over the tp axis so each device computes its own H/tp heads and
the Pallas kernel stays a single-device program per shard.

The mesh is made available to ``models/layers.attention`` through a
context variable set by the sharded-step builders while they trace — model
code stays a pure function with no mesh argument threading.
"""

from __future__ import annotations

import contextlib
import contextvars

import numpy as np
import jax.numpy as jnp

_TP_MESH: contextvars.ContextVar = contextvars.ContextVar("pi3_tp_mesh", default=None)


@contextlib.contextmanager
def tp_mesh_context(mesh):
    """Activate mesh-sharded attention for traces started inside.

    Active whenever the mesh parallelizes anything (dp > 1 and/or tp > 1):
    a pallas_call is opaque to GSPMD, so even pure chunk-dp would otherwise
    all-gather the batch around the kernel and compute attention replicated
    on every device — attention must run under shard_map on ANY mesh.
    """
    active = mesh is not None and int(np.prod(tuple(mesh.shape.values()))) > 1
    token = _TP_MESH.set(mesh if active else None)
    try:
        yield
    finally:
        _TP_MESH.reset(token)


def current_tp_mesh():
    return _TP_MESH.get()


def _tp_degree(mesh) -> int:
    return mesh.shape["tp"] if "tp" in mesh.axis_names else 1


def replicate_over_tp(x):
    """Constrain a (B, T, C) activation to be tp-replicated (batch stays on
    dp). Identity without an active tp mesh.

    Placed on each transformer block's residual output: without it GSPMD
    keeps activations C-sharded between blocks and reduces the partial sums
    at the NEXT block's qkv matmul — an all-reduce of the 3C tensor, 3x the
    payload of reducing the row-parallel proj/fc2 outputs directly (measured
    in the compiled HLO of the dp×tp step).
    """
    mesh = current_tp_mesh()
    if mesh is None or _tp_degree(mesh) == 1:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    bdim = "dp" if "dp" in mesh.axis_names and x.shape[0] % mesh.shape["dp"] == 0 else None
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(bdim, *([None] * (x.ndim - 1))))
    )


def sharded_block_mlp(
    x,
    norm_scale,
    norm_bias,
    w1,
    b1,
    w2,
    b2,
    ls=None,
    eps: float = 1e-6,
    interpret: bool = False,
):
    """Fused LN+MLP+LayerScale+residual kernel under the active mesh.

    The MLP half of a block is pointwise in rows, so under dp (batch) and/or
    sp (token) sharding each device can run ops/pallas_mlp.block_mlp_fused_tpu
    on its own shard with replicated weights — a pallas_call is opaque to
    GSPMD, so without the shard_map the batch would be all-gathered around the
    kernel. tp>1 callers must not use this (the Megatron fc1/fc2 split needs
    the plain matmuls); layers.block gates on tp degree.
    """
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_mlp import block_mlp_fused_tpu

    mesh = current_tp_mesh()
    fused = partial(block_mlp_fused_tpu, eps=eps, interpret=interpret)
    if mesh is None:
        return fused(x, norm_scale, norm_bias, w1, b1, w2, b2, ls=ls)
    bdim = (
        "dp"
        if "dp" in mesh.axis_names and x.shape[0] % mesh.shape["dp"] == 0
        else None
    )
    tdim = (
        "sp"
        if "sp" in mesh.axis_names and x.shape[1] % mesh.shape["sp"] == 0
        else None
    )
    spec = P(bdim, tdim, None)
    rep1 = P(None)
    rep2 = P(None, None)
    if ls is None:
        ls = jnp.ones((w1.shape[0],), jnp.float32)
    return shard_map(
        lambda xs, g, b, k1, c1, k2, c2, l: fused(xs, g, b, k1, c1, k2, c2, ls=l),
        mesh=mesh,
        in_specs=(spec, rep1, rep1, rep2, rep1, rep2, rep1, rep1),
        out_specs=spec,
        check_rep=False,
    )(x, norm_scale, norm_bias, w1, b1, w2, b2, ls)


def sharded_sdpa(q, k, v):
    """SDPA sharded over the active mesh (identity wrapper when none).

    q/k/v: (B, T, H, D). Batch shards on dp, heads on tp, and — when the
    mesh has an ``sp`` axis and the sequence is long — tokens shard on sp
    with exact ring attention (parallel/ring.py) rotating k/v shards over
    ICI neighbours.
    """
    from ..ops.attention import LONG_SEQUENCE_THRESHOLD, sdpa

    mesh = current_tp_mesh()
    tp = _tp_degree(mesh) if mesh is not None else 1
    if mesh is None or q.shape[2] % tp != 0:
        return sdpa(q, k, v)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    # batch stays dp-sharded (chunk data parallelism), heads shard on tp —
    # a None batch spec would all-gather the chunk batch across dp
    bdim = "dp" if "dp" in mesh.axis_names and q.shape[0] % mesh.shape["dp"] == 0 else None
    hdim = "tp" if tp > 1 else None

    sp = mesh.shape["sp"] if "sp" in mesh.axis_names else 1
    if sp > 1 and q.shape[1] >= LONG_SEQUENCE_THRESHOLD:
        from .ring import ring_attention

        T = q.shape[1]
        Tp = (T + sp - 1) // sp * sp
        pad = ((0, 0), (0, Tp - T), (0, 0), (0, 0))
        qp = jnp.pad(q, pad) if Tp > T else q
        kp = jnp.pad(k, pad) if Tp > T else k
        vp = jnp.pad(v, pad) if Tp > T else v
        spec = P(bdim, "sp", hdim, None)
        out = shard_map(
            lambda a, b, c: ring_attention(a, b, c, "sp", n_pad=Tp - T),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False,
        )(qp, kp, vp)
        return out[:, :T]

    spec = P(bdim, None, hdim, None)
    return shard_map(
        sdpa, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )(q, k, v)
