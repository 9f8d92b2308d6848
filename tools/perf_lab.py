"""Attention micro-benchmarks on the real TPU (axon backend).

Compares implementations at the two hot shapes of the Pi3 decoder
(reference hot loop: pi3/models/pi3.py:156-166):
  * global attention: (1, N*hw, 16, 64) — ~66k tokens at 100-frame chunks
  * frame attention:  (N, hw, 16, 64)  — ~660 tokens per frame

Timing protocol (project memory bench-timing-protocol): block_until_ready is
a no-op on axon — drain with a scalar transfer; >= 3 chained iterations.

Usage: python tools/perf_lab.py [global|frame|forward|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def drain(x):
    return float(jnp.sum(x[(0,) * (x.ndim - 1)]) if x.ndim else jnp.sum(x))


def bench(fn, *args, iters=4, warmup=2, label=""):
    for _ in range(warmup):
        out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:55s} {dt * 1e3:9.2f} ms")
    return dt


def attn_flops(B, T, H, D):
    return 4 * B * T * T * H * D


def report(label, dt, B, T, H, D):
    tf = attn_flops(B, T, H, D) / dt / 1e12
    print(f"{label:55s} {dt * 1e3:9.2f} ms   {tf:7.1f} TFLOP/s")


def bench_device_loop(step, x, label, flops, loop=6):
    """Dispatch-free per-op timing: run ``step`` ``loop`` times inside ONE
    jitted lax.fori_loop and divide. The axon tunnel adds ~3 ms of overhead
    to every host-side dispatch (round-4 finding, PARITY.md floor section),
    which inflates host-loop timings of 1-200 ms ops by 2-300%; the device
    loop removes it. ``step`` must be shape-preserving (feed the output back
    as the next input)."""
    import jax

    @jax.jit
    def run(x0):
        return jax.lax.fori_loop(0, loop, lambda i, a: step(a), x0)

    out = run(x)
    drain(out)
    t0 = time.perf_counter()
    out = run(x)
    drain(out)
    dt = (time.perf_counter() - t0) / loop
    print(f"{label:56s} {dt * 1e3:8.2f} ms {flops / dt / 1e12:7.1f} TFLOP/s")
    return dt


def bench_sol():
    """Speed-of-light audit: reproduce the round-4 floor-proof probes
    (PARITY.md 'Single-chip exact-path floor'). Expected on the v5e:
    square-8192^3 ~118 TF/s (practical chip peak), dots-only attention
    ~93.8 TF/s (the D=64/out-65 shape ceiling), real flash kernel ~92.4
    (98.3% of it), fused block-MLP ~103.6 TF/s."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pi3_slam_tpu.ops.pallas_attention import flash_attention_packed_tpu
    from pi3_slam_tpu.ops.pallas_mlp import block_mlp_fused_tpu

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    S = 8192
    a, w = mk(S, S), mk(S, S)
    mm = lambda x: jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
    )
    bench_device_loop(mm, a, f"square {S}^3 bf16 matmul (practical peak)", 2 * S**3)

    B, H, T, D = 1, 16, 65536, 64
    blk_q = blk_k = 2048
    qkv = mk(B, T, 3 * H * D)
    aflops = 4 * B * H * T * T * D

    # dots-only twin of _flash_packed_kernel: softmax -> cast, same shapes
    def dots_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, nk):
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        kb, vb = k_ref[0], v_ref[0]
        ones = jnp.ones((vb.shape[0], 1), vb.dtype)
        for s in range(2):
            lg = jax.lax.dot_general(
                q_ref[0][:, s * 64 : (s + 1) * 64],
                kb[:, s * 64 : (s + 1) * 64],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = lg.astype(vb.dtype)
            vv = jnp.concatenate([vb[:, s * 64 : (s + 1) * 64], ones], axis=1)
            acc_ref[:, s * 65 : (s + 1) * 65] += jax.lax.dot_general(
                p, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        @pl.when(ik == nk - 1)
        def _():
            o_ref[0] = jnp.concatenate(
                [acc_ref[:, :64], acc_ref[:, 65:129]], axis=1
            ).astype(o_ref.dtype)

    def dots_only(x):
        grid = (B * H // 2, T // blk_q, T // blk_k)
        oq, ok, ov = 0, H // 2, H
        return pl.pallas_call(
            functools.partial(dots_kernel, nk=T // blk_k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk_q, 128), lambda g, iq, ik: (g // (H // 2), iq, oq + g % (H // 2))),
                pl.BlockSpec((1, blk_k, 128), lambda g, iq, ik: (g // (H // 2), ik, ok + g % (H // 2))),
                pl.BlockSpec((1, blk_k, 128), lambda g, iq, ik: (g // (H // 2), ik, ov + g % (H // 2))),
            ],
            out_specs=pl.BlockSpec((1, blk_q, 128), lambda g, iq, ik: (g // (H // 2), iq, g % (H // 2))),
            out_shape=jax.ShapeDtypeStruct((B, T, H * D), x.dtype),
            scratch_shapes=[pltpu.VMEM((blk_q, 2 * (D + 1)), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(x, x, x)

    bench_device_loop(
        lambda x: jnp.concatenate([dots_only(x)] * 3, axis=-1),
        qkv, "dots-only packed attention (matmul ceiling)", aflops,
    )
    bench_device_loop(
        lambda x: jnp.concatenate([flash_attention_packed_tpu(x, H)] * 3, axis=-1),
        qkv, "real packed flash kernel (bound softmax)", aflops,
    )

    T2, C, HID = 65536, 1024, 4096
    x = mk(1, T2, C)
    w1, w2 = mk(C, HID), mk(HID, C)
    b1 = jnp.zeros((HID,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    bench_device_loop(
        lambda a: block_mlp_fused_tpu(a, scale, bias, w1, b1, w2, b2),
        x, "fused block-MLP (production 256/nj4)", 4 * T2 * C * HID,
    )


def make_qkv(B, T, H, D, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32) * 0.1).astype(dtype)
    return mk(), mk(), mk()


def bench_global():
    B, T, H, D = 1, 66000, 16, 64
    q, k, v = make_qkv(B, T, H, D)
    print(f"== global attention ({B},{T},{H},{D}) bf16, ideal@197TF/s = "
          f"{attn_flops(B,T,H,D)/197e12*1e3:.0f} ms, @50%cap = "
          f"{attn_flops(B,T,H,D)/98.5e12*1e3:.0f} ms ==")

    from pi3_slam_tpu.ops.pallas_attention import flash_attention_tpu

    for blk_q, blk_k, nw in [
        (256, 1024, 4), (256, 1024, 8), (512, 1024, 2), (1024, 1024, 1),
        (512, 1024, 4), (256, 2048, 4),
    ]:
        try:
            f = jax.jit(
                lambda q, k, v, bq=blk_q, bk=blk_k, n=nw: flash_attention_tpu(
                    q, k, v, blk_q=bq, blk_k=bk, n_interleave=n
                )
            )
            dt = bench(f, q, k, v, label=f"ours bq={blk_q} nw={nw} bk={blk_k}")
            report(f"ours bq={blk_q} nw={nw} bk={blk_k}", dt, B, T, H, D)
        except Exception as e:
            print(f"bq={blk_q} nw={nw} bk={blk_k} FAILED: {str(e)[:100]}")

    # official jax pallas kernel (expects (B, H, T, D))
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jflash, BlockSizes,
        )
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        for bs in [1024, 2048]:
            blocks = BlockSizes(
                block_q=bs, block_k_major=bs, block_k=bs, block_b=1,
                block_q_major_dkv=bs, block_k_major_dkv=bs, block_k_dkv=bs,
                block_q_dkv=bs, block_k_major_dq=bs, block_k_dq=bs, block_q_dq=bs,
            )
            f = jax.jit(lambda q, k, v, b=blocks: jflash(q, k, v, causal=False, sm_scale=D**-0.5, block_sizes=b))
            try:
                dt = bench(f, qh, kh, vh, label=f"jax official flash bs={bs}")
                report(f"jax official flash bs={bs}", dt, B, T, H, D)
            except Exception as e:
                print(f"jax official flash bs={bs} FAILED: {str(e)[:100]}")
    except Exception as e:
        print("official import failed:", str(e)[:100])


def bench_frame():
    for B, T in [(100, 660), (100, 643)]:
        H, D = 16, 64
        q, k, v = make_qkv(B, T, H, D)
        print(f"== frame attention ({B},{T},{H},{D}) bf16, ideal@197 = "
              f"{attn_flops(B,T,H,D)/197e12*1e3:.2f} ms ==")
        from pi3_slam_tpu.ops.attention import sdpa_reference

        f = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
        dt = bench(f, q, k, v, label="XLA dot_product_attention")
        report("XLA dot_product_attention", dt, B, T, H, D)

        f = jax.jit(sdpa_reference)
        dt = bench(f, q, k, v, label="einsum reference")
        report("einsum reference", dt, B, T, H, D)

        from pi3_slam_tpu.ops.pallas_attention import attention_single_pass_tpu

        for nw in (1, 2, 4, 8, 16):
            if (B * H) % nw:
                continue
            try:
                f = jax.jit(lambda q, k, v, n=nw: attention_single_pass_tpu(q, k, v, n_interleave=n))
                dt = bench(f, q, k, v, label=f"ours single-pass nw={nw}")
                report(f"ours single-pass nw={nw}", dt, B, T, H, D)
            except Exception as e:
                print(f"ours single-pass nw={nw} FAILED:", str(e)[:100])


def bench_packed():
    """Tunable sweeps of the packed-qkv kernels (the production path)."""
    from pi3_slam_tpu.ops.pallas_attention import (
        attention_single_pass_packed_tpu,
        flash_attention_packed_tpu,
    )

    rng = np.random.default_rng(0)
    B, T, H, D = 100, 660, 16, 64
    qkv = jnp.asarray(
        rng.standard_normal((B, T, 3 * H * D)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    fl = attn_flops(B, T, H, D)
    for nw in (1, 2, 4):
        f = jax.jit(lambda x, n=nw: attention_single_pass_packed_tpu(x, num_heads=H, n_interleave=n))
        dt = bench(f, qkv, label=f"single packed nw={nw}")
        report(f"single packed nw={nw}", dt, B, T, H, D)

    B2, T2 = 1, 66000
    qkv2 = jnp.asarray(
        rng.standard_normal((B2, T2, 3 * H * D)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    for bq, bk, nq in [(2048, 2048, 1), (1024, 1024, 1), (2048, 2048, 2)]:
        f = jax.jit(
            lambda x, a=bq, b=bk, n=nq: flash_attention_packed_tpu(
                x, num_heads=H, blk_q=a, blk_k=b, n_q_blocks=n
            )
        )
        dt = bench(f, qkv2, label=f"flash packed bq={bq} bk={bk} nq={nq}")
        report(f"flash packed bq={bq} bk={bk} nq={nq}", dt, B2, T2, H, D)


def bench_block():
    """One decoder block at the global/frame shapes: full block() (LN + qkv +
    qk-norm + RoPE + packed kernel + proj + MLP) vs the packed kernel alone —
    quantifies the non-kernel overhead per block."""
    from pi3_slam_tpu.models.layers import block
    from pi3_slam_tpu.models.pi3 import _init_block_stack
    from pi3_slam_tpu.ops.pallas_attention import (
        attention_single_pass_packed_tpu,
        flash_attention_packed_tpu,
    )
    from pi3_slam_tpu.ops.rope import make_patch_positions

    B, N, hw, C, Hh, D = 1, 100, 643, 1024, 16, 64
    T = N * hw
    bp = {
        k: jnp.asarray(v[0]).astype(jnp.bfloat16)
        for k, v in _init_block_stack(0, 1, C, 4, True, 0.01, jnp.bfloat16).items()
    }
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    pos = make_patch_positions(N, 22, 29, num_special=5, offset=1).reshape(1, T, 2)

    f = jax.jit(lambda x, p: block(x, p, num_heads=Hh, positions=pos))
    dt = bench(f, x, bp, label="global block() full (LN+qkv+norm+rope+attn+proj+mlp)")

    qkv = jnp.asarray(
        rng.standard_normal((B, T, 3 * C)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    fk = jax.jit(lambda x: flash_attention_packed_tpu(x, num_heads=Hh))
    dtk = bench(fk, qkv, label="packed flash kernel alone")
    report("packed flash kernel alone", dtk, B, T, Hh, D)
    print(f"non-kernel overhead per global block: {(dt-dtk)*1e3:.1f} ms")

    # frame-shape block (even decoder layers / encoder / heads)
    xf = jnp.asarray(rng.standard_normal((N, hw, C)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    posf = make_patch_positions(N, 22, 29, num_special=5, offset=1)
    ff = jax.jit(lambda x, p: block(x, p, num_heads=Hh, positions=posf))
    dtf = bench(ff, xf, bp, label="frame block() full")
    qkvf = jnp.asarray(
        rng.standard_normal((N, hw, 3 * C)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    fsk = jax.jit(lambda x: attention_single_pass_packed_tpu(x, num_heads=Hh))
    dtfk = bench(fsk, qkvf, label="packed single-pass kernel alone")
    print(f"non-kernel overhead per frame block: {(dtf-dtfk)*1e3:.1f} ms")


def bench_stages():
    """Ablation: time encoder / decoder / head stages of the full forward
    separately (each as its own jitted program over device-resident inputs)."""
    import functools

    from pi3_slam_tpu.models import Pi3Config, init_pi3_params
    from pi3_slam_tpu.models.pi3 import _decode, _head_decoder_forward, _camera_head_forward
    from pi3_slam_tpu.models.dinov2 import dinov2_forward
    from pi3_slam_tpu.ops.rope import make_patch_positions
    from pi3_slam_tpu.utils.precision import cast_tree_bf16_host

    cfg = Pi3Config()
    params = jax.device_put(cast_tree_bf16_host(init_pi3_params(0, cfg)))
    rng = np.random.default_rng(0)
    B, N, H, W = 1, 100, 308, 406
    ph, pw = H // 14, W // 14
    hw = ph * pw
    imgs = jnp.asarray(rng.uniform(size=(B * N, 3, H, W)).astype(np.float32))

    enc = jax.jit(functools.partial(dinov2_forward, cfg=cfg.encoder, compute_dtype=jnp.bfloat16))
    t_enc = bench(lambda p, x: enc(p, x)["patch_tokens"], params["encoder"], imgs,
                  label="encoder (24 blocks, 100x638 tok)")

    hidden = jnp.asarray(rng.standard_normal((B * N, hw, 1024)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    dec = jax.jit(lambda p, h: _decode(p, h, B, N, (ph, pw), cfg)[0])
    t_dec = bench(dec, params["decoder"], hidden, label="decoder (36 blocks alt frame/global)")

    hw_full = hw + cfg.num_register_tokens
    hidden_cat = jnp.asarray(
        rng.standard_normal((B * N, hw_full, 2048)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    pos = make_patch_positions(B * N, ph, pw, num_special=cfg.num_register_tokens, offset=1)
    hd = jax.jit(lambda p, h: _head_decoder_forward(p, h, pos, cfg, cfg.head_num_heads))
    t_head = bench(hd, params["point_decoder"], hidden_cat, label="one head decoder (5 blocks)")

    def dense_heads(p, ph_in, ch_in, camh_in):
        from pi3_slam_tpu.models.pi3 import tokens_to_image, linear, homogenize_points
        reg = cfg.num_register_tokens
        with jax.default_matmul_precision("float32"):
            pt = ph_in[:, reg:].astype(jnp.float32)
            ret = tokens_to_image(
                linear(pt, p["point_head"]["kernel"].astype(jnp.float32),
                       p["point_head"]["bias"].astype(jnp.float32)), (ph, pw), 14, 3
            ).reshape(B, N, H, W, 3)
            xy, z = ret[..., :2], ret[..., 2:]
            z = jnp.exp(z)
            local_points = jnp.concatenate([xy * z, z], axis=-1)
            cf = ch_in[:, reg:].astype(jnp.float32)
            conf = tokens_to_image(
                linear(cf, p["conf_head"]["kernel"].astype(jnp.float32),
                       p["conf_head"]["bias"].astype(jnp.float32)), (ph, pw), 14, 1
            ).reshape(B, N, H, W, 1)
            poses = _camera_head_forward(p["camera_head"], camh_in[:, reg:]).reshape(B, N, 4, 4)
            points = jnp.einsum("bnij,bnhwj->bnhwi", poses, homogenize_points(local_points))[..., :3]
        return points, conf

    cam_hidden = jnp.asarray(
        rng.standard_normal((B * N, hw_full, 512)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    dh = jax.jit(dense_heads)
    t_dense = bench(lambda p, a, b, c: dh(p, a, b, c)[0], params, hidden_cat[..., :1024],
                    hidden_cat[..., :1024], cam_hidden, label="dense heads (fp32 linears+SVD+einsum)")

    total = t_enc + t_dec + 3 * t_head + t_dense
    print(f"\nsum of stages: {total*1e3:.0f} ms -> {N/total:.2f} FPS "
          f"(enc {t_enc:.2f}s dec {t_dec:.2f}s heads 3x{t_head:.2f}s dense {t_dense:.2f}s)")


def bench_mlp(sweep: bool = False):
    """XLA mlp vs the fused Pallas kernels at the block shape (T=65.5k rows,
    C=1024, hidden=4096, bf16). FLOPs = 2 matmuls = 4*T*C*hidden."""
    from pi3_slam_tpu.models.layers import layer_norm, mlp
    from pi3_slam_tpu.ops.pallas_mlp import block_mlp_fused_tpu, mlp_fused_tpu

    T, C, HID = 65500, 1024, 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32) * 0.2).astype(
        jnp.bfloat16
    )
    p = {
        "fc1_kernel": jnp.asarray(
            rng.standard_normal((C, HID)).astype(np.float32) * 0.02
        ).astype(jnp.bfloat16),
        "fc1_bias": jnp.asarray(rng.standard_normal((HID,)).astype(np.float32) * 0.02),
        "fc2_kernel": jnp.asarray(
            rng.standard_normal((HID, C)).astype(np.float32) * 0.02
        ).astype(jnp.bfloat16),
        "fc2_bias": jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.02),
    }
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    ls = jnp.full((C,), 0.9, jnp.float32)
    flops = 4 * T * C * HID

    def rep(label, dt):
        print(f"{label:55s} {dt * 1e3:9.2f} ms   {flops / dt / 1e12:7.1f} TFLOP/s")

    xla_mlp = jax.jit(lambda a: mlp(a, p))
    rep("XLA mlp (fc1+gelu fusion, fc2)", bench(xla_mlp, x, label="xla mlp"))
    xla_blk = jax.jit(lambda a: a + ls.astype(a.dtype) * mlp(layer_norm(a, scale, bias, 1e-6), p))
    rep("XLA ln+mlp+ls+residual", bench(xla_blk, x, label="xla block-mlp"))

    combos = (
        [(512, 8), (1024, 4), (1024, 8), (1024, 16), (2048, 4), (2048, 8)]
        if sweep
        else [(1024, 8), (2048, 8)]
    )
    for blk_rows, nj in combos:
        f = jax.jit(
            lambda a, br=blk_rows, n=nj: mlp_fused_tpu(
                a, p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"],
                p["fc2_bias"], blk_rows=br, n_hidden_blocks=n,
            )
        )
        rep(
            f"pallas mlp blk_rows={blk_rows} nj={nj}",
            bench(f, x, label=f"pallas mlp {blk_rows}/{nj}"),
        )
    blk_combos = (
        [
            (256, None, "vpu"), (256, None, "mxu"),
            (512, None, "vpu"), (512, None, "mxu"),
            (512, 8, "mxu"),
            (1024, None, "vpu"), (1024, None, "mxu"),
            (1024, 8, "vpu"), (1024, 8, "mxu"),
            (2048, 8, "mxu"),
        ]
        if sweep
        else [(256, None, "vpu"), (256, None, "mxu"), (1024, 8, "mxu")]
    )
    for blk_rows, nj, lns in blk_combos:
        f = jax.jit(
            lambda a, br=blk_rows, n=nj, s=lns: block_mlp_fused_tpu(
                a, scale, bias, p["fc1_kernel"], p["fc1_bias"],
                p["fc2_kernel"], p["fc2_bias"], ls=ls, blk_rows=br,
                n_hidden_blocks=n, ln_stats=s,
            )
        )
        rep(
            f"pallas ln+mlp+ls+res blk_rows={blk_rows} nj={nj} ln={lns}",
            bench(f, x, label=f"pallas block-mlp {blk_rows}/{nj}/{lns}"),
        )


def bench_forward():
    """Full forward at the eval shape. PI3_KV_MERGE=m times the experimental
    merged-kv global attention (models/layers._merged_kv_attention) at the
    same shape for an FPS-side comparison (accuracy is NOT measured here)."""
    import os

    from pi3_slam_tpu.models import Pi3Config, pi3_forward, init_pi3_params
    from pi3_slam_tpu.utils.precision import cast_tree_bf16_host

    merge = int(os.environ.get("PI3_KV_MERGE", "1"))
    cfg = Pi3Config(global_kv_merge=merge)
    params = jax.device_put(cast_tree_bf16_host(init_pi3_params(0, cfg)))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(1, 100, 3, 308, 406)).astype(np.float32))
    fwd = jax.jit(lambda p, x: pi3_forward(p, x, cfg, compute_dtype=jnp.bfloat16))
    out = fwd(params, imgs)
    drain(out["conf"])
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = fwd(params, imgs)
    drain(out["conf"])
    dt = (time.perf_counter() - t0) / iters
    tag = f" (kv_merge={merge})" if merge > 1 else ""
    print(f"pi3_forward full{tag}: {dt*1e3:.1f} ms = {100/dt:.2f} FPS")


def bench_refine():
    """Cost of correlation-based observation refinement at the eval shape:
    the full chunk step with refine_obs on vs off (100 frames @ 308x406,
    400 keypoints, fan width 10)."""
    from pi3_slam_tpu.models import Pi3Config, init_pi3_params
    from pi3_slam_tpu.slam.chunk_creator import make_chunk_step
    from pi3_slam_tpu.utils.precision import cast_tree_bf16_host

    cfg = Pi3Config()
    params = jax.device_put(cast_tree_bf16_host(init_pi3_params(0, cfg)))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(1, 100, 3, 308, 406)).astype(np.float32))
    kps = jnp.asarray(
        np.stack(
            [rng.uniform(8, 398, (100, 400)), rng.uniform(8, 300, (100, 400))], axis=-1
        ).astype(np.float32)
    )
    for refine, label in ((None, "chunk step (no refinement)"),
                          ((10, 3, 4, 0.5), "chunk step + ZNCC obs refinement")):
        step = make_chunk_step(cfg, jnp.bfloat16, 0.1, 0.03, True, refine_obs=refine)
        out = step(params, imgs, kps)
        drain(out["camera_poses"])
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = step(params, imgs, kps)
        drain(out["camera_poses"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:55s} {dt * 1e3:9.1f} ms = {100 / dt:.2f} FPS")


def bench_kv_accuracy():
    """Output deltas of --global-kv-merge vs exact attention on the SAME
    weights (pass PI3_WEIGHTS=converted.npz to measure a real checkpoint —
    the number that matters before enabling the feature; random weights
    only sanity-check the plumbing). Reports pose rotation angle diff,
    camera-center RMSE (scene-normalized), and point RMSE."""
    import os

    import dataclasses

    from pi3_slam_tpu.models import Pi3Config, pi3_forward, init_pi3_params
    from pi3_slam_tpu.models.convert import load_pi3_checkpoint
    from pi3_slam_tpu.utils.precision import cast_tree_bf16_host

    wpath = os.environ.get("PI3_WEIGHTS")
    if wpath:
        # load_pi3_checkpoint (not load_params_npz): pops the embedded
        # '_pi3_config_json' self-description leaf (a unicode array that
        # device_put rejects) and returns the checkpoint's own config.
        params, base_cfg = load_pi3_checkpoint(wpath)
        base_cfg = base_cfg or Pi3Config()
    else:
        params, base_cfg = init_pi3_params(0, Pi3Config()), Pi3Config()
    params = jax.device_put(cast_tree_bf16_host(params))
    rng = np.random.default_rng(0)
    n = int(os.environ.get("PI3_KV_FRAMES", "20"))
    imgs = jnp.asarray(rng.uniform(size=(1, n, 3, 154, 210)).astype(np.float32))
    outs = {}
    for m in (1, int(os.environ.get("PI3_KV_MERGE", "2"))):
        cfg = dataclasses.replace(base_cfg, global_kv_merge=m)
        f = jax.jit(lambda p, x, c=cfg: pi3_forward(p, x, c, compute_dtype=jnp.bfloat16))
        outs[m] = {k: np.asarray(v) for k, v in f(params, imgs).items()}
    a, b = outs[1], outs[list(outs)[-1]]
    ra = a["camera_poses"][0, :, :3, :3]
    rb = b["camera_poses"][0, :, :3, :3]
    tr = np.clip((np.einsum("nij,nij->n", ra, rb) - 1) / 2, -1, 1)
    ang = np.degrees(np.arccos(tr)).max()
    span = np.linalg.norm(
        a["camera_poses"][0, :, :3, 3].max(0) - a["camera_poses"][0, :, :3, 3].min(0)
    )
    c_rmse = np.sqrt(((a["camera_poses"][0, :, :3, 3] - b["camera_poses"][0, :, :3, 3]) ** 2).mean())
    p_rmse = np.sqrt(((a["points"] - b["points"]) ** 2).mean())
    print(
        f"kv-merge accuracy vs exact ({'real' if wpath else 'RANDOM'} weights, {n} frames): "
        f"max pose angle diff {ang:.3f} deg, center RMSE {c_rmse:.4g} "
        f"({c_rmse / max(span, 1e-9):.2%} of trajectory span), point RMSE {p_rmse:.4g}"
    )


def bench_tsdf():
    """TSDF fusion at eval scale (mapping/tsdf.py): 100 stride-2 dense
    frames into a ~189^3 grid, device-resident state, chained iterations.
    PI3_TSDF_VOXELS overrides the grid target (default 192)."""
    from pi3_slam_tpu.mapping.tsdf import _fuse_frames

    rng = np.random.default_rng(0)
    F, H, W = 100, 154, 203
    n = int(os.environ.get("PI3_TSDF_VOXELS", "189"))
    V = n**3
    state = (
        jnp.ones(V, jnp.float32),
        jnp.zeros(V, jnp.float32),
        jnp.zeros((V, 3), jnp.float32),
    )
    frames = (
        jnp.asarray(rng.uniform(1, 4, (F, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.2, 1, (F, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (F, H, W, 3)).astype(np.float32)),
        jnp.asarray(np.tile(np.array([200.0, 200.0, W / 2, H / 2], np.float32), (F, 1))),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))),
        jnp.asarray(rng.uniform(-0.2, 0.2, (F, 3)).astype(np.float32)),
    )
    args = (
        jnp.asarray(np.float32([-3, -3, -3])), jnp.float32(0.032),
        jnp.float32(0.128), jnp.float32(0.25), jnp.float32(1e-3),
        jnp.float32(1e4), (n, n, n), H, W,
    )
    s = _fuse_frames(state, frames, *args)
    drain(s[0])
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        s = _fuse_frames(s, frames, *args)
    drain(s[0])
    per = (time.perf_counter() - t0) / iters
    print(
        f"tsdf fuse {n}^3 x {F} frames: {per:.3f}s/chunk -> {F / per:.1f} "
        f"fusion-FPS, {V * F / per / 1e9:.2f} Gvoxel-updates/s"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices())
    if which in ("global", "all"):
        bench_global()
    if which in ("frame", "all"):
        bench_frame()
    if which in ("block", "all"):
        bench_block()
    if which in ("packed", "all"):
        bench_packed()
    if which in ("stages", "all"):
        bench_stages()
    if which in ("mlp", "all"):
        bench_mlp()
    if which == "mlp-sweep":
        bench_mlp(sweep=True)
    if which == "sol":
        bench_sol()
    if which in ("forward", "all"):
        bench_forward()
    if which == "refine":
        bench_refine()
    if which == "kv-accuracy":
        bench_kv_accuracy()
    if which == "tsdf":
        bench_tsdf()
