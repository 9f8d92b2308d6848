"""Synthetic drift proxy for --global-kv-merge (the 29-FPS approximation).

global_kv_merge merges m consecutive frames' k/v tokens in the decoder's
global attention (models/pi3.py Pi3Config.global_kv_merge; FastVGGT-style).
No real checkpoint is reachable from this environment, so its accuracy cost
cannot be validated end-to-end — but the ARCHITECTURE-level distortion can be
bounded: run the same random-weight forward exact and merged on video-like
correlated frames and measure how far poses / pointmaps / confidence move,
across merge factors and chunk lengths. This is the proxy published in
PARITY.md next to the FPS claim; tests/test_kv_merge_drift.py pins the bound
so a wiring regression in the merge path (which would silently wreck
accuracy) fails loudly.

MEASURED CAVEAT (and why --sharpen exists): with plain random weights the
attention logits are near zero, softmax is near-uniform, and averaging kv
groups under uniform attention is near-exact BY CONSTRUCTION — measured
drift ~1e-6 regardless of frame correlation, i.e. the naive random proxy
has no teeth. Trained models have sharp attention (that is where merging
bites), so the proxy sharpens the logits by scaling the blocks'
q_norm_scale by --sharpen (default sweep 1 and 8) and reports drift in
both regimes; the sharpened numbers are the published bound.

Usage: python tools/kv_merge_drift.py [--seeds 0 1 2] [--merges 2 4]
       [--frames 8 16] [--sharpen 1 8] [--full]   (--full = real Pi3 size
       on the default backend — minutes per forward on CPU; default tiny)
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np


def make_video_frames(rng, n, h, w):
    """Sliding crops of one smooth texture: consecutive frames are highly
    correlated, the regime the cross-frame kv merge assumes."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(2 * w), indexing="ij")
    base = 0.5 + 0.25 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
    base = np.stack([base, np.roll(base, 3, axis=1), np.roll(base, 7, axis=0)], 0)
    base = base + 0.1 * rng.random((3, h, 2 * w))
    frames = [base[:, :, 3 * i : 3 * i + w] for i in range(n)]
    return np.clip(np.stack(frames)[None], 0.0, 1.0).astype(np.float32)


def sharpen_params(params, s: float):
    """Scale every q_norm_scale leaf by s: logits scale by s, softmax
    sharpens — emulating trained-attention peakiness on random weights."""
    import jax

    if s == 1.0:
        return params

    def visit(path, leaf):
        if any(getattr(k, "key", None) == "q_norm_scale" for k in path):
            return leaf * s
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def drift_metrics(exact, merged):
    """Pose / pointmap / confidence drift between two forward outputs."""
    import jax.nn

    pe = np.asarray(exact["points"], np.float64)
    pm = np.asarray(merged["points"], np.float64)
    scene_scale = float(np.std(pe)) + 1e-12
    point_rel = float(np.median(np.linalg.norm(pm - pe, axis=-1)) / scene_scale)

    Te = np.asarray(exact["camera_poses"], np.float64)[0]
    Tm = np.asarray(merged["camera_poses"], np.float64)[0]
    t_scale = float(np.median(np.linalg.norm(Te[:, :3, 3], axis=-1))) + 1e-12
    trans_rel = float(
        np.median(np.linalg.norm(Tm[:, :3, 3] - Te[:, :3, 3], axis=-1)) / t_scale
    )
    R_rel = np.einsum("nij,nkj->nik", Tm[:, :3, :3], Te[:, :3, :3])
    cos = np.clip((np.trace(R_rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot_deg = float(np.median(np.degrees(np.arccos(cos))))

    ce = 1.0 / (1.0 + np.exp(-np.asarray(exact["conf"], np.float64)))
    cm = 1.0 / (1.0 + np.exp(-np.asarray(merged["conf"], np.float64)))
    conf_mad = float(np.mean(np.abs(cm - ce)))
    return {"point_rel": point_rel, "trans_rel": trans_rel,
            "rot_deg": rot_deg, "conf_mad": conf_mad}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--merges", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--frames", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--sharpen", type=float, nargs="+", default=[1.0, 8.0])
    ap.add_argument("--full", action="store_true",
                    help="real Pi3 size on the default backend")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    if not args.full:
        jax.config.update("jax_platforms", "cpu")
    from pi3_slam_tpu.models import Pi3Config, init_pi3_params, pi3_forward

    if args.full:
        cfg = Pi3Config()
        h, w = 308, 406
        make_params = lambda s: init_pi3_params(s, cfg)
    else:
        from test_pi3_model import TINY, make_tiny_params

        cfg, (h, w) = TINY, (42, 56)
        make_params = make_tiny_params

    fwd = jax.jit(pi3_forward, static_argnames=("cfg",))
    rows = []
    for seed in args.seeds:
        base_params = make_params(seed)
        rng = np.random.default_rng(1000 + seed)
        for sharpen in args.sharpen:
            params = sharpen_params(base_params, sharpen)
            for n in args.frames:
                imgs = jnp.asarray(make_video_frames(rng, n, h, w))
                exact = jax.tree.map(np.asarray, fwd(params, imgs, cfg))
                for m in args.merges:
                    if n % m:
                        continue
                    cfg_m = dataclasses.replace(cfg, global_kv_merge=m)
                    merged = fwd(params, imgs, cfg_m)
                    r = {"seed": seed, "sharpen": sharpen, "frames": n,
                         "merge": m, **drift_metrics(exact, merged)}
                    rows.append(r)
                    print(f"seed {seed} sharpen {sharpen:g} N={n:3d} m={m}: "
                          f"point_rel {r['point_rel']:.4f}  "
                          f"trans_rel {r['trans_rel']:.4f}  rot {r['rot_deg']:.3f} deg  "
                          f"conf_mad {r['conf_mad']:.4f}", flush=True)

    print("\n=== median over seeds ===")
    for sharpen in args.sharpen:
        for n in args.frames:
            for m in args.merges:
                sel = [r for r in rows
                       if r["frames"] == n and r["merge"] == m
                       and r["sharpen"] == sharpen]
                if not sel:
                    continue
                med = {k: float(np.median([r[k] for r in sel]))
                       for k in ("point_rel", "trans_rel", "rot_deg", "conf_mad")}
                print(f"sharpen {sharpen:g} N={n:3d} m={m}: "
                      f"point_rel {med['point_rel']:.4f}  "
                      f"trans_rel {med['trans_rel']:.4f}  rot {med['rot_deg']:.3f} deg  "
                      f"conf_mad {med['conf_mad']:.4f}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
