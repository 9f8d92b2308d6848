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


def ape_bridge(merges=(2, 4), sharpen=8.0, seed=0, n_frames=16,
               chunk_length=8, overlap=3, workdir=None, quiet=False):
    """Task-level bridge: forward drift -> trajectory APE.

    Runs the FULL online pipeline (Pi3SLAMOnline: chunk steps, per-chunk BA,
    Sim3 alignment chain) on the same correlated video-like frames with
    global_kv_merge in {1, *merges} and identical sharpened random weights,
    then scores each merged trajectory against the exact (merge=1) one with
    the Sim3-aligned APE used by the eval scripts. Point/rotation drift is
    the mechanism; APE is what users of --global-kv-merge actually pay.
    Returns a list of {merge, ape_m, ape_rel_span} rows (span = exact
    trajectory path length). Real-checkpoint validation remains
    environment-blocked (no weights reachable); these numbers bound the
    ARCHITECTURE-level task impact only — see the module docstring caveat.
    """
    import shutil
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from test_pi3_model import TINY, make_tiny_params

    from pi3_slam_tpu.slam.online import OnlineConfig, Pi3SLAMOnline
    from pi3_slam_tpu.utils.evaluation import ape_translation

    h, w = 42, 56
    rng = np.random.default_rng(1000 + seed)
    frames = make_video_frames(rng, n_frames, h, w)[0]  # (N, 3, h, w)
    params = sharpen_params(make_tiny_params(seed), sharpen)

    work = workdir or tempfile.mkdtemp(prefix="kv_ape_")
    img_dir = os.path.join(work, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    paths = []
    for i, f in enumerate(frames):
        p = os.path.join(img_dir, f"frame_{i:04d}.png")
        Image.fromarray(
            (f.transpose(1, 2, 0) * 255).clip(0, 255).astype(np.uint8)
        ).save(p)
        paths.append(p)

    trajs = {}
    for m in [1] + [m for m in merges if m != 1]:
        cfg = OnlineConfig(
            chunk_length=chunk_length, overlap=overlap, pixel_limit=h * w,
            use_metric_depth=False, max_keypoints=32, compute_dtype="float32",
            output_dir=os.path.join(work, f"out_m{m}"), global_kv_merge=m,
        )
        slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
        slam.params = params
        slam._make_steps()
        slam.process_image_paths(paths)
        trajs[m] = slam._merged_trajectory()[0]

    exact = trajs[1]
    span = float(np.linalg.norm(np.diff(exact, axis=0), axis=1).sum()) + 1e-12
    rows = []
    for m in merges:
        ape = ape_translation(exact, trajs[m], align_sim3=True)
        rows.append({
            "merge": int(m), "sharpen": float(sharpen), "seed": int(seed),
            "ape_m": float(ape.rmse), "ape_rel_span": float(ape.rmse / span),
        })
        if not quiet:
            print(f"kv-merge m={m} sharpen {sharpen:g}: APE-vs-exact "
                  f"{ape.rmse:.5f} (span {span:.3f}, rel {ape.rmse / span:.4f})",
                  flush=True)
    if workdir is None:
        shutil.rmtree(work, ignore_errors=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--merges", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--frames", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--sharpen", type=float, nargs="+", default=[1.0, 8.0])
    ap.add_argument("--full", action="store_true",
                    help="real Pi3 size on the default backend")
    ap.add_argument("--ape", action="store_true",
                    help="task-level bridge: run the full online pipeline per "
                         "merge factor and report trajectory APE vs exact")
    args = ap.parse_args()

    if args.ape:
        rows = []
        for seed in args.seeds:
            for s in args.sharpen:
                rows += ape_bridge(merges=args.merges, sharpen=s, seed=seed)
        print("\n=== APE-vs-exact median over seeds ===")
        for s in args.sharpen:
            for m in args.merges:
                sel = [r for r in rows if r["merge"] == m and r["sharpen"] == s]
                if sel:
                    print(f"sharpen {s:g} m={m}: APE "
                          f"{np.median([r['ape_m'] for r in sel]):.5f}  "
                          f"rel-span {np.median([r['ape_rel_span'] for r in sel]):.4f}")
        print(json.dumps(rows))
        return

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
