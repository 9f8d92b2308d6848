"""A/B the observation-fan policy on the eval-scale synthetic system gate.

The reference projects every track into ALL earlier frames regardless of
max_observations_per_track (utils/chunk_reconstruction.py:163-185); our
default evenly subsamples earlier frames so the padded observation width M
stays at max_observations_per_track (fixed shapes for the batched Schur
solver). This tool measures what that deviation costs/buys: Sim3-aligned APE
and reconstruction wall time for both policies on the eval-shaped synthetic
scene (5 chunks x 100 frames x 400 keypoints, overlap 20,
confidence-correlated outliers, per-chunk scale drift —
tests/test_system_ape.py::test_offline_chain_ape_gate_eval_scale).

Usage: python tools/ablate_observation_fan.py [--ba-iterations 10]
       [--refine-iterations 50] [--max-obs 10] [--seeds 0 1 2] [--quick]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # solver A/B: CPU is the online default


def run_mode(tmp, fan, gt_centers, args):
    from pi3_slam_tpu.slam import OfflineReconstructor, ReconstructorConfig
    from pi3_slam_tpu.utils.evaluation import ape_translation
    from pi3_slam_tpu.io import read_tum_trajectory

    out_dir = os.path.join(tmp, f"recon_{fan}")
    rec = OfflineReconstructor(
        ReconstructorConfig(
            chunk_dir=tmp,
            output_dir=out_dir,
            max_observations_per_track=args.max_obs,
            observation_fan=fan,
            ba_iterations=args.ba_iterations,
            align_refine_iterations=args.refine_iterations,
        )
    )
    t0 = time.time()
    result = rec.run()
    dt = time.time() - t0
    traj = read_tum_trajectory(result["artifacts"]["trajectory"])
    ape = ape_translation(gt_centers, traj["positions"], align_sim3=True)
    n_align = len(result["alignment"])
    ok = sum(1 for a in result["alignment"] if a.success)
    return {"fan": fan, "ape_rmse_m": float(ape.rmse), "recon_seconds": dt,
            "alignments_ok": f"{ok}/{n_align}"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ba-iterations", type=int, default=10)
    ap.add_argument("--refine-iterations", type=int, default=50)
    ap.add_argument("--max-obs", type=int, default=10)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--quick", action="store_true",
                    help="small scene (14 frames / 3 chunks) for a fast check")
    args = ap.parse_args()

    from pathlib import Path

    from test_system_ape import write_synthetic_chunks  # tests/ oracle scene

    rows = []
    for seed in args.seeds:
        tmp = tempfile.mkdtemp(prefix="pi3_fan_ablate_")
        rng = np.random.default_rng(seed)
        if args.quick:
            gt_centers = write_synthetic_chunks(Path(tmp), rng)
        else:
            gt_centers = write_synthetic_chunks(
                Path(tmp), rng, n_frames=420, n_landmarks=5000, chunk_length=100,
                overlap=20, n_kp=400, noise_px=0.4, step=0.08, yaw_rate=0.0007,
                conf_outliers=True,
            )
        for fan in ("subsampled", "unbounded"):
            r = run_mode(tmp, fan, gt_centers, args)
            r["seed"] = seed
            rows.append(r)
            print(f"seed {seed} {fan:11s}: APE {r['ape_rmse_m']:.4f} m, "
                  f"recon {r['recon_seconds']:.1f}s, align {r['alignments_ok']}",
                  flush=True)
        shutil.rmtree(tmp, ignore_errors=True)

    print("\n=== summary (mean over seeds; warm = first seed dropped, its run "
          "pays each mode's BA/alignment compiles) ===")
    for fan in ("subsampled", "unbounded"):
        sel = [r for r in rows if r["fan"] == fan]
        warm = sel[1:] if len(sel) > 1 else sel
        ape = float(np.mean([r["ape_rmse_m"] for r in sel]))
        dt = float(np.mean([r["recon_seconds"] for r in warm]))
        print(f"{fan:11s}: APE {ape:.4f} m, warm recon {dt:.1f}s")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
