"""Irreducible cost of the online mode's CPU SfM chain at eval scale.

The online loop's steady period is max(device forward+pull, build, finish)
where build = materialize + per-chunk BA reconstruction and finish = Sim3
alignment (+ refine BA) — both on the pinned host CPU backend (sfm/device.py).
This probe times the two CPU stages SOLO (no pipeline, no device, no
contention) on the exact eval-scale shapes (chunk 100 / overlap 20 / 400 kp,
reference scripts/eval_7scenes.sh:59-181) and reports:

  * per-chunk reconstruction (build_chunk_reconstruction, ba_iterations=10,
    ftol=1e-6) and alignment (align_chunks, refine_iterations=50) seconds,
    first chunk separated (it carries the CPU jit compiles);
  * the BA iteration count each solve actually executed (sfm.reconstruction.
    last_ba_info) — whether Ceres-style function_tolerance early stop fires
    at eval scale (VERDICT r4 item 2's explicit question);
  * the implied steady-state FPS ceiling of the CPU chain on this host:
    new-frames-per-chunk / max(recon, align) when build/finish overlap on
    spare cores, and / (recon + align) on a single-core host (this machine),
    which is the honest pipeline bound here.

Prints ONE JSON line. Chunks come from the same synthetic eval-scale scene
generator the system APE gates use (tests/test_system_ape.py), with
confidence-correlated outliers — the error structure the pruning actually
works against, so the BA/prune timings are load-realistic.

Usage: python tools/perf_online_floor.py [--chunks 5] [--frames-per 100]
       [--kp 400] [--overlap 20]
"""

import argparse
import glob
import json
import os
import pathlib
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=5)
    ap.add_argument("--frames-per", type=int, default=100)
    ap.add_argument("--kp", type=int, default=400)
    ap.add_argument("--overlap", type=int, default=20)
    args = ap.parse_args()

    from pi3_slam_tpu.utils.precision import select_platform

    select_platform("cpu")

    import numpy as np

    from test_system_ape import write_synthetic_chunks

    from pi3_slam_tpu.sfm import reconstruction as sfm_recon
    from pi3_slam_tpu.sfm.alignment import align_chunks
    from pi3_slam_tpu.slam.offline_reconstructor import load_chunk_npz

    stride = args.frames_per - args.overlap
    n_frames = stride * (args.chunks - 1) + args.frames_per
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        # same scene parameters as the eval-scale system APE gate
        # (tests/test_system_ape.py::test_offline_chain_ape_gate_eval_scale)
        write_synthetic_chunks(
            pathlib.Path(td), rng, n_frames=n_frames, n_landmarks=5000,
            chunk_length=args.frames_per, overlap=args.overlap, n_kp=args.kp,
            noise_px=0.4, step=0.08, yaw_rate=0.0007, conf_outliers=True,
        )
        paths = sorted(glob.glob(os.path.join(td, "chunks", "*.npz")))
        recon_s, align_s, ba_iters = [], [], []
        prev = None
        for p in paths:
            chunk = load_chunk_npz(p)
            t0 = time.perf_counter()
            recon = sfm_recon.build_chunk_reconstruction(chunk)
            recon_s.append(time.perf_counter() - t0)
            info = sfm_recon.last_ba_info()
            ba_iters.append(info["iterations"] if info else None)
            if prev is not None:
                t0 = time.perf_counter()
                align_chunks(prev, recon)
                align_s.append(time.perf_counter() - t0)
            prev = recon

    if args.chunks < 3:
        raise SystemExit("--chunks must be >= 3 (chunk 0 carries the CPU jit "
                         "compiles and is excluded from the steady medians)")
    steady_recon = float(np.median(recon_s[1:]))
    steady_align = float(np.median(align_s[1:]))
    print(
        json.dumps(
            {
                "metric": "online_cpu_chain_floor",
                "recon_s_per_chunk": [round(s, 2) for s in recon_s],
                "align_s_per_chunk": [round(s, 2) for s in align_s],
                "ba_iterations": ba_iters,
                "ba_max_iterations": 10,
                "steady_recon_s": round(steady_recon, 2),
                "steady_align_s": round(steady_align, 2),
                "new_frames_per_chunk": stride,
                "fps_ceiling_two_stage": round(
                    stride / max(steady_recon, steady_align), 2
                ),
                "fps_ceiling_single_core": round(
                    stride / (steady_recon + steady_align), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
