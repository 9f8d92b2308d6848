#!/usr/bin/env python
"""Build an index-aligned TUM ground-truth trajectory for a EuRoC sequence.

EuRoC ships ground truth as mav0/state_groundtruth_estimate0/data.csv
(timestamp_ns, p_RS_R_{x,y,z}, q_RS_R_{w,x,y,z}, ...). The pipeline's offline
trajectory export uses integer frame indices as timestamps (matching the
reference, slam/offline_reconstructor.py:231-255) — raw nanosecond GT stamps
can never associate with that (the reference ships raw-ns GT files and relies
on manual renumber_tum.sh runs). This tool closes the gap: it interpolates
the GT pose at every cam0 frame time and writes TUM with the SAME integer
indexing the pipeline produces, honoring --skip-start/--skip-end/--stride.

Usage:
  python tools/make_euroc_gt.py <seq>/mav0 gt/MH_01.txt [--skip-start 700]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pure-IO tool: force the CPU backend so importing the package never connects
# to (or waits on) the axon TPU tunnel
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _slerp(q0: np.ndarray, q1: np.ndarray, u: float) -> np.ndarray:
    """Spherical interpolation of two (w, x, y, z) quaternions."""
    d = float(np.dot(q0, q1))
    if d < 0:
        q1 = -q1
        d = -d
    if d > 0.9995:
        q = q0 + u * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - u) * th) * q0 + np.sin(u * th) * q1) / np.sin(th)


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def interpolate_gt(gt_ts, gt_pos, gt_quat, frame_ts):
    """Interpolate GT at frame times; returns (positions, rotations, valid)."""
    pos, rot, valid = [], [], []
    for t in frame_ts:
        j = int(np.searchsorted(gt_ts, t, side="right"))
        if j <= 0 or j >= len(gt_ts):
            pos.append(np.zeros(3))
            rot.append(np.eye(3))
            valid.append(False)
            continue
        t0, t1 = gt_ts[j - 1], gt_ts[j]
        u = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
        pos.append(gt_pos[j - 1] * (1 - u) + gt_pos[j] * u)
        rot.append(_quat_to_rot(_slerp(gt_quat[j - 1], gt_quat[j], float(u))))
        valid.append(True)
    return np.asarray(pos), np.asarray(rot), np.asarray(valid)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mav0", help="Path to the sequence's mav0 directory")
    parser.add_argument("output", help="Output TUM file")
    parser.add_argument("--skip-start", type=int, default=0)
    parser.add_argument("--skip-end", type=int, default=0)
    parser.add_argument("--stride", type=int, default=1)
    args = parser.parse_args(argv)

    csv = os.path.join(args.mav0, "state_groundtruth_estimate0", "data.csv")
    data = np.loadtxt(csv, delimiter=",", skiprows=1, usecols=range(8))
    gt_ts = data[:, 0]
    gt_pos = data[:, 1:4]
    gt_quat = data[:, 4:8]  # (w, x, y, z)

    frames = sorted(glob.glob(os.path.join(args.mav0, "cam0", "data", "*.png")))
    if args.skip_end:
        frames = frames[args.skip_start : len(frames) - args.skip_end]
    elif args.skip_start:
        frames = frames[args.skip_start :]
    frames = frames[:: args.stride]
    if not frames:
        print("no cam0 frames found", file=sys.stderr)
        return 1
    frame_ts = np.array([float(os.path.basename(f).split(".")[0]) for f in frames])

    pos, rot, valid = interpolate_gt(gt_ts, gt_pos, gt_quat, frame_ts)

    from pi3_slam_tpu.io.tum import write_tum_trajectory

    # integer indices matching the pipeline's export; frames without GT
    # coverage (sequence start before GT) keep their index but are dropped
    idx = np.flatnonzero(valid)
    write_tum_trajectory(
        args.output, pos[idx], rot[idx], timestamps=[float(i) for i in idx]
    )
    print(f"wrote {idx.size}/{len(frames)} GT poses -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
