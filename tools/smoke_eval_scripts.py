"""Execute the eval harnesses end to end on synthetic stand-in datasets.

The 7-Scenes / EuRoC eval scripts (scripts/eval_7scenes.sh:43-89,
scripts/eval_euroc.sh:36-76 — rebuilt from the reference
scripts/eval_7scenes.sh:59-181, eval_euroc.sh:50-119) are the system-level
test the reference relies on, but real datasets are unreachable from this
environment (zero egress). This smoke fabricates dataset-shaped stand-ins —

  7-Scenes:  <root>/<scene>/seq-01/frame-XXXXXX.color.png + .pose.txt
  EuRoC:     <root>/<seq>/mav0/cam0/data/<ns>.png +
             mav0/state_groundtruth_estimate0/data.csv + fisheye-family calib

— and runs the shell scripts UNMODIFIED (DEVICE=cpu, tiny chunk config via
their env knobs) with random Pi3 weights. The gate is plumbing, not accuracy:
script exit 0, per-scene "APE RMSE" lines with finite values for >= 2 scenes,
the mean summary line, and the EuRoC start-frame skip-table path (MH_03 ->
skip 400) + calib undistortion actually exercised.

Usage: python tools/smoke_eval_scripts.py [--workdir DIR] [--keep]
       [--stage-timeout SECS] [--only 7scenes|euroc]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def fail(msg: str) -> None:
    print(f"[smoke] FAIL {msg}", flush=True)
    sys.exit(1)


def make_textured_frames(paths, height: int, width: int) -> None:
    """Sliding crops of one texture so overlap frames correlate."""
    from PIL import Image

    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (height, width * 2, 3)).astype(np.uint8)
    for i, p in enumerate(paths):
        off = (3 * i) % width
        Image.fromarray(base[:, off : off + width]).save(p)


def smooth_poses(n: int) -> np.ndarray:
    """(n, 4, 4) cam-to-world: forward motion with slight yaw."""
    poses = np.zeros((n, 4, 4))
    for i in range(n):
        yaw = 0.02 * i
        c, s = np.cos(yaw), np.sin(yaw)
        poses[i] = np.eye(4)
        poses[i, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[i, :3, 3] = [0.05 * i, 0.01 * np.sin(0.3 * i), 0.02 * i]
    return poses


def make_7scenes(root: str, scenes, n_frames: int, h: int, w: int) -> None:
    for scene in scenes:
        seq = os.path.join(root, scene, "seq-01")
        os.makedirs(seq, exist_ok=True)
        make_textured_frames(
            [os.path.join(seq, f"frame-{i:06d}.color.png") for i in range(n_frames)], h, w
        )
        for i, pose in enumerate(smooth_poses(n_frames)):
            np.savetxt(os.path.join(seq, f"frame-{i:06d}.pose.txt"), pose)


def make_euroc(root: str, seq: str, n_frames: int, h: int, w: int) -> str:
    """EuRoC-shaped sequence + calib JSON; returns the calib path."""
    mav0 = os.path.join(root, seq, "mav0")
    data_dir = os.path.join(mav0, "cam0", "data")
    os.makedirs(data_dir, exist_ok=True)
    t0 = 1403636579763555584  # EuRoC-style ns epoch
    dt = 50_000_000  # 20 Hz
    frame_ts = [t0 + i * dt for i in range(n_frames)]
    make_textured_frames([os.path.join(data_dir, f"{t}.png") for t in frame_ts], h, w)

    # ground truth at 200 Hz bracketing the frame span (make_euroc_gt.py
    # interpolates and needs coverage on both sides of every frame time)
    gt_dir = os.path.join(mav0, "state_groundtruth_estimate0")
    os.makedirs(gt_dir, exist_ok=True)
    gt_t = np.arange(t0 - 10 * dt, frame_ts[-1] + 10 * dt, dt // 10, dtype=np.int64)
    poses = smooth_poses(len(gt_t))
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
        for t, pose in zip(gt_t, poses):
            R = pose[:3, :3]
            qw = 0.5 * np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2]))
            qx = (R[2, 1] - R[1, 2]) / (4 * qw)
            qy = (R[0, 2] - R[2, 0]) / (4 * qw)
            qz = (R[1, 0] - R[0, 1]) / (4 * qw)
            p = pose[:3, 3]
            f.write(f"{t},{p[0]},{p[1]},{p[2]},{qw},{qx},{qy},{qz}\n")

    calib_path = os.path.join(root, "cam0_calib.json")
    with open(calib_path, "w") as f:
        json.dump(
            {
                "image_height": h,
                "image_width": w,
                "intrinsic_type": "PINHOLE_RADIAL_TANGENTIAL",
                "intrinsics": {
                    "aspect_ratio": 1.0,
                    "focal_length": 0.7 * w,
                    "principal_pt_x": w / 2 + 1.0,
                    "principal_pt_y": h / 2 - 1.0,
                    "radial_distortion_1": -0.05,
                    "radial_distortion_2": 0.01,
                    "radial_distortion_3": 0.0,
                    "tangential_distortion_1": 1e-4,
                    "tangential_distortion_2": 1e-4,
                    "skew": 0.0,
                },
            },
            f,
            indent=2,
        )
    return calib_path


def run_script(name: str, cmd, env_extra: dict, timeout: float) -> str:
    env = dict(os.environ, **env_extra)
    print(f"[smoke] {name}: {' '.join(cmd)}  env={env_extra}", flush=True)
    t0 = time.time()
    try:
        r = subprocess.run(
            cmd, cwd=ROOT, env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
    except subprocess.TimeoutExpired:
        fail(f"{name} timeout after {timeout:.0f}s")
    sys.stdout.write(r.stdout)
    dt = time.time() - t0
    if r.returncode != 0:
        fail(f"{name} (rc={r.returncode}, {dt:.1f}s)")
    print(f"[smoke] OK {name} ({dt:.1f}s)", flush=True)
    return r.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--stage-timeout", type=float, default=3600.0)
    ap.add_argument("--only", default=None, choices=["7scenes", "euroc"])
    ap.add_argument("--frames", type=int, default=14, help="frames per scene/sequence")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # parent stays off the TPU tunnel

    auto_workdir = args.workdir is None
    work = args.workdir or tempfile.mkdtemp(prefix="pi3_eval_smoke_")
    os.makedirs(work, exist_ok=True)
    h, w = 120, 160

    print("[smoke] random Pi3 weights...", flush=True)
    from pi3_slam_tpu.models import Pi3Config, init_pi3_params
    from pi3_slam_tpu.models.convert import save_pi3_checkpoint
    from pi3_slam_tpu.models.dinov2 import DinoV2Config

    # small self-described checkpoint (the CLIs size the model from the
    # embedded config — load_pi3_checkpoint): the gate is script PLUMBING,
    # and the full-size model takes ~35 min/scene on this host's CPU
    small = Pi3Config(
        encoder=DinoV2Config(embed_dim=128, depth=4, num_heads=4),
        dec_embed_dim=128, dec_num_heads=4, dec_depth=4,
        head_dim=128, head_num_heads=4, head_depth=2, camera_dim=64,
    )
    pi3_path = os.path.join(work, "pi3_random.npz")
    save_pi3_checkpoint(pi3_path, init_pi3_params(0, small), small)

    tiny_env = {
        "DEVICE": "cpu",
        "CHUNK_LENGTH": "8",
        "OVERLAP": "3",
        "MAX_KP": "64",
        "MAX_OBS": "4",
    }
    ape_re = re.compile(r"APE RMSE: ([0-9.eE+-]+|nan) m")

    if args.only in (None, "7scenes"):
        scenes = ["alpha", "beta"]
        data_root = os.path.join(work, "7scenes")
        make_7scenes(data_root, scenes, args.frames, h, w)
        out = run_script(
            "eval_7scenes.sh",
            ["bash", "scripts/eval_7scenes.sh", data_root, pi3_path, "",
             os.path.join(work, "out_7scenes")],
            dict(tiny_env, SCENES=" ".join(scenes)),
            args.stage_timeout,
        )
        apes = [float(m) for m in ape_re.findall(out)]
        if len(apes) < len(scenes):
            fail(f"expected {len(scenes)} APE lines, got {len(apes)}")
        if not all(np.isfinite(a) for a in apes):
            fail(f"non-finite APE values: {apes}")
        if "mean" not in out:
            fail("no mean summary line")
        print(f"[smoke] OK 7scenes APE values (random weights): {apes}")

    if args.only in (None, "euroc"):
        # MH_03 exercises the start-frame skip table (eval_euroc.sh: 400)
        seq, skip = "MH_03", 400
        data_root = os.path.join(work, "euroc")
        calib = make_euroc(data_root, seq, skip + args.frames, h, w)
        out = run_script(
            "eval_euroc.sh",
            ["bash", "scripts/eval_euroc.sh", data_root, pi3_path, calib, "",
             os.path.join(work, "out_euroc")],
            dict(tiny_env, SEQS=seq),
            args.stage_timeout,
        )
        apes = [float(m) for m in ape_re.findall(out)]
        if len(apes) != 1 or not np.isfinite(apes[0]):
            fail(f"expected 1 finite EuRoC APE line, got {apes}")
        # the skip table must actually have cut the first 400 frames
        nframes_re = re.search(r"(\d+) images", out)
        if nframes_re and int(nframes_re.group(1)) != args.frames:
            fail(f"skip table not applied: {nframes_re.group(1)} frames processed")
        print(f"[smoke] OK euroc APE (random weights): {apes[0]}")

    if auto_workdir and not args.keep:
        shutil.rmtree(work, ignore_errors=True)
        work += " (removed; rerun with --keep to retain)"
    print(f"[smoke] ALL EVAL-SCRIPT STAGES PASSED (workdir {work})")


if __name__ == "__main__":
    main()
