"""Full-stack offline-pipeline smoke on the ACTIVE jax backend.

The CPU test suite (tests/conftest.py) can only exercise the pipeline on the
CPU backend; this tool runs the real CLIs — the same entry points a user
runs (reference workflow: slam/offline_chunk_creator.py + reconstruct
scripts) — end-to-end on whatever backend `jax.devices()` resolves to, so
TPU-only defects (layouts, Pallas paths, precision contexts) surface before
a release:

  create_offline_chunks.py   (ALIKED random weights or grid keypoints,
                              --refine-observations, --save-dense)
    -> reconstruct_offline.py (prior BA, --loop-closure, --save-colmap,
                               --export-mesh --save-volume --render-previews)
    -> artifact checks        (chunks+manifest, TUM, PLY, COLMAP text model,
                               mesh PLY, TSDF npz, preview PNGs)

Weights are random (`init_pi3_params` / `init_aliked_params` — no egress),
so the geometry is noise; what this validates is that every stage executes
and produces well-formed artifacts on the target backend. Exits nonzero on
the first failing stage.

Usage: python tools/smoke_e2e.py [--workdir DIR] [--keypoints aliked|grid]
       [--frames 21] [--chunk-length 8] [--overlap 3] [--pixel-limit 21000]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def make_frames(d: str, n: int, height: int = 240, width: int = 320) -> None:
    """Textured frames with a sliding crop so overlap frames correlate."""
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (height, width * 2, 3)).astype(np.uint8)
    for i in range(n):
        off = (5 * i) % width
        Image.fromarray(base[:, off : off + width]).save(
            os.path.join(d, f"frame_{i:05d}.png")
        )


def save_random_weights(work: str, keypoints: str) -> tuple:
    from pi3_slam_tpu.models import Pi3Config, init_pi3_params
    from pi3_slam_tpu.models.convert import save_params_npz

    pi3_path = os.path.join(work, "pi3_random.npz")
    save_params_npz(pi3_path, init_pi3_params(0, Pi3Config()))
    aliked_path = None
    if keypoints == "aliked":
        from pi3_slam_tpu.models.aliked import init_aliked_params

        aliked_path = os.path.join(work, "aliked_random.npz")
        save_params_npz(aliked_path, init_aliked_params(0))
    return pi3_path, aliked_path


def run_stage(name: str, cmd: list, timeout: float | None = None) -> float:
    t0 = time.time()
    print(f"[smoke] {name}: {' '.join(cmd)}", flush=True)
    try:
        r = subprocess.run(cmd, cwd=ROOT, timeout=timeout)
    except subprocess.TimeoutExpired:
        # the axon TPU tunnel sporadically crawls or hangs; a stuck device
        # call must fail the smoke run, not block it forever
        print(f"[smoke] FAIL {name} (timeout after {timeout:.0f}s)", flush=True)
        sys.exit(1)
    dt = time.time() - t0
    if r.returncode != 0:
        print(f"[smoke] FAIL {name} (rc={r.returncode}, {dt:.1f}s)", flush=True)
        sys.exit(1)
    print(f"[smoke] OK {name} ({dt:.1f}s)", flush=True)
    return dt


def check(path: str, what: str, min_bytes: int = 1) -> None:
    ok = os.path.exists(path) and os.path.getsize(path) >= min_bytes
    if not ok:
        print(f"[smoke] FAIL artifact missing/empty: {what} ({path})")
        sys.exit(1)
    print(f"[smoke] OK artifact {what}: {os.path.getsize(path)} B")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keypoints", default="aliked", choices=["aliked", "grid"])
    ap.add_argument("--frames", type=int, default=21)
    ap.add_argument("--chunk-length", type=int, default=8)
    ap.add_argument("--overlap", type=int, default=3)
    ap.add_argument("--pixel-limit", type=int, default=21000)
    ap.add_argument("--skip-refine", action="store_true",
                    help="skip --refine-observations (halves creator compile time)")
    ap.add_argument("--device", default="tpu",
                    help="'tpu' (default backend) or 'cpu', passed to both CLIs")
    ap.add_argument("--stage-timeout", type=float, default=2400.0,
                    help="per-stage wall-clock limit in seconds (fresh TPU "
                         "compiles through the remote tunnel take minutes; "
                         "a hung tunnel call fails the stage instead of "
                         "blocking forever)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the auto-created workdir on success (an "
                         "explicit --workdir is always kept)")
    args = ap.parse_args()

    import jax

    # The parent process only inits + saves random weights; keep it off the
    # device (on the axon remote backend per-leaf device ops cost seconds).
    # JAX_PLATFORMS=cpu as an env var is overridden by the axon plugin, so
    # force it in-process before first device use.
    jax.config.update("jax_platforms", "cpu")
    print(f"[smoke] CLI device: {args.device} (parent pinned to cpu)")

    auto_workdir = args.workdir is None
    work = args.workdir or tempfile.mkdtemp(prefix="pi3_smoke_")
    os.makedirs(work, exist_ok=True)
    frames_dir = os.path.join(work, "frames")
    chunks_dir = os.path.join(work, "chunks")
    recon_dir = os.path.join(work, "recon")
    make_frames(frames_dir, args.frames)
    pi3_path, aliked_path = save_random_weights(work, args.keypoints)

    py = sys.executable
    create_cmd = [
        py, "create_offline_chunks.py",
        "--images", frames_dir,
        "--model-path", pi3_path,
        "--output", chunks_dir,
        "--chunk-length", str(args.chunk_length),
        "--overlap", str(args.overlap),
        "--pixel-limit", str(args.pixel_limit),
        "--no-metric-depth",
        "--device", args.device,
        "--keypoints", args.keypoints,
        "--max-kp", "64",
        "--save-dense", "--dense-stride", "2",
    ]
    if not args.skip_refine:
        create_cmd += ["--refine-observations", "--refine-max-observations", "4"]
    if aliked_path:
        create_cmd += ["--aliked-path", aliked_path, "--kp-threshold", "-1.0"]
    run_stage("create_offline_chunks", create_cmd, timeout=args.stage_timeout)

    manifest_path = os.path.join(chunks_dir, "chunks_manifest.json")
    check(manifest_path, "chunk manifest")
    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
        n_chunks = len(manifest["chunks"]) if isinstance(manifest, dict) else len(manifest)
    except (json.JSONDecodeError, KeyError, TypeError) as e:
        print(f"[smoke] FAIL bad manifest ({manifest_path}: {e})")
        sys.exit(1)
    print(f"[smoke] {n_chunks} chunks created")

    recon_cmd = [
        py, "reconstruct_offline.py",
        "--chunks", chunks_dir,
        "--output", recon_dir,
        "--device", args.device,
        "--max-observations-per-track", "4",
        "--ba-iterations", "4",
        "--loop-closure", "--loop-min-inliers", "8",
        "--save-colmap",
        "--export-mesh", "--mesh-voxel-size", "0.08",
        "--mesh-conf-threshold", "0.0",
        "--save-volume", "--render-previews", "2",
    ]
    run_stage("reconstruct_offline", recon_cmd, timeout=args.stage_timeout)

    check(os.path.join(recon_dir, "trajectory_tum.txt"), "TUM trajectory")
    check(os.path.join(recon_dir, "final_points.ply"), "point cloud PLY")
    check(os.path.join(recon_dir, "final_camera_poses.ply"), "camera PLY")
    for f in ("cameras.txt", "images.txt", "points3D.txt"):
        check(os.path.join(recon_dir, "colmap", f), f"colmap/{f}")
    check(os.path.join(recon_dir, "fused_mesh.ply"), "fused mesh PLY")
    check(os.path.join(recon_dir, "fused_volume.npz"), "TSDF volume")
    pdir = os.path.join(recon_dir, "mesh_previews")
    previews = (
        [f for f in os.listdir(pdir) if f.endswith(".png")]
        if os.path.isdir(pdir)
        else []
    )
    if not previews:
        print("[smoke] FAIL no raycast preview images found")
        sys.exit(1)
    print(f"[smoke] OK {len(previews)} raycast previews")
    if auto_workdir and not args.keep:
        # frames + chunks + dense maps + TSDF volume add up; don't let
        # repeated smoke runs accumulate temp dirs (kept on failure above,
        # since every FAIL path exits before reaching this)
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        work += " (removed; rerun with --keep to retain)"
    print(f"[smoke] ALL STAGES PASSED (workdir {work})")


if __name__ == "__main__":
    main()
