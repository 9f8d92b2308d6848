#!/usr/bin/env python
"""Raycast depth/normal renders of a saved TSDF volume (--save-volume).

  python tools/render_tsdf.py --volume out/fused_volume.npz \
      --trajectory out/trajectory_tum.txt --views 6 --output renders/

Renders from evenly spaced trajectory poses (TUM camera-to-world), or
from an orbit around the volume center when no trajectory is given.
Companion to reconstruct_offline --render-previews for volumes persisted
with --save-volume — no re-fusing needed (mapping/raycast.py).
"""

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--volume", required=True, help="fused_volume.npz")
    parser.add_argument("--trajectory", default=None,
                        help="TUM trajectory; evenly spaced poses are rendered "
                             "(default: an orbit around the volume)")
    parser.add_argument("--views", type=int, default=6)
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--output", default="tsdf_renders")
    args = parser.parse_args(argv)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import numpy as np

    from pi3_slam_tpu.mapping import TSDFVolume, raycast_depth

    volume = TSDFVolume.load(args.volume)
    h, w = args.height, args.width
    intr = np.array([0.8 * w, 0.8 * w, w / 2, h / 2])

    poses = []  # (R world->cam, center)
    if args.trajectory:
        import jax.numpy as jnp

        from pi3_slam_tpu.geometry import quaternion_to_rotation_matrix
        from pi3_slam_tpu.io.tum import read_tum_trajectory

        traj = read_tum_trajectory(args.trajectory)
        q = traj["quaternions_xyzw"]
        R_cw = np.asarray(  # camera-to-world from TUM xyzw -> wxyz
            quaternion_to_rotation_matrix(jnp.asarray(q[:, [3, 0, 1, 2]]))
        )
        pick = np.linspace(0, len(R_cw) - 1, min(args.views, len(R_cw))).astype(int)
        for i in pick:
            poses.append((R_cw[i].T, traj["positions"][i]))
    else:
        center = volume.origin + np.array(volume.shape) * volume.voxel_size / 2
        radius = 0.8 * float(np.max(volume.shape)) * volume.voxel_size
        for k in range(args.views):
            ang = 2 * np.pi * k / args.views
            c = center + radius * np.array([np.cos(ang), np.sin(ang), 0.3])
            z = center - c
            z = z / np.linalg.norm(z)
            up = np.array([0.0, 0.0, 1.0])
            x = np.cross(up, z)
            x = x / max(np.linalg.norm(x), 1e-9)
            y = np.cross(z, x)
            poses.append((np.stack([x, y, z]), c))

    from PIL import Image

    os.makedirs(args.output, exist_ok=True)
    for j, (R, c) in enumerate(poses):
        out = raycast_depth(volume, intr, R, c, h, w)
        d = out["depth"]
        hi = np.percentile(d[out["mask"]], 98) if out["mask"].any() else 1.0
        depth_img = np.where(
            out["mask"], np.clip(d / max(hi, 1e-9), 0, 1) * 255, 0
        ).astype(np.uint8)
        normal_img = ((out["normals"] * 0.5 + 0.5) * 255).astype(np.uint8)
        normal_img[~out["mask"]] = 0
        Image.fromarray(depth_img).save(os.path.join(args.output, f"depth_{j:03d}.png"))
        Image.fromarray(normal_img).save(os.path.join(args.output, f"normal_{j:03d}.png"))
        print(f"view {j}: {out['mask'].mean():.0%} hit -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
