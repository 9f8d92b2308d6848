#!/usr/bin/env python
"""CLI: reconstruct from saved chunks (per-chunk BA + Sim3 chaining + export).

Drop-in equivalent of the reference reconstruct_offline.py.
"""

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--chunks", required=True, help="Directory containing chunk_*.npz files")
    parser.add_argument("--output", default=None, help="Directory to write reconstruction outputs")
    parser.add_argument("--chunk-length", type=int, default=None)
    parser.add_argument("--overlap", type=int, default=None)
    parser.add_argument("--max-observations-per-track", type=int, default=5)
    parser.add_argument("--observation-fan", default="subsampled",
                        choices=["subsampled", "unbounded"],
                        help="'subsampled': earlier frames evenly subsampled to "
                             "the max-observations budget (fixed solver shapes). "
                             "'unbounded': the reference's literal fan — every "
                             "track observed in ALL earlier frames (bigger BA "
                             "problem; see PARITY.md for the measured A/B)")
    parser.add_argument("--use-inverse-depth", action="store_true")
    parser.add_argument("--ba-iterations", type=int, default=10)
    parser.add_argument("--save-per-chunk", action="store_true",
                        help="Save per-chunk reconstruction .npz files (.sfm analog)")
    parser.add_argument("--device", default="tpu",
                        help="'tpu' (default backend) or 'cpu' to force the CPU backend")
    parser.add_argument("--telemetry", default=None,
                        help="Telemetry with gravity/GPS streams (generic JSON or GoPro "
                             "MP4) for gravity+GPS constrained refinement; timebase "
                             "must match the frame timestamps (video: idx/fps)")
    parser.add_argument("--gps-sigma", type=float, default=2.0,
                        help="GPS position prior sigma in meters (0 disables)")
    parser.add_argument("--gravity-sigma", type=float, default=0.05,
                        help="Gravity direction residual sigma (0 disables)")
    parser.add_argument("--loop-closure", action="store_true",
                        help="Detect revisits between non-adjacent chunks and "
                             "correct accumulated drift with a Sim3 pose graph "
                             "(needs ALIKED chunks — descriptors carry the "
                             "appearance signal; beyond the reference)")
    parser.add_argument("--loop-min-inliers", type=int, default=20,
                        help="Minimum verified 3D inliers to accept a loop edge")
    parser.add_argument("--save-colmap", action="store_true",
                        help="Also export a COLMAP text model (cameras/images/"
                             "points3D.txt) for gaussian-splatting / nerfstudio "
                             "pipelines (beyond the reference)")
    parser.add_argument("--export-mesh", action="store_true",
                        help="TSDF-fuse the chunks' dense maps under the final "
                             "aligned poses and export a triangle mesh "
                             "(fused_mesh.ply). Needs chunks created with "
                             "--save-dense (beyond the reference)")
    parser.add_argument("--mesh-voxel-size", type=float, default=0.0,
                        help="TSDF voxel size in scene units; 0 = auto "
                             "(~192 voxels across the scene)")
    parser.add_argument("--mesh-conf-threshold", type=float, default=0.25,
                        help="Minimum sigmoid confidence for a depth sample "
                             "to be integrated")
    parser.add_argument("--save-volume", action="store_true",
                        help="With --export-mesh: also persist the fused TSDF "
                             "volume (fused_volume.npz) for later re-meshing "
                             "or raycasting without re-fusing")
    parser.add_argument("--render-previews", type=int, default=0,
                        help="With --export-mesh: raycast this many depth/"
                             "normal preview PNG pairs of the fused volume "
                             "from evenly spaced camera poses")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from pi3_slam_tpu.utils.precision import select_platform

    select_platform(args.device)

    from pi3_slam_tpu.slam import OfflineReconstructor, ReconstructorConfig

    config = ReconstructorConfig(
        chunk_dir=args.chunks,
        output_dir=args.output,
        chunk_length=args.chunk_length,
        overlap=args.overlap,
        max_observations_per_track=args.max_observations_per_track,
        observation_fan=args.observation_fan,
        use_inverse_depth=args.use_inverse_depth,
        ba_iterations=args.ba_iterations,
        save_debug=args.save_per_chunk,
        telemetry_path=args.telemetry,
        gps_sigma=args.gps_sigma,
        gravity_sigma=args.gravity_sigma,
        loop_closure=args.loop_closure,
        loop_min_inliers=args.loop_min_inliers,
        save_colmap=args.save_colmap,
        export_mesh=args.export_mesh,
        mesh_voxel_size=args.mesh_voxel_size,
        mesh_conf_threshold=args.mesh_conf_threshold,
        mesh_preview_views=args.render_previews,
        save_volume=args.save_volume,
    )
    OfflineReconstructor(config).run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
