#!/usr/bin/env python
"""CLI: create offline chunks (Pi3 inference + keypoints + metric scale).

Drop-in equivalent of the reference create_offline_chunks.py (same flag
names); --model-path takes a converted .npz weight file instead of an HF hub
id (this environment has no network egress — see tools/convert_checkpoint.py).
"""

import argparse
import glob
import os
import sys


def collect_image_paths(images_arg: str, skip_start: int = 0, skip_end: int = 0):
    """Folder, glob pattern, or text file listing image paths
    (create_offline_chunks.py:27-41 of the reference)."""
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".webp")
    if os.path.isdir(images_arg):
        paths = sorted(
            p for p in glob.glob(os.path.join(images_arg, "*")) if p.lower().endswith(exts)
        )
    elif os.path.isfile(images_arg) and images_arg.endswith(".txt"):
        with open(images_arg) as f:
            paths = [l.strip() for l in f if l.strip()]
    else:
        paths = sorted(glob.glob(images_arg))
    if skip_end:
        paths = paths[skip_start : len(paths) - skip_end]
    elif skip_start:
        paths = paths[skip_start:]
    return paths


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--images", required=True,
                        help="Folder with images, a glob pattern, or a text file listing image paths")
    parser.add_argument("--model-path", default=None,
                        help="Converted Pi3 weights (.npz from tools/convert_checkpoint.py); omit for random init")
    parser.add_argument("--output", default="output_chunks", help="Output directory")
    parser.add_argument("--chunk-length", type=int, default=50)
    parser.add_argument("--overlap", type=int, default=5)
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--cam-dist-path", type=str, default=None,
                        help="Camera calibration JSON for undistortion")
    parser.add_argument("--metric-depth", action="store_true", default=True,
                        help="Enable MoGe metric scaling")
    parser.add_argument("--no-metric-depth", dest="metric_depth", action="store_false")
    parser.add_argument("--moge-path", default=None, help="Converted MoGe weights (.npz)")
    parser.add_argument("--keypoints", default="grid", choices=["aliked", "grid", "none"])
    parser.add_argument("--aliked-path", default=None,
                        help="Converted ALIKED weights (.npz) for --keypoints aliked")
    parser.add_argument("--max-kp", type=int, default=200)
    parser.add_argument("--kp-threshold", type=float, default=0.005,
                        help="ALIKED detection threshold (reference --kp-threshold)")
    parser.add_argument("--estimate-intrinsics", action="store_true", default=True)
    parser.add_argument("--num-workers", type=int, default=2,
                        help="Prefetch decode threads (2 is enough for the uint8 path; "
                             "more threads contend with device-call transfers)")
    parser.add_argument("--data-parallel-chunks", type=int, default=1,
                        help="Chunks per sharded device step over the mesh dp axis "
                             "(multi-chip scaling; 1 = single-chip)")
    parser.add_argument("--tensor-parallel", type=int, default=1,
                        help="Tensor parallelism over heads/hidden (Megatron split; "
                             "dp x tp devices per step). For offline throughput "
                             "prefer --data-parallel-chunks: chunk-dp is "
                             "collective-free while tp=2 costs ~13%% throughput in "
                             "ICI psums (PARITY.md comm analysis); tp only cuts "
                             "single-chunk latency")
    parser.add_argument("--sequence-parallel", type=int, default=1,
                        help="Ring attention over the sp mesh axis for chunks whose "
                             "global-attention sequence exceeds one chip (e.g. "
                             "1000-frame chunks); dp x tp x sp devices per step")
    parser.add_argument("--skip-start", type=int, default=0)
    parser.add_argument("--skip-end", type=int, default=0)
    parser.add_argument("--pixel-limit", type=int, default=255000 // 2)
    parser.add_argument("--compute-dtype", default="bfloat16", choices=["bfloat16", "float32"])
    parser.add_argument("--resume", action="store_true", help="Skip chunks already on disk")
    parser.add_argument("--save-dense", action="store_true",
                        help="Store strided dense per-pixel maps (depth/points/"
                             "conf/rgb) alongside the sparse tracks — enables "
                             "reconstruct_offline --export-mesh (TSDF fusion; "
                             "beyond the reference)")
    parser.add_argument("--dense-stride", type=int, default=None,
                        help="Spatial subsampling of the stored dense maps "
                             "(applied on-device; stride^2 smaller chunks). "
                             "Default: 2 with --save-dense, 1 (full res, "
                             "reference parity) with --keypoints none")
    parser.add_argument("--refine-observations", action="store_true",
                        help="Correlation-based observation refinement (the "
                             "reference's README TODO): project the track "
                             "observation fan and re-measure each projection "
                             "by ZNCC patch matching inside the device step; "
                             "the reconstructor then uses the photometric "
                             "measurements")
    parser.add_argument("--refine-max-observations", type=int, default=10,
                        help="Observation-fan width baked into refined chunks")
    parser.add_argument("--global-kv-merge", type=int, default=1,
                        help="EXPERIMENTAL: merge this many consecutive frames' k/v "
                             "tokens in global attention (FastVGGT-style); cuts "
                             "global-attention FLOPs by the factor but is "
                             "approximate — validate accuracy on your data first")
    parser.add_argument("--no-pad-tail", dest="pad_tail_chunks", action="store_false",
                        help="Compile a separate XLA program for the short tail chunk "
                             "instead of padding it to --chunk-length (exact tail "
                             "numerics at the cost of a second multi-minute compile)")
    parser.add_argument("--chunk-compression", choices=("default", "fast", "none"),
                        default="default",
                        help="npz deflate level for chunk files: 'default' zlib-6 "
                             "(smallest), 'fast' zlib-1 (~3x faster host-side "
                             "compression between device dispatches), 'none' STORED "
                             "(the reference's torch.save chunks are uncompressed "
                             "too); np.load reads all three identically")
    parser.add_argument("--profile-dir", default=None,
                        help="Capture a jax.profiler trace of one steady-state chunk "
                             "into this directory (view with tensorboard/xprof)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    paths = collect_image_paths(args.images, args.skip_start, args.skip_end)
    if not paths:
        print(f"error: no images found for {args.images}", file=sys.stderr)
        return 2
    print(f"{len(paths)} images")

    from pi3_slam_tpu.utils.precision import select_platform

    select_platform(args.device)

    from pi3_slam_tpu.slam import OfflineChunkCreator, OfflineCreatorConfig

    config = OfflineCreatorConfig(
        output_dir=args.output,
        chunk_length=args.chunk_length,
        overlap=args.overlap,
        pixel_limit=args.pixel_limit,
        checkpoint_path=args.model_path,
        compute_dtype=args.compute_dtype,
        use_metric_depth=args.metric_depth,
        moge_checkpoint_path=args.moge_path,
        keypoint_type=args.keypoints,
        aliked_checkpoint_path=args.aliked_path,
        max_keypoints=args.max_kp,
        keypoint_threshold=args.kp_threshold,
        estimate_camera_params=args.estimate_intrinsics,
        cam_dist_path=args.cam_dist_path,
        num_loader_workers=args.num_workers,
        resume=args.resume,
        save_dense=args.save_dense,
        dense_stride=args.dense_stride or (2 if args.save_dense else 1),
        pad_tail_chunks=args.pad_tail_chunks,
        chunk_compression=args.chunk_compression,
        global_kv_merge=args.global_kv_merge,
        refine_observations=args.refine_observations,
        refine_max_observations=args.refine_max_observations,
        data_parallel_chunks=args.data_parallel_chunks,
        tensor_parallel=args.tensor_parallel,
        sequence_parallel=args.sequence_parallel,
        profile_dir=args.profile_dir,
    )
    creator = OfflineChunkCreator(config)
    creator.process_and_save(paths)
    return 0


if __name__ == "__main__":
    sys.exit(main())
