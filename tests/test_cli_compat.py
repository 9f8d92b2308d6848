"""Reference-CLI drop-in compatibility.

The exact invocation argument vectors used by the reference eval harnesses
must parse unchanged on our CLIs:
  - offline: /root/reference/scripts/eval_7scenes.sh:86-103 and
    eval_euroc.sh:99-121 (dash-style flags)
  - online: /root/reference/scripts/eval_7scenes.sh:129-142 and
    pi3_slam_online_modular.py:114-185 (underscore-style flags)
Anyone holding reference eval scripts can swap the binary in.
"""

import create_offline_chunks
import pi3_slam_online
import reconstruct_offline


def test_reference_eval_7scenes_offline_create_invocation():
    # verbatim from /root/reference/scripts/eval_7scenes.sh:86-97
    args = create_offline_chunks.build_parser().parse_args(
        [
            "--images", "/data/7scenes/chess/seq-01/color/",
            "--model-path", "yyfz233/Pi3",
            "--output", "/tmp/out/chess",
            "--chunk-length", "100",
            "--overlap", "20",
            "--device", "cuda",
            "--metric-depth",
            "--keypoints", "grid",
            "--max-kp", "400",
            "--estimate-intrinsics",
            "--num-workers", "2",
        ]
    )
    assert args.chunk_length == 100 and args.overlap == 20
    assert args.keypoints == "grid" and args.max_kp == 400
    assert args.metric_depth and args.estimate_intrinsics


def test_reference_eval_7scenes_offline_reconstruct_invocation():
    # verbatim from /root/reference/scripts/eval_7scenes.sh:99-103
    args = reconstruct_offline.build_parser().parse_args(
        [
            "--chunks", "/tmp/out/chess",
            "--output", "/tmp/out/chess/reconstruction",
            "--max-observations-per-track", "10",
        ]
    )
    assert args.max_observations_per_track == 10


def test_reference_eval_euroc_offline_invocations():
    # verbatim from /root/reference/scripts/eval_euroc.sh:99-121
    args = create_offline_chunks.build_parser().parse_args(
        [
            "--images", "/data/euroc/MH_01/mav0/cam0/data",
            "--cam-dist-path", "example/euroc_cam0_calib.json",
            "--model-path", "yyfz233/Pi3",
            "--output", "/tmp/out/MH_01",
            "--chunk-length", "100",
            "--overlap", "20",
            "--device", "cuda",
            "--metric-depth",
            "--keypoints", "grid",
            "--max-kp", "400",
            "--skip-start", "600",
            "--estimate-intrinsics",
            "--num-workers", "2",
        ]
    )
    assert args.skip_start == 600 and args.cam_dist_path.endswith(".json")

    args = reconstruct_offline.build_parser().parse_args(
        [
            "--chunks", "/tmp/out/MH_01",
            "--output", "/tmp/out/MH_01/reconstruction",
            "--max-observations-per-track", "7",
            "--use-inverse-depth",
        ]
    )
    assert args.max_observations_per_track == 7 and args.use_inverse_depth


def test_reference_eval_7scenes_online_invocation():
    # verbatim from /root/reference/scripts/eval_7scenes.sh:129-142
    # (underscore spellings from pi3_slam_online_modular.py:114-185)
    args = pi3_slam_online.build_parser().parse_args(
        [
            "--image_dir", "/data/7scenes/chess/seq-01/color/",
            "--model_path", "yyfz233/Pi3",
            "--device", "cuda",
            "--chunk_length", "100",
            "--overlap", "20",
            "--keypoint_type", "grid",
            "--max_num_keypoints", "400",
            "--max_observations_per_track", "10",
            "--do_metric_depth",
            "--output_path", "/tmp/out/chess/online",
            "--save_tum",
            "--tum_integer_timestamp",
            "--viz_port", "8080",
        ]
    )
    assert args.images == "/data/7scenes/chess/seq-01/color/"
    assert args.model_path == "yyfz233/Pi3"
    assert args.chunk_length == 100 and args.overlap == 20
    assert args.keypoints == "grid" and args.max_kp == 400
    assert args.max_observations_per_track == 10
    assert args.metric_depth and args.save_tum and args.tum_integer_timestamps
    assert args.output == "/tmp/out/chess/online" and args.viz_port == 8080


def test_online_underscore_aliases_full_surface():
    """Every underscore flag of pi3_slam_online_modular.py:114-185 parses."""
    args = pi3_slam_online.build_parser().parse_args(
        [
            "--video_path", "run.mp4",
            "--start_frame", "10",
            "--end_frame", "500",
            "--skip_start", "5",
            "--skip_end", "3",
            "--model_path", "w.npz",
            "--chunk_length", "30",
            "--overlap", "5",
            "--conf_threshold", "0.5",
            "--cam_scale", "1.0",
            "--estimate_camera_params",
            "--cam_dist_path", "calib.json",
            "--keypoint_type", "grid",
            "--max_num_keypoints", "200",
            "--keypoint_detection_threshold", "0.005",
            "--save_chunk_reconstructions",
            "--save_debug_projections",
            "--max_observations_per_track", "6",
            "--do_metric_depth",
            "--use_inverse_depth",
            "--viz_port", "8080",
            "--no_visualization",
            "--keep_viz_open",
            "--output_path", "out",
            "--max_points", "1000000",
            "--save_tum",
            "--tum_integer_timestamp",
        ]
    )
    assert args.video == "run.mp4"
    assert args.start_frame == 10 and args.end_frame == 500
    assert args.skip_start == 5 and args.skip_end == 3
    assert args.conf_threshold == 0.5 and args.cam_scale == 1.0
    assert args.estimate_intrinsics and args.cam_dist_path == "calib.json"
    assert args.kp_threshold == 0.005
    assert args.save_debug_recons and args.save_debug_projections
    assert args.use_inverse_depth and args.no_visualization and args.keep_viz_open
    assert args.max_points == 1000000


def test_online_transformed_and_debug_recon_aliases():
    p = pi3_slam_online.build_parser()
    assert p.parse_args(["--save_transformed_reconstructions"]).save_debug_recons
    assert p.parse_args(["--save_debug_reconstructions"]).save_debug_recons
