"""Visualizer tests: SceneState layer/trajectory/frustum/follow-cam math and
the threaded console consumer (viser is not installed in CI; the scene-state
split keeps everything but the viser render calls testable)."""

import numpy as np
import pytest

from pi3_slam_tpu.viz.visualizer import (
    OnlineVisualizer,
    SceneState,
    follow_camera_pose,
    render_keypoints_on_image,
)
from pi3_slam_tpu.sfm.reconstruction import build_chunk_reconstruction
from test_alignment import make_chunk


def test_threaded_visualizer_consumes_updates(rng):
    chunk, _ = make_chunk(rng, ["a", "b", "c"], n_kp=10)
    recon = build_chunk_reconstruction(chunk, run_ba=False)
    viz = OnlineVisualizer(threaded=True)
    for _ in range(3):
        viz.update(recon)
    viz.flush()
    viz.close()
    assert viz.state.chunk_count >= 1  # consumer ran (queue may drop under load)
    assert len(viz.state.trajectory) == viz.state.chunk_count * 3


def test_unthreaded_visualizer(rng):
    chunk, _ = make_chunk(rng, ["a", "b"], n_kp=8)
    recon = build_chunk_reconstruction(chunk, run_ba=False)
    viz = OnlineVisualizer(threaded=False)
    viz.update(recon)
    viz.update(recon)
    assert viz.state.chunk_count == 2
    # first chunk's points rolled into the history layer
    assert len(viz.state.history_points) > 0
    assert viz.state.total_points > 0
    viz.close()


def test_scene_state_current_history_split():
    s = SceneState(max_current_points=100, max_history_points=150)
    rng = np.random.default_rng(0)
    p1 = rng.standard_normal((80, 3)).astype(np.float32)
    p2 = rng.standard_normal((90, 3)).astype(np.float32)
    s.add_chunk(p1, np.zeros_like(p1), np.zeros((2, 3)))
    assert len(s.current_points) == 80 and len(s.history_points) == 0
    s.add_chunk(p2, np.zeros_like(p2), np.zeros((2, 3)))
    assert len(s.current_points) == 90
    assert len(s.history_points) == 80  # previous current moved to history
    # decimation caps
    big = rng.standard_normal((500, 3)).astype(np.float32)
    s.add_chunk(big, np.zeros_like(big), np.zeros((1, 3)))
    assert len(s.current_points) <= 100
    s.add_chunk(big, np.zeros_like(big), np.zeros((1, 3)))
    assert len(s.history_points) <= 150


def test_trajectory_segments_and_frustums():
    s = SceneState(max_cameras_shown=3)
    centers = np.arange(15, dtype=np.float32).reshape(5, 3)
    rots = np.stack([np.eye(3, dtype=np.float32)] * 5)
    s.add_chunk(np.zeros((1, 3)), np.zeros((1, 3)), centers, rots)
    segs = s.trajectory_segments()
    assert segs.shape == (4, 2, 3)
    np.testing.assert_allclose(segs[0, 0], centers[0])
    np.testing.assert_allclose(segs[0, 1], centers[1])

    fr = s.camera_frustums()
    assert len(fr) == 3  # capped at last 3 of 5
    assert fr[-1]["is_latest"] and fr[-1]["color"] == (1.0, 0.8, 0.0)
    assert not fr[0]["is_latest"] and fr[0]["color"] == (0.8, 0.2, 0.2)
    np.testing.assert_allclose(fr[-1]["position"], centers[-1])


def test_follow_camera_math():
    pos, target = follow_camera_pose(
        np.array([1.0, 2.0, 3.0]), np.array([0.0, 2.0, 0.0]), distance=0.5, height=0.25
    )
    # behind the forward direction (y), elevated in z
    np.testing.assert_allclose(pos, [1.0, 1.5, 3.25])
    np.testing.assert_allclose(target, [1.0, 2.0, 3.0])


def test_latest_camera_forward_is_rotation_z_axis():
    s = SceneState()
    R = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32)  # z col = (1,0,0)^T
    s.add_chunk(np.zeros((1, 3)), np.zeros((1, 3)), np.zeros((1, 3)), R[None])
    _, fwd = s.latest_camera()
    np.testing.assert_allclose(fwd, [1.0, 0.0, 0.0])


def test_render_keypoints_overlay():
    cv2 = pytest.importorskip("cv2")
    img = np.zeros((32, 32, 3), np.uint8)
    kps = np.array([[16.0, 16.0], [100.0, 100.0]])  # second out of bounds
    out = render_keypoints_on_image(img, kps, point_radius=2, color=(0, 255, 0))
    assert out.sum() > 0  # circle drawn
    assert img.sum() == 0  # original untouched
    assert render_keypoints_on_image(img, None) is img


def test_visualizer_receives_frames_from_online(tmp_path):
    """Online pipeline feeds the latest frame + keypoints into the viz."""
    import glob
    import os

    from PIL import Image

    from pi3_slam_tpu.slam import OnlineConfig, Pi3SLAMOnline
    from test_pi3_model import TINY, make_tiny_params

    d = tmp_path / "f"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 84, 3)).astype(np.uint8)).save(
            d / f"i_{i}.png"
        )
    cfg = OnlineConfig(
        chunk_length=4, overlap=2, pixel_limit=4000, use_metric_depth=False,
        max_keypoints=10, compute_dtype="float32", visualize=True,
        output_dir=str(tmp_path / "o"),
    )
    slam = Pi3SLAMOnline(cfg, pi3_config=TINY)
    slam.params = make_tiny_params()
    paths = sorted(glob.glob(os.path.join(str(d), "*.png")))
    slam.process_image_paths(paths)
    slam.visualizer.flush()
    slam.visualizer.close()
    assert slam.visualizer.state.chunk_count == 2  # windows (0,4),(2,4)
    assert slam.visualizer.state.latest_frame is not None
    assert slam.visualizer.state.latest_frame.dtype == np.uint8
    assert slam.visualizer.state.latest_keypoints is not None


def test_mesh_layer(rng, capsys):
    """show_mesh threads the fused mesh through the queue into SceneState
    (console fallback prints it); a one-shot artifact, never dropped."""
    from pi3_slam_tpu.viz.visualizer import OnlineVisualizer, SceneState

    verts = rng.normal(size=(40, 3)).astype(np.float32)
    faces = rng.integers(0, 40, size=(60, 3)).astype(np.int32)
    cols = rng.uniform(size=(40, 3)).astype(np.float32)

    s = SceneState()
    s.set_mesh(verts, faces, cols)
    assert s.mesh["vertices"].shape == (40, 3)
    assert s.mesh["faces"].dtype == np.int32

    viz = OnlineVisualizer(threaded=True)
    viz.show_mesh(verts, faces, cols)
    viz.flush()
    viz.close()
    assert viz.state.mesh is not None
    np.testing.assert_allclose(viz.state.mesh["vertices"], verts)
    assert "fused mesh" in capsys.readouterr().out

    viz2 = OnlineVisualizer(threaded=False)
    viz2.show_mesh(verts, faces, None)
    assert viz2.state.mesh["colors"] is None
    viz2.close()
