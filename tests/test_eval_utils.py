"""Evaluation + timestamp utility tests."""

import pytest
import os

import numpy as np
from scipy.spatial.transform import Rotation

from pi3_slam_tpu.utils.evaluation import ape_translation, associate, evaluate_tum_files
from pi3_slam_tpu.utils.timestamps import extract_timestamps_from_paths
from pi3_slam_tpu.io.tum import write_tum_trajectory


def test_ape_zero_for_sim3_equivalent(rng):
    gt = rng.normal(size=(50, 3))
    R = Rotation.random(random_state=np.random.RandomState(1)).as_matrix()
    est = 2.5 * gt @ R.T + np.array([1.0, -2.0, 3.0])
    res = ape_translation(gt, est, align_sim3=True)
    assert res.rmse < 1e-4
    # without alignment the error is large
    res_raw = ape_translation(gt, est, align_sim3=False)
    assert res_raw.rmse > 1.0


def test_ape_known_error(rng):
    gt = rng.normal(size=(40, 3))
    est = gt.copy()
    est[:, 0] += 0.1  # constant offset is removed by alignment...
    res = ape_translation(gt, est, align_sim3=True)
    assert res.rmse < 0.02
    # random noise is not
    est = gt + rng.normal(size=gt.shape) * 0.05
    res = ape_translation(gt, est, align_sim3=True)
    assert 0.02 < res.rmse < 0.12


def test_associate():
    ta = np.array([0.0, 1.0, 2.0, 3.0])
    tb = np.array([0.004, 1.2, 2.001, 2.999])
    ia, ib = associate(ta, tb, max_diff=0.01)
    np.testing.assert_array_equal(ia, [0, 2, 3])
    np.testing.assert_array_equal(ib, [0, 2, 3])


def test_evaluate_tum_files(tmp_path, rng):
    n = 30
    R = Rotation.random(n, random_state=np.random.RandomState(2)).as_matrix()
    gt_pos = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    gt_file = str(tmp_path / "gt.txt")
    est_file = str(tmp_path / "est.txt")
    write_tum_trajectory(gt_file, gt_pos, R, integer_timestamps=True)
    est_pos = 1.7 * gt_pos + 0.3 + rng.normal(size=(n, 3)) * 0.001
    write_tum_trajectory(est_file, est_pos, R, integer_timestamps=True)
    res = evaluate_tum_files(gt_file, est_file, align_sim3=True, max_diff=0.5)
    assert res.num_pairs == n
    assert res.rmse < 0.01


def test_timestamps_from_filenames(tmp_path):
    paths = [
        "/data/1403636579763555584.png",  # 19 digits: ns
        "/data/1403636579.png",  # 10 digits: s
        "/data/1403636579763.png",  # 13 digits: ms
    ]
    ts = extract_timestamps_from_paths(paths)
    assert ts[0] == 1403636579763555584
    assert ts[1] == 1403636579_000000000
    assert ts[2] == 1403636579763_000000


def test_timestamps_mtime_fallback(tmp_path):
    p = tmp_path / "img.png"
    p.write_bytes(b"x")
    ts = extract_timestamps_from_paths([str(p)])
    assert abs(ts[0] / 1e9 - os.path.getmtime(p)) < 1.0


def test_associate_unique_matching():
    """evo-exact: one estimate stamp can serve at most one GT stamp — the
    best-difference pair wins, the loser must find another partner."""
    from pi3_slam_tpu.utils.evaluation import associate

    gt = np.array([0.0, 0.1, 0.2])
    est = np.array([0.09])  # single estimate near two GT stamps
    ia, ib = associate(gt, est, max_diff=0.15)
    assert len(ia) == 1  # NOT matched to both 0.1 and 0.2
    assert gt[ia[0]] == 0.1 and ib[0] == 0

    # contested stamp goes to the closer GT; the other takes its second choice
    gt = np.array([1.00, 1.02])
    est = np.array([1.01, 1.06])
    ia, ib = associate(gt, est, max_diff=0.05)
    assert len(ia) == 2
    pairs = {(int(a), int(b)) for a, b in zip(ia, ib)}
    assert pairs == {(0, 0), (1, 1)}


def test_make_euroc_gt(tmp_path):
    """Synthetic mav0 tree -> index-aligned TUM ground truth."""
    import subprocess
    import sys

    mav0 = tmp_path / "mav0"
    (mav0 / "cam0" / "data").mkdir(parents=True)
    (mav0 / "state_groundtruth_estimate0").mkdir(parents=True)

    # 20 frames at 50ms spacing starting at t0; GT covers [t0+100ms, ...]
    t0 = 1_400_000_000_000_000_000
    for i in range(20):
        (mav0 / "cam0" / "data" / f"{t0 + i * 50_000_000}.png").touch()
    rows = ["#timestamp,px,py,pz,qw,qx,qy,qz"]
    for k in range(40):
        t = t0 + 100_000_000 + k * 25_000_000
        rows.append(f"{t},{k * 0.1:.3f},0,0,1,0,0,0")
    (mav0 / "state_groundtruth_estimate0" / "data.csv").write_text("\n".join(rows))

    out = tmp_path / "gt.txt"
    r = subprocess.run(
        [sys.executable, "tools/make_euroc_gt.py", str(mav0), str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    from pi3_slam_tpu.io.tum import read_tum_trajectory

    traj = read_tum_trajectory(str(out))
    # frames 0,1 predate GT coverage; frames 2..18 interior (19 is GT-edge)
    assert traj["timestamps"][0] == 2.0
    assert traj["positions"].shape[0] >= 16
    # frame 2 is at GT start (k=0, x=0); frame 4 is 100ms in -> k=4 -> x=0.4
    i4 = int(np.flatnonzero(traj["timestamps"] == 4.0)[0])
    np.testing.assert_allclose(traj["positions"][i4, 0], 0.4, atol=1e-6)


def test_ape_plot_written(tmp_path, rng):
    """evo_ape --plot analog writes a figure alongside the metrics."""
    pytest.importorskip("matplotlib")
    from pi3_slam_tpu.io.tum import write_tum_trajectory
    from pi3_slam_tpu.utils.evaluation import evaluate_tum_files

    n = 12
    pos = rng.normal(size=(n, 3))
    rots = np.stack([np.eye(3)] * n)
    gt = tmp_path / "gt.txt"
    est = tmp_path / "est.txt"
    write_tum_trajectory(str(gt), pos, rots)
    write_tum_trajectory(str(est), pos + rng.normal(scale=0.01, size=(n, 3)), rots)
    plot = tmp_path / "ape.png"
    r = evaluate_tum_files(str(gt), str(est), max_diff=0.5, plot_path=str(plot))
    assert plot.exists() and plot.stat().st_size > 1000
    assert r.num_pairs == n
