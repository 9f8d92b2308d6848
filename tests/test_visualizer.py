"""Console visualizer (threaded queue consumer) tests."""

import numpy as np

from pi3_slam_tpu.viz.visualizer import OnlineVisualizer
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
    assert viz._n_updates >= 1  # consumer ran (queue may drop under backpressure)
    assert len(viz._trajectory) == viz._n_updates * 3


def test_unthreaded_visualizer(rng):
    chunk, _ = make_chunk(rng, ["a", "b"], n_kp=8)
    recon = build_chunk_reconstruction(chunk, run_ba=False)
    viz = OnlineVisualizer(threaded=False)
    viz.update(recon)
    viz.update(recon)
    assert viz._n_updates == 2
    assert viz._history_pts is not None
    viz.close()
