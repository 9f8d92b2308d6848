"""Online visualization.

The reference runs a viser web server in a separate process
(visualization/visualizer.py:116-593) with a console fallback when viser is
missing (:572-593). viser is not installed in this environment, so the
console path is primary; the viser path is implemented behind the same
interface and activates when the package is importable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import viser  # noqa: F401

    _HAS_VISER = True
except ImportError:
    _HAS_VISER = False


class OnlineVisualizer:
    """Incremental point-cloud/trajectory visualizer.

    update(recon) after each chunk is a NON-BLOCKING queue put; a consumer
    thread drains the queue at ~10 Hz — mirroring the reference's separate
    visualization process + throttled queue (visualization/visualizer.py:
    220-242, slam/online_reconstructor.py:1618-1622) without IPC. Split
    current/history layers with subsample caps (:1490-1625).
    """

    def __init__(self, port: int = 8080, max_current_points: int = 200_000,
                 max_history_points: int = 1_000_000, threaded: bool = True):
        import queue
        import threading

        self.port = port
        self.max_current = max_current_points
        self.max_history = max_history_points
        self._server = None
        self._history_pts: Optional[np.ndarray] = None
        self._history_cols: Optional[np.ndarray] = None
        self._trajectory = []
        self._n_updates = 0
        if _HAS_VISER:
            self._start_server()
        else:
            print(f"viser not available - console visualizer active (port {port} unused)")
        self._queue = queue.Queue(maxsize=4) if threaded else None
        self._stop = threading.Event()
        self._thread = None
        if threaded:
            self._thread = threading.Thread(target=self._consume_loop, daemon=True)
            self._thread.start()

    def _consume_loop(self):
        import queue as _q
        import time as _t

        while not self._stop.is_set():
            try:
                payload = self._queue.get(timeout=0.1)
            except _q.Empty:
                continue
            self._apply_update(*payload)
            _t.sleep(0.1)  # ~10 Hz throttle like the reference consumer

    def _start_server(self):
        import viser

        self._server = viser.ViserServer(port=self.port)

    @staticmethod
    def _subsample(pts, cols, cap):
        if pts.shape[0] <= cap:
            return pts, cols
        idx = np.random.default_rng(0).choice(pts.shape[0], cap, replace=False)
        return pts[idx], cols[idx]

    def update(self, recon) -> None:
        """Non-blocking: drop the update if the consumer is backed up
        (reference put_nowait semantics)."""
        pts = recon.points[recon.track_valid > 0].copy()
        cols = recon.colors[recon.track_valid > 0].copy()
        centers = recon.centers.copy()
        if self._queue is not None:
            try:
                self._queue.put_nowait((pts, cols, centers))
            except Exception:
                pass  # queue full: drop, never stall the SLAM loop
            return
        self._apply_update(pts, cols, centers)

    def _apply_update(self, pts, cols, centers) -> None:
        self._trajectory.extend(list(centers))
        self._n_updates += 1

        cur_pts, cur_cols = self._subsample(pts, cols, self.max_current)
        if self._history_pts is None:
            self._history_pts, self._history_cols = cur_pts, cur_cols
        else:
            self._history_pts = np.concatenate([self._history_pts, cur_pts])
            self._history_cols = np.concatenate([self._history_cols, cur_cols])
            self._history_pts, self._history_cols = self._subsample(
                self._history_pts, self._history_cols, self.max_history
            )

        if self._server is not None:
            self._server.scene.add_point_cloud(
                "/points/history",
                points=self._history_pts,
                colors=(self._history_cols * 255).astype(np.uint8)
                if self._history_cols.max() <= 1.0
                else self._history_cols.astype(np.uint8),
                point_size=0.01,
            )
            traj = np.asarray(self._trajectory)
            if len(traj) >= 2:
                self._server.scene.add_spline_catmull_rom(
                    "/trajectory", positions=traj, color=(255, 0, 0)
                )
        else:
            print(
                f"[viz] update {self._n_updates}: +{pts.shape[0]} pts "
                f"(history {0 if self._history_pts is None else self._history_pts.shape[0]}), "
                f"trajectory {len(self._trajectory)} poses"
            )

    def flush(self, timeout: float = 5.0) -> None:
        """Block until queued updates are applied (for tests/shutdown)."""
        import time as _t

        if self._queue is None:
            return
        t0 = _t.time()
        while not self._queue.empty() and _t.time() - t0 < timeout:
            _t.sleep(0.05)
        _t.sleep(0.15)  # let the in-flight item finish

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if self._server is not None:
            self._server.stop()
