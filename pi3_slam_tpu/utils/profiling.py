"""Device profiling: jax.profiler trace capture (SURVEY §5's TPU equivalent
of the reference's hand-rolled timing — use together with utils/timing.py's
host-side counters)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pi3_slam_trace"):
    """Capture a jax.profiler trace around a code block.

    View with TensorBoard (`tensorboard --logdir <dir>`) or xprof. Falls back
    to a no-op when the backend doesn't support profiling (some remote
    backends don't).
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"profiler unavailable ({e}); timing only")
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {log_dir}")
            except Exception:
                pass


def annotate(name: str):
    """TraceAnnotation context for labeling spans inside jitted regions."""
    import jax

    return jax.profiler.TraceAnnotation(name)
