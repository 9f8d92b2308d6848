"""SfM compute-device selection.

The reference overlaps GPU inference with CPU reconstruction by running
PyTheia/Ceres in the main process while a spawned worker owns the GPU
(slam/online_reconstructor.py:761-954). The TPU-native analog: pin the SfM
solvers (bundle adjustment, Sim3 IRLS, pruning) to JAX's CPU backend while
the TPU runs the model forward — the two backends execute concurrently, and
the online pipeline keeps forward k+1 in flight during chunk k's BA.

Usage: wrap reconstruction/alignment calls in `with sfm_compute():`. The
backend defaults to wherever JAX would place the work (single-backend
behavior); `set_sfm_backend("cpu")` pins it.
"""

from __future__ import annotations

import contextlib

import jax

_SFM_DEVICE = None


def set_sfm_backend(name: str | None) -> bool:
    """Pin SfM solver dispatch to a backend ('cpu') or clear with None.

    Returns True if the backend was found and pinned.
    """
    global _SFM_DEVICE
    if name is None or name == "auto":
        _SFM_DEVICE = None
        return True
    try:
        _SFM_DEVICE = jax.devices(name)[0]
        return True
    except RuntimeError:
        _SFM_DEVICE = None
        return False


def sfm_compute():
    """Context manager placing jitted SfM work on the pinned backend."""
    if _SFM_DEVICE is None:
        return contextlib.nullcontext()
    return jax.default_device(_SFM_DEVICE)
