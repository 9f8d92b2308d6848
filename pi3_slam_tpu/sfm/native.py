"""ctypes bindings for the native sfmcore library (cpp/sfmcore.cpp).

The C++ core covers the scatter/hash-heavy host bookkeeping that PyTheia did
for the reference: cross-chunk track matching and observation assembly. The
library is built lazily with make on first use; every entry point has a pure
numpy fallback, so the framework runs identically (slower) without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "build", "libsfmcore.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_CPP_DIR, check=True, capture_output=True, timeout=120
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.sfm_match_tracks.restype = ctypes.c_int64
    lib.sfm_match_tracks.argtypes = [
        i32p, f32p, f32p, ctypes.c_int64,
        i32p, f32p, f32p, ctypes.c_int64,
        i32p, ctypes.c_int64,
        ctypes.c_double,
        i32p, i32p, ctypes.c_int64,
    ]
    lib.sfm_build_observations.restype = None
    lib.sfm_build_observations.argtypes = [
        f64p, f64p, f64p, f64p, i32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double,
        i32p, f32p, f32p,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def match_tracks(
    track_frame_a: np.ndarray,
    track_uv_a: np.ndarray,
    track_valid_a: np.ndarray,
    track_frame_b: np.ndarray,
    track_uv_b: np.ndarray,
    track_valid_b: np.ndarray,
    frame_map_b_to_a: np.ndarray,
    quantize: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Common tracks between two reconstructions (see find_common_tracks)."""
    lib = _load()
    n_a, n_b = len(track_frame_a), len(track_frame_b)
    if lib is not None:
        out_a = np.empty(min(n_a, n_b), np.int32)
        out_b = np.empty(min(n_a, n_b), np.int32)
        n = lib.sfm_match_tracks(
            np.ascontiguousarray(track_frame_a, np.int32),
            np.ascontiguousarray(track_uv_a, np.float32),
            np.ascontiguousarray(track_valid_a, np.float32),
            n_a,
            np.ascontiguousarray(track_frame_b, np.int32),
            np.ascontiguousarray(track_uv_b, np.float32),
            np.ascontiguousarray(track_valid_b, np.float32),
            n_b,
            np.ascontiguousarray(frame_map_b_to_a, np.int32),
            len(frame_map_b_to_a),
            quantize,
            out_a,
            out_b,
            len(out_a),
        )
        return out_a[:n].astype(np.int64), out_b[:n].astype(np.int64)

    # numpy fallback: same quantized-key join
    qa = np.round(track_uv_a / quantize).astype(np.int64)
    qb = np.round(track_uv_b / quantize).astype(np.int64)
    fmap = np.asarray(frame_map_b_to_a)
    index = {}
    for t in np.nonzero(track_valid_a > 0)[0]:
        index[(int(track_frame_a[t]), int(qa[t, 0]), int(qa[t, 1]))] = int(t)
    ia, ib = [], []
    for t in np.nonzero(track_valid_b > 0)[0]:
        fb = int(track_frame_b[t])
        if fb >= len(fmap) or fmap[fb] < 0:
            continue
        key = (int(fmap[fb]), int(qb[t, 0]), int(qb[t, 1]))
        if key in index:
            ia.append(index[key])
            ib.append(int(t))
    return np.asarray(ia, np.int64), np.asarray(ib, np.int64)


def build_observations(
    points: np.ndarray,  # (N*K, 3)
    r_cw: np.ndarray,  # (N, 3, 3)
    centers: np.ndarray,  # (N, 3)
    intr: np.ndarray,  # (N, 4)
    cand: np.ndarray,  # (N, C) int32, -1 padded
    n_kp: int,
    width: float,
    height: float,
    obs_frame: np.ndarray,  # (N*K, M) int32, slot 0 prefilled
    obs_uv: np.ndarray,  # (N*K, M, 2) float32
    obs_valid: np.ndarray,  # (N*K, M) float32
) -> bool:
    """Fill observation slots 1..C in place. Returns True if native ran."""
    lib = _load()
    if lib is None:
        return False
    n_frames = r_cw.shape[0]
    lib.sfm_build_observations(
        np.ascontiguousarray(points, np.float64),
        np.ascontiguousarray(r_cw.reshape(n_frames, 9), np.float64),
        np.ascontiguousarray(centers, np.float64),
        np.ascontiguousarray(intr, np.float64),
        np.ascontiguousarray(cand, np.int32),
        n_frames,
        n_kp,
        cand.shape[1],
        float(width),
        float(height),
        obs_frame,
        obs_uv.reshape(obs_uv.shape[0], -1),
        obs_valid,
    )
    return True
