"""Chunk-file (npz) writing with a selectable compression level.

The reference persists chunks with ``torch.save`` — raw tensor bytes, no
compression (slam/offline_chunk_creator.py:318-331) — while this framework
uses npz so chunks are framework-neutral. ``np.savez_compressed`` hardwires
zlib level 6, whose deflate time on large float16 point/descriptor arrays
is a measurable slice of the host budget between device dispatches
(PARITY.md pipeline section). This helper exposes the trade:

  * ``default`` — zlib 6, the round-3 behavior (smallest files)
  * ``fast``    — zlib 1 (~3x faster deflate, a few % larger files)
  * ``none``    — STORED, no compression (reference-parity bytes-on-disk
                  behavior; fastest, biggest)

All three produce standard npz archives: ``np.load`` reads them
identically, so datasets/manifests/readers need no changes.
"""

from __future__ import annotations

import zipfile

import numpy as np

_MODES = ("default", "fast", "none")


def save_npz(path: str, compression: str = "default", **arrays) -> None:
    """Write ``arrays`` to ``path`` as an npz with the given compression."""
    if compression not in _MODES:
        raise ValueError(f"compression must be one of {_MODES}, got {compression!r}")
    if compression == "default":
        np.savez_compressed(path, **arrays)
        return
    method = zipfile.ZIP_STORED if compression == "none" else zipfile.ZIP_DEFLATED
    kwargs = {} if compression == "none" else {"compresslevel": 1}
    with zipfile.ZipFile(path, "w", method, allowZip64=True, **kwargs) as zf:
        for name, arr in arrays.items():
            with zf.open(f"{name}.npy", "w", force_zip64=True) as f:
                np.lib.format.write_array(f, np.asanyarray(arr), allow_pickle=False)
