"""Chunk windowing and threaded prefetch.

Replaces the reference's torch DataLoader machinery
(datasets/image_datasets.py:13-299 + the loader-worker processes of
slam/online_reconstructor.py). On TPU the input pipeline is host threads
double-buffering numpy chunks ahead of the jitted device step — no
multiprocessing, no pickle, no pinned-memory dance.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from .image_io import load_images


def chunk_windows(n_frames: int, chunk_length: int, overlap: int) -> List[Tuple[int, int]]:
    """[start, end) windows with stride chunk_length - overlap, >= 2 frames
    each (datasets/image_datasets.py:41-47)."""
    out = []
    start = 0
    while start < n_frames:
        end = min(start + chunk_length, n_frames)
        if end - start >= 2:
            out.append((start, end))
        start += chunk_length - overlap
    return out


class ChunkDataset:
    """Map-style dataset over chunk windows; yields dicts with (N, 3, H, W)
    images, paths, and the window indices.

    image_dtype 'uint8' (default) ships raw bytes — the jitted device step
    normalizes to [0,1]; 4x less host->device transfer than float32, and
    resizing in uint8 matches the reference's PIL-then-ToTensor order
    (utils/image_utils.py:53-143)."""

    def __init__(
        self,
        image_paths: Sequence,
        chunk_length: int,
        overlap: int,
        target_size: Tuple[int, int],
        undistorter=None,
        image_dtype: str = "uint8",
    ):
        self.image_paths = list(image_paths)
        self.chunk_length = chunk_length
        self.overlap = overlap
        self.target_size = target_size
        self.undistorter = undistorter
        self.image_dtype = image_dtype
        self.windows = chunk_windows(len(self.image_paths), chunk_length, overlap)

    def __len__(self) -> int:
        return len(self.windows)

    def __getitem__(self, idx: int) -> dict:
        start, end = self.windows[idx]
        paths = self.image_paths[start:end]
        images = load_images(paths, self.target_size, self.undistorter, dtype=self.image_dtype)
        return {
            "chunk_idx": idx,
            "start": start,
            "end": end,
            "images": images,
            "paths": [p if not isinstance(p, tuple) else f"{p[0]}#{p[1]}" for p in paths],
        }


class PrefetchLoader:
    """Threaded look-ahead iterator over a dataset: workers decode/resize the
    next chunks while the device crunches the current one (the reference's
    DataLoader(num_workers, prefetch_factor=1) role)."""

    def __init__(self, dataset, num_workers: int = 2, prefetch: int = 2):
        self.dataset = dataset
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator[dict]:
        import os

        if os.environ.get("PI3_SLAM_SYNC_LOADER") == "1":
            # escape hatch: decode strictly inline (no threads). Concurrent
            # host decode during TPU-runtime calls correlates with sporadic
            # backend crashes on this machine's remote TPU backend.
            for i in range(len(self.dataset)):
                yield self.dataset[i]
            return
        n = len(self.dataset)
        if n == 0:
            return
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        idx_q: "queue.Queue" = queue.Queue()
        for i in range(n):
            idx_q.put(i)

        results: dict = {}
        lock = threading.Lock()
        error: list = []

        def worker():
            while True:
                try:
                    i = idx_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    item = self.dataset[i]
                except Exception as e:  # propagate to consumer
                    with lock:
                        error.append(e)
                    return
                out_q.put((i, item))

        threads = [
            threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        # strict in-order delivery with an out-of-order side buffer
        next_idx = 0
        received = 0
        while received < n:
            if error:
                raise error[0]
            try:
                i, item = out_q.get(timeout=0.5)
            except queue.Empty:
                if error:
                    raise error[0]
                if not any(t.is_alive() for t in threads) and out_q.empty():
                    if received < n:
                        raise RuntimeError("prefetch workers died before finishing")
                continue
            received += 1
            results[i] = item
            while next_idx in results:
                yield results.pop(next_idx)
                next_idx += 1


class FrameDataset:
    """Per-frame map-style dataset (the reference's AsyncImageDataset,
    datasets/image_datasets.py:224-299): one preprocessed frame per item,
    image paths or (video_path, frame_idx) tuples, optional undistortion.
    Wrap in PrefetchLoader for asynchronous in-order streaming — the same
    strict-ordering guarantee the reference gets from DataLoader workers."""

    def __init__(
        self,
        image_paths: Sequence,
        target_size: Tuple[int, int],
        undistorter=None,
    ):
        self.image_paths = list(image_paths)
        self.target_size = target_size
        self.undistorter = undistorter

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int) -> dict:
        from .image_io import load_image

        path = self.image_paths[idx]
        image = load_image(path, self.target_size, self.undistorter)
        return {"image": image, "path": path, "frame_idx": idx}
