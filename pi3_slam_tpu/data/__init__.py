"""Host-side data pipeline: image/video loading, chunk windowing, prefetch."""

from .image_io import calculate_target_size, load_image, load_images
from .datasets import ChunkDataset, FrameDataset, chunk_windows, PrefetchLoader

__all__ = [
    "calculate_target_size",
    "load_image",
    "load_images",
    "ChunkDataset",
    "FrameDataset",
    "chunk_windows",
    "PrefetchLoader",
]
