"""TPU compute ops: RoPE2D, attention, pixel shuffle, resampling."""

from .rope import rope_2d, make_patch_positions
from .attention import sdpa
from .pixel_shuffle import tokens_to_image
from .interpolate import (
    interpolate_pos_embed,
    bilinear_sample,
    nearest_sample,
    grid_sample_frames,
)

__all__ = [
    "rope_2d",
    "make_patch_positions",
    "sdpa",
    "tokens_to_image",
    "interpolate_pos_embed",
    "bilinear_sample",
    "nearest_sample",
    "grid_sample_frames",
]
