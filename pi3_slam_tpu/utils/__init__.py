"""Shared utilities: precision control, timing, keypoints, cameras."""

from .precision import f32_matmul

__all__ = ["f32_matmul"]
