"""Shared utilities: precision control, timing, keypoints, cameras."""

from .precision import f32_matmul, cast_tree_bf16_host, enable_compilation_cache

__all__ = ["f32_matmul", "cast_tree_bf16_host", "enable_compilation_cache"]
