"""Visualization (viser-based when available, console fallback)."""

from .visualizer import OnlineVisualizer

__all__ = ["OnlineVisualizer"]
