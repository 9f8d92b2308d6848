"""SLAM orchestration: offline chunk creation, offline reconstruction,
online streaming mode."""

from .config import OfflineCreatorConfig, ReconstructorConfig, OnlineConfig
from .chunk_creator import OfflineChunkCreator
from .offline_reconstructor import OfflineReconstructor
from .online import Pi3SLAMOnline

__all__ = [
    "OfflineCreatorConfig",
    "ReconstructorConfig",
    "OnlineConfig",
    "OfflineChunkCreator",
    "OfflineReconstructor",
    "Pi3SLAMOnline",
]
