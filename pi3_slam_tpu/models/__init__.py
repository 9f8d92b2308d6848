"""Model zoo: Pi3 visual-geometry transformer and MoGe-2 metric depth,
as pure functions over parameter pytrees."""

from .pi3 import Pi3Config, pi3_forward, init_pi3_params
from .dinov2 import DinoV2Config, dinov2_forward, init_dinov2_params

__all__ = [
    "Pi3Config",
    "pi3_forward",
    "init_pi3_params",
    "DinoV2Config",
    "dinov2_forward",
    "init_dinov2_params",
]
