"""Multi-chip scaling: device meshes and sharding specs for Pi3 inference."""

from .mesh import (
    make_mesh,
    pi3_param_shardings,
    pi3_input_sharding,
    make_sharded_pi3_step,
)

__all__ = [
    "make_mesh",
    "pi3_param_shardings",
    "pi3_input_sharding",
    "make_sharded_pi3_step",
]
