"""Matmul precision control.

On TPU the default fp32 matmul precision is bfloat16 passes (fast but ~3
decimal digits). Model inference wants that; the geometry/SfM solvers do NOT —
Sim3 fits, bundle-adjustment normal equations, and pose chains need true
float32 accumulation. Decorate solver entry points with @f32_matmul.
"""

from __future__ import annotations

import functools

import jax


def f32_matmul(fn):
    """Run fn under jax.default_matmul_precision('float32')."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
