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


def cast_tree_bf16_host(params):
    """Cast a parameter pytree to bfloat16 on the HOST (numpy + ml_dtypes).

    jax.tree.map(lambda a: a.astype(jnp.bfloat16)) dispatches one device
    program per leaf — ~1.5s each through the axon remote tunnel, 5+ minutes
    for the full Pi3 tree. Host-side casting is one numpy pass; leaves upload
    in bulk on first jit invocation.
    """
    import ml_dtypes
    import numpy as np

    return jax.tree.map(
        lambda a: np.asarray(a).astype(ml_dtypes.bfloat16), params
    )


def select_platform(device: str | None) -> None:
    """Force the JAX backend from a CLI --device flag.

    This machine's sitecustomize registers the remote 'axon' TPU platform and
    overrides the JAX_PLATFORMS env var, so the only way to force CPU is
    jax.config.update after import. 'tpu' / None keep the default backend
    (axon TPU when present). Must run before any computation traces.
    """
    if device and device.lower() in ("cpu",):
        jax.config.update("jax_platforms", "cpu")


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (fresh full-model compiles
    take minutes through this environment's remote-compile tunnel; cached
    reloads take seconds).

    Set env ``PI3_SLAM_JAX_CACHE`` to ``off``/``none``/``0``/empty to disable
    the persistent cache entirely. The test suite does this (tests/conftest.py):
    two JAX processes sharing one cache dir race and die with SIGABRT/SIGSEGV
    inside the cache read/write, and a pytest run must never share a
    grow-forever on-disk cache with bench/driver runs.
    """
    import os

    import jax

    cache_dir = path or os.environ.get(
        "PI3_SLAM_JAX_CACHE", os.path.expanduser("~/.cache/pi3_slam_tpu_jax")
    )
    if not cache_dir or cache_dir.lower() in ("off", "none", "0", "disabled"):
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # Validate the dir is actually writable before handing it to JAX; a
        # read-only or broken mount would otherwise crash deep inside the
        # cache write (jax/_src/compilation_cache.py put_executable_and_time).
        probe = os.path.join(cache_dir, ".write_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
    except OSError as e:
        print(f"[precision] compilation cache disabled ({cache_dir}: {e})")
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
