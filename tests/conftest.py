"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware.

Note: this environment's sitecustomize registers an 'axon' TPU platform and
overrides JAX_PLATFORMS, so we must force CPU via jax.config *after* import
(before any backend is touched).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Never let tests touch the persistent JAX compilation cache: the shared
# ~/.cache/pi3_slam_tpu_jax dir is a known-fragile surface (SIGSEGV inside
# jax's put_executable_and_time reproduced in round 3, and concurrent readers
# SIGABRT). CPU-backend test compiles are cheap; correctness > warm cache.
os.environ.setdefault("PI3_SLAM_JAX_CACHE", "off")

import jax

if not os.environ.get("PI3_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# --- memory-map guard -------------------------------------------------------
# Root cause of the round-3 "suite segfault at ~82%": every compiled XLA
# executable mmaps code buffers and the full suite accumulates ~65k maps,
# crossing the kernel's vm.max_map_count (65530) mid-compile — LLVM then
# segfaults inside backend_compile_and_load (measured: 64,806 maps at the
# crash; jax.clear_caches() releases ~98% of compile-created maps). Clearing
# the executable caches whenever the count nears the limit keeps one pytest
# invocation green at the cost of a few recompiles.
_MAPS_SOFT_LIMIT = 40_000


def _process_map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: limit does not apply
        return 0


@pytest.fixture(autouse=True)
def _bound_process_memory_maps():
    yield
    if _process_map_count() > _MAPS_SOFT_LIMIT:
        import gc

        jax.clear_caches()
        gc.collect()
        print(
            f"\n[conftest] memory maps exceeded {_MAPS_SOFT_LIMIT}: cleared JAX "
            f"executable caches (now {_process_map_count()})"
        )
