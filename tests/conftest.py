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

import jax

if not os.environ.get("PI3_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
