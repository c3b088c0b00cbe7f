"""Test configuration.

Forces JAX onto CPU with 8 virtual devices BEFORE any backend initializes,
so the distributed tests can build a real 8-device ``jax.sharding.Mesh``
without TPU hardware (SURVEY.md §4.3).  The axon TPU plugin in this image
overrides ``JAX_PLATFORMS``/``XLA_FLAGS`` env vars at interpreter startup,
so the override must go through ``jax.config``.  Set
``CROSSCLR_TESTS_BACKEND=tpu`` to run the suite against real hardware
instead (single chip; mesh tests skip).
"""

import os

if os.environ.get("CROSSCLR_TESTS_BACKEND", "cpu") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
