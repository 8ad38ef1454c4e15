"""Test harness: force an 8-device virtual CPU platform.

The session environment preloads JAX with the axon TPU backend
(sitecustomize) and pins JAX_PLATFORMS=axon, so env vars alone are too late;
we switch the platform through jax.config before any backend is created.
Multi-chip sharding tests run on this virtual mesh; bench.py runs on the
real TPU without these overrides.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
