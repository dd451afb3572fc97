"""Test config: run everything on a virtual 8-device CPU mesh with x64.

The reference test suite runs single-process against the real shared
library; here the same three test pillars (property tests on synthetic
geometry, oracle comparisons, golden/integration data) run on a CPU
backend so that (a) float64 precision is real (TPU f64 is emulated and
slow) and (b) multi-chip sharding paths are exercised without a pod via
``--xla_force_host_platform_device_count``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# NOTE: on this machine the TPU plugin ignores JAX_PLATFORMS=cpu, so pin
# the default device instead — this reliably routes all test computation
# (including jit) onto the host CPU backend.
jax.config.update("jax_default_device", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xDEADBEEF)
