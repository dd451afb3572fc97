"""Test config: run everything on a virtual 8-device CPU mesh with x64.

The reference test suite runs single-process against the real shared
library; here the same three test pillars (property tests on synthetic
geometry, oracle comparisons, golden/integration data) run on a CPU
backend so that (a) float64 precision is real (TPU f64 is emulated and
slow) and (b) multi-chip sharding paths are exercised without a pod via
``--xla_force_host_platform_device_count``.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Detach the axon TPU plugin: backend discovery contacts the remote
# tunnel, and a congested/wedged tunnel hangs even `jax.devices()` —
# which would stall the whole suite.  The plugin registers itself from
# an interpreter-level sitecustomize, so the JAX_PLATFORMS env var is
# pre-empted; the CONFIG-level override below wins regardless (verified
# against a live wedged tunnel), giving a hermetic pure-CPU suite.
# Subprocess-spawning tests get the scrubbed PYTHONPATH so children are
# hermetic too.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xDEADBEEF)
