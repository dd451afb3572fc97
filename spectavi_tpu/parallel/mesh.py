"""Device meshes for multi-chip / multi-host SfM.

The reference has no distributed backend at all (SURVEY.md §2.4 — its
only parallelism is OpenMP threads and SSE lanes).  This module is the
TPU-native replacement: a named ``jax.sharding.Mesh`` with two axes,

* ``"pairs"``  — data parallelism over image pairs (the reference's
  OpenMP batch-over-images, scaled across chips/hosts over DCN);
* ``"blocks"`` — model parallelism over descriptor blocks within one
  pair (the reference's per-query OpenMP loop, scaled over ICI with
  collective top-k merges).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

PAIRS = "pairs"
BLOCKS = "blocks"


def make_mesh(n_pairs=None, n_blocks=None, devices=None):
    """Build a ``(pairs, blocks)`` mesh over the available devices.

    Defaults put all devices on the ``pairs`` axis (pure DP); pass
    ``n_blocks`` to split each pair's matching across chips.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_pairs is None and n_blocks is None:
        n_pairs, n_blocks = n, 1
    elif n_pairs is None:
        n_pairs = n // n_blocks
    elif n_blocks is None:
        n_blocks = n // n_pairs
    assert n_pairs * n_blocks == n, (n_pairs, n_blocks, n)
    grid = np.asarray(devices).reshape(n_pairs, n_blocks)
    return Mesh(grid, (PAIRS, BLOCKS))


def host_cpu_mesh(n_devices, n_blocks=1):
    """CPU mesh of virtual devices for tests / dry runs (requires
    ``--xla_force_host_platform_device_count``)."""
    devs = jax.devices("cpu")[:n_devices]
    if len(devs) < n_devices:
        raise RuntimeError(
            f"need {n_devices} cpu devices, have {len(devs)}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count"
        )
    return make_mesh(n_pairs=n_devices // n_blocks, n_blocks=n_blocks, devices=devs)
