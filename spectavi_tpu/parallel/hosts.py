"""Multi-host initialization helpers.

On a multi-host TPU slice, call :func:`initialize` once per process
before any other JAX work; afterwards ``jax.devices()`` spans the whole
slice and the meshes from :mod:`spectavi_tpu.parallel.mesh` place the
``pairs`` axis across hosts (DCN) and ``blocks`` within a host (ICI).

This image exposes a single chip, so multi-host paths are exercised via
the virtual CPU meshes in tests; the API surface matches what a pod
deployment needs (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize JAX distributed (no-op when already initialized or
    when running single-process)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def local_device_slice(arr_len):
    """Index range of a globally-sharded leading axis owned by this
    process (for host-side sharded data loading of images)."""
    n = jax.process_count()
    i = jax.process_index()
    per = arr_len // n
    start = i * per
    end = arr_len if i == n - 1 else start + per
    return slice(start, end)
