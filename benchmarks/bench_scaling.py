"""Scaling-efficiency proxy on a virtual CPU device mesh.

Real multi-chip hardware is not available in this image (one tunneled
chip); this harness measures the *sharding overhead* of the distributed
paths on forced-host CPU devices: the same total workload is run on 1
vs N devices, and with compute per device held constant the collective
overhead bounds the scaling efficiency achievable on ICI (where the
collectives are strictly faster than on host shared memory).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/bench_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_default_device", "cpu")

    from spectavi_tpu.match.bruteforce import l1_topk2_xla
    from spectavi_tpu.parallel.mesh import host_cpu_mesh
    from spectavi_tpu.parallel.two_view import sharded_l1_topk2

    rng = np.random.default_rng(0)
    D = 128
    Y = 512

    def time_fn(fn, *a, reps=3):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    # weak scaling: X grows with device count; per-device block constant
    base_X = 2048
    y = jnp.asarray(rng.integers(0, 255, (Y, D)).astype(np.int32))
    x1 = jnp.asarray(rng.integers(0, 255, (base_X, D)).astype(np.int32))
    t1 = time_fn(lambda a, b: l1_topk2_xla(a, b), x1, y)

    ncores = os.cpu_count() or 1
    for n in (2, 4, 8):
        mesh = host_cpu_mesh(n, n_blocks=n)
        xn = jnp.asarray(rng.integers(0, 255, (base_X * n, D)).astype(np.int32))
        tn = time_fn(lambda a, b: sharded_l1_topk2(mesh, a, b), xn, y)
        # on this host N virtual devices share `ncores` physical cores,
        # so the zero-overhead weak-scaling floor is ceil(n/ncores) * t1
        floor = t1 * max(1.0, n / ncores)
        print(
            f"sharded matching, {n} devices, {base_X * n} db rows: "
            f"{tn*1e3:.1f} ms (1-dev {t1*1e3:.1f} ms; {ncores}-core "
            f"oversubscription floor {floor*1e3:.1f} ms) -> "
            f"raw eff {t1/tn:.2%}, core-corrected {floor/tn:.2%}"
        )


if __name__ == "__main__":
    main()
