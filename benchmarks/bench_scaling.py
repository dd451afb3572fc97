"""Sharding-overhead measurement on a virtual CPU device mesh.

Real multi-chip hardware is not available in this image (one tunneled
chip), and raw weak-scaling walls on N virtual devices sharing 4
physical cores are dominated by core oversubscription, not by the
distributed design.  What CAN be measured honestly here is the
*collective overhead* of the sharded matching path: the same
``shard_map`` program with and without the ``all_gather`` top-2 merge,
at constant per-device work.  The ratio bounds the scaling efficiency
attributable to the framework's communication pattern — on real ICI
the collectives are strictly faster than this host-shared-memory
emulation, so the bound is conservative.

Usage: python benchmarks/bench_scaling.py
(set PYTHONPATH= JAX_PLATFORMS=cpu to detach a wedged TPU tunnel)
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
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    jax.config.update("jax_default_device", "cpu")

    from spectavi_tpu.ops.l2nn import l2_topk_mxu
    from spectavi_tpu.parallel.mesh import BLOCKS, host_cpu_mesh
    from spectavi_tpu.parallel.two_view import _merge_block_topk

    rng = np.random.default_rng(0)
    D = 128
    Y = 1024
    per_dev_X = 2048

    def time_fn(fn, *a, reps=5):
        out = fn(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    kernel = lambda xl, yl: l2_topk_mxu(xl, yl, k=2)

    print(f"collective-overhead proxy: {per_dev_X} db rows/device, "
          f"{Y} queries, top-2 exact L2; host CPU mesh "
          f"({os.cpu_count()} physical cores — absolute walls are "
          "oversubscribed, the local/merged ratio is the signal)")
    for n in (1, 2, 4, 8):
        mesh = host_cpu_mesh(n, n_blocks=n)
        x = jnp.asarray(
            rng.integers(0, 256, (per_dev_X * n, D)).astype(np.uint8)
        )
        y = jnp.asarray(rng.integers(0, 256, (Y, D)).astype(np.uint8))

        local_fn = jax.jit(shard_map(
            kernel, mesh=mesh,
            in_specs=(P(BLOCKS, None), P()),
            out_specs=(P(BLOCKS, None), P(BLOCKS, None)),
            check_rep=False,
        ))
        merged_fn = jax.jit(shard_map(
            lambda xl, yl: _merge_block_topk(*kernel(xl, yl), BLOCKS, xl.shape[0]),
            mesh=mesh,
            in_specs=(P(BLOCKS, None), P()),
            out_specs=(P(), P()),
            check_rep=False,
        ))
        t_local = time_fn(local_fn, x, y)
        t_merged = time_fn(merged_fn, x, y)
        eff = t_local / t_merged
        print(
            f"  {n} device(s): local {t_local*1e3:7.1f} ms | "
            f"+all_gather merge {t_merged*1e3:7.1f} ms | "
            f"collective efficiency {eff:6.1%}"
        )




def ba_collective_overhead():
    """Same local-vs-collective proxy for distributed BA: one sharded
    Schur step with the psums active vs the identical local compute on
    1 device, at constant observations/device."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_device", "cpu")

    from spectavi_tpu.parallel.mesh import host_cpu_mesh
    from spectavi_tpu.sfm.distributed import (
        make_sharded_ba_step,
        shard_observations_by_point,
    )

    rng = np.random.default_rng(1)
    C, M, obs_per_dev = 20, 2000, 4096
    cams = rng.normal(0, 0.1, (C, 6)).astype(np.float32)
    pts = rng.standard_normal((M, 3)).astype(np.float32) * [1, 1, 0.4] + [0, 0, 5]

    def time_fn(fn, *a, reps=5):
        out = fn(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"distributed-BA collective proxy: {C} cams, {M} pts, "
          f"{obs_per_dev} obs/device, cg=25 (obs/device constant, "
          "so a flat wall = 100% weak-scaling of the comm pattern)")
    for n in (1, 2, 4, 8):
        mesh = host_cpu_mesh(n, n_blocks=1)
        O = obs_per_dev * n
        ci = rng.integers(0, C, O).astype(np.int32)
        pi = rng.integers(0, M, O).astype(np.int32)
        uv = rng.normal(0, 0.3, (O, 2)).astype(np.float32)
        w = np.ones(O, np.float32)
        fixed = np.zeros(C, bool)
        fixed[0] = True
        walls = {}
        for aligned in (False, True):
            step = make_sharded_ba_step(
                mesh, axis="pairs", cg_iters=25, point_aligned=aligned
            )
            if aligned:
                ci_s, pi_s, uv_s, w_s = shard_observations_by_point(
                    n, ci, pi, uv, w
                )
            else:
                ci_s, pi_s, uv_s, w_s = ci, pi, uv, w
            args = (jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci_s),
                    jnp.asarray(pi_s), jnp.asarray(uv_s), jnp.asarray(w_s),
                    jnp.asarray(1e-3, jnp.float32), jnp.asarray(fixed),
                    jnp.zeros(2, jnp.float32))
            walls[aligned] = time_fn(step, *args)
        print(f"  {n} device(s): interleaved {walls[False]*1e3:7.1f} ms | "
              f"point-aligned {walls[True]*1e3:7.1f} ms "
              f"({obs_per_dev} obs/dev constant)")


if __name__ == "__main__":
    main()
    ba_collective_overhead()
