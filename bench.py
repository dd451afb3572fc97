"""Benchmark: descriptor-matching throughput, TPU vs the native CPU baseline.

Workload: one "pair" = exact top-2 matching of two 4096 x 128 uint8
SIFT-like descriptor sets (real sur-ogre descriptors resampled with
noise, so CPU pruning behaves as on real data) — the hot step of the
reference's ex01 pipeline.  The TPU side runs the framework's fused
Pallas matcher (``ops/l2nn_pallas.py`` — exact int8-MXU squared-L2,
Lowe's original SIFT metric; the reference's L1 was an SSE-specific
compromise).  Distances are cross-checked against a numpy oracle
before any timing counts.

Measurement methodology (important on this image): the TPU is reached
through a high-latency tunnel whose ``block_until_ready`` returns
before execution finishes, and a host value pull costs ~0.5 s
regardless of compute.  Naive host-side rep loops therefore measure
dispatch artifacts, not kernels (round 1 recorded such an artifact).
Here the rep loop runs ON DEVICE (``lax.scan`` whose carry consumes
every output element), the result is pulled by value, and the
throughput is the SLOPE between two rep counts — which cancels the
constant tunnel latency exactly.

Baseline: the reference's own SSE backend cannot be built here (its
submodules are not checked out), so the denominator is
``native/hostops.cpp`` — an independent, faithful re-implementation of
the reference's SSE2 ``_mm_sad_epu8`` + OpenMP + pruning kernel
(src/BruteForceNnL1K2.h) — measured on this machine's CPU with all
cores, matching the same pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

N_ROWS = 4096
DIM = 128
R_SMALL = 256
R_BIG = 2304


def make_descriptors():
    sift_path = os.path.join("/root/reference/data/sift-test/sur-ogre.sift")
    rng = np.random.default_rng(0)
    if os.path.exists(sift_path):
        base = np.loadtxt(sift_path)[:, 4:]  # (1168, 128) in [0, 255]
    else:
        base = rng.uniform(0, 255, size=(1168, DIM))
    idx = rng.integers(0, base.shape[0], size=N_ROWS)
    noise = rng.normal(0, 6.0, size=(N_ROWS, DIM))
    x = np.clip(base[idx] + noise, 0, 255).astype(np.uint8)
    idx = rng.integers(0, base.shape[0], size=N_ROWS)
    noise = rng.normal(0, 6.0, size=(N_ROWS, DIM))
    y = np.clip(base[idx] + noise, 0, 255).astype(np.uint8)
    return x, y


def bench_cpu(x, y, reps=3):
    from spectavi_tpu.utils.hostops import l1k2_nn_cpu

    l1k2_nn_cpu(x[:256], y[:256])  # warm / ensure built
    t0 = time.perf_counter()
    for _ in range(reps):
        idx, dist = l1k2_nn_cpu(x, y)
    dt = (time.perf_counter() - t0) / reps
    return dt, idx, dist


def bench_tpu(x, y):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from spectavi_tpu.ops.l2nn import l2_topk2

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)

    # exactness gate first: one real call, full pull
    idx, dist = l2_topk2(xj, yj)
    tpu_idx = np.asarray(idx)
    tpu_dist = np.asarray(dist)

    @partial(jax.jit, static_argnames=("r",))
    def loop(x, y, r):
        # each iteration matches a row-rotated query set: identical
        # work per pair, different data, nothing for the compiler or
        # the tunnel to cache/elide; the carry consumes every output
        def body(carry, i):
            idx, dist = l2_topk2(x, jnp.roll(y, i, axis=0))
            return carry + idx.sum() + dist.sum(), None

        out, _ = jax.lax.scan(body, jnp.int64(0) if jax.config.jax_enable_x64 else jnp.int32(0), jnp.arange(r))
        return out

    walls = {}
    for r in (R_SMALL, R_BIG):
        _ = int(loop(xj, yj, r))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(loop(xj, yj, r))  # value pull forces completion
            best = min(best, time.perf_counter() - t0)
        walls[r] = best
    per_pair = (walls[R_BIG] - walls[R_SMALL]) / (R_BIG - R_SMALL)
    return per_pair, tpu_idx, tpu_dist


def _arm_watchdog(seconds=1200):
    """Print an explanatory JSON line and exit if the accelerator
    tunnel never responds (its relay can die under sustained load;
    backend discovery then blocks forever) — a recorded reason beats a
    silent hang."""
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "match_pairs_per_s_per_chip",
                    "value": 0.0,
                    "unit": "pairs/s",
                    "vs_baseline": 0.0,
                    "error": f"TPU tunnel unresponsive for {seconds}s "
                    "(relay down); see docs/ROUND2.md for the recorded "
                    "25.9k pairs/s measurement",
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    x, y = make_descriptors()
    cpu_dt, _, _ = bench_cpu(x, y)
    wd = _arm_watchdog()
    tpu_dt, tpu_idx, tpu_dist = bench_tpu(x, y)
    wd.cancel()

    # exactness gate: matcher must agree with the numpy L2 oracle on a
    # query subset before its timing counts
    sub = 256
    d = ((x.astype(np.int64)[None] - y[:sub].astype(np.int64)[:, None]) ** 2).sum(-1)
    gd = np.sort(d, axis=1)[:, :2]
    if not np.array_equal(tpu_dist[:sub].astype(np.int64), gd):
        print(
            json.dumps(
                {
                    "metric": "match_pairs_per_s_per_chip",
                    "value": 0.0,
                    "unit": "pairs/s",
                    "vs_baseline": 0.0,
                    "error": "accelerator distances disagree with oracle",
                }
            )
        )
        return

    value = 1.0 / tpu_dt
    baseline = 1.0 / cpu_dt
    print(
        json.dumps(
            {
                "metric": "match_pairs_per_s_per_chip",
                "value": round(value, 3),
                "unit": "pairs/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
