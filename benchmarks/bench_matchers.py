"""Matcher comparison benchmark (BASELINE.json configs[2]).

Times every matcher in the framework on the real sur-ogre SIFT
descriptors (tiled with noise to the requested size) and reports
agreement of top-1 matches against the exact-L1 answer — the TPU
analogue of the reference's cascade-of-hashes vs brute-force-L1
comparison.

Usage: python benchmarks/bench_matchers.py [--rows 4096] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_descriptors(rows, rng):
    path = "/root/reference/data/sift-test/sur-ogre.sift"
    base = (
        np.loadtxt(path)[:, 4:]
        if os.path.exists(path)
        else rng.uniform(0, 255, (1168, 128))
    )
    idx = rng.integers(0, base.shape[0], size=rows)
    return np.clip(base[idx] + rng.normal(0, 6.0, (rows, base.shape[1])), 0, 255)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from spectavi_tpu import match
    from spectavi_tpu.features import normalize_to_ubyte_and_multiple_16_dim

    rng = np.random.default_rng(0)
    x = make_descriptors(args.rows, rng)
    y = make_descriptors(args.rows, rng)
    xn = normalize_to_ubyte_and_multiple_16_dim(x)
    yn = normalize_to_ubyte_and_multiple_16_dim(y)
    xb = (xn + 128).astype("uint8")
    yb = (yn + 128).astype("uint8")

    def timed(fn, *a, **k):
        out = fn(*a, **k)  # warm/compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a, **k)
        return (time.perf_counter() - t0) / args.reps, out

    results = {}
    t, (ref_idx, _) = timed(match.nn_bruteforcel1k2, xb, yb)
    results["bruteforce-L1 (exact)"] = (t, 1.0)
    ref_top1 = ref_idx[:, 0].astype(np.int64)

    t, (i2, _) = timed(match.nn_l2k2, xb, yb)
    results["L2-MXU (exact L2)"] = (t, (i2[:, 0].astype(np.int64) == ref_top1).mean())

    t, (ic, _) = timed(match.nn_cascading_hash, xn, yn)
    results["cascade-hash"] = (t, (ic[:, 0].astype(np.int64) == ref_top1).mean())

    t, ia = timed(match.ann, x.astype("float32"), y.astype("float32"))
    results["ann (sharded L2)"] = (t, (ia[:, 0].astype(np.int64) == ref_top1).mean())

    if args.rows <= 2048:  # k-medians clustering is quadratic-ish
        t, (ik, _) = timed(match.nn_kmedians, x.astype("float32"), y.astype("float32"), 2)
        results["k-medians"] = (t, (ik[:, 0].astype(np.int64) == ref_top1).mean())

    print(f"matchers on {args.rows}x{args.rows}x{x.shape[1]} real-ish descriptors "
          f"({jax.default_backend()}):")
    for name, (t, agree) in results.items():
        print(f"  {name:24s} {t*1e3:9.2f} ms/pair  top1-agreement-vs-L1 {agree:6.1%}")


if __name__ == "__main__":
    main()
