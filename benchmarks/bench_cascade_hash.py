"""Cascade-hash vs dense brute force: wall-clock + recall at scale.

Round-2 verdict finding: the old cascade-hash computed the full dense
(Y, X) L1 matrix and only *masked* it — hashing added overhead and
saved nothing.  The bucketed re-rank (match/cascade_hash.py) restores
the reference's compute-saving property (``src/CascadingHashNn.h:
208-245``: buckets exist to SKIP candidates).  This benchmark measures
the wall-clock crossover and the recall against the exact matcher.

Run on CPU (hermetic, axon plugin detached):
    PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/bench_cascade_hash.py
Run on TPU (default backend through the tunnel):
    python benchmarks/bench_cascade_hash.py --tpu
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_data(rows, dim=128, seed=0):
    """SIFT-like byte descriptors in the matcher's [-128, 127] domain."""
    sift_path = "/root/reference/data/sift-test/sur-ogre.sift"
    rng = np.random.default_rng(seed)
    if os.path.exists(sift_path):
        base = np.loadtxt(sift_path)[:, 4:]
    else:
        base = rng.uniform(0, 255, size=(1168, dim))
    def draw():
        idx = rng.integers(0, base.shape[0], size=rows)
        noise = rng.normal(0, 6.0, size=(rows, dim))
        return np.clip(base[idx] + noise, 0, 255).astype(np.float64) - 128.0
    return draw(), draw()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="use default (TPU) backend")
    ap.add_argument("--sizes", type=int, nargs="+", default=[2048, 8192, 16384])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_device", "cpu")

    from spectavi_tpu.match.bruteforce import nn_bruteforcel1k2
    from spectavi_tpu.match.cascade_hash import nn_cascading_hash

    results = []
    for rows in args.sizes:
        x, y = make_data(rows)
        xu = (x + 128).astype("uint8")
        yu = (y + 128).astype("uint8")

        # warm both paths (compile), then time best-of-reps
        gi, gd = nn_bruteforcel1k2(xu, yu)
        t_dense = min(
            _timed(lambda: nn_bruteforcel1k2(xu, yu)) for _ in range(args.reps)
        )
        hi, hd = nn_cascading_hash(x, y)
        t_hash = min(
            _timed(lambda: nn_cascading_hash(x, y)) for _ in range(args.reps)
        )

        # reference error budget: <=40% of k*Y matched indices may differ
        mism = (np.asarray(hi) != np.asarray(gi)).sum()
        budget = int(2 * round(0.4 * rows))
        rec = {
            "rows": rows,
            "dense_s": round(t_dense, 4),
            "cashash_s": round(t_hash, 4),
            "speedup": round(t_dense / t_hash, 3),
            "mismatches": int(mism),
            "budget": budget,
            "within_budget": bool(mism <= budget),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
