"""IVF vs dense matching: large-set feasibility + recall + crossover.

The reference's HNSW escape hatch (`src/Hnswlib.h`) exists so 100k+
keypoint sets do not pay the dense O(Y*X*D) cost.  `match/ivf.py` is
the TPU-native analogue; this benchmark records (a) that 100k x 100k
matching is feasible without any (Y, X) intermediate, (b) top-2 recall
vs an exact oracle on a query subsample (the reference holds its ANN
to a <=30% mismatch budget, i.e. >=70% recall), and (c) dense-vs-IVF
walls at growing sizes to show the crossover trend.

Backend-agnostic (runs on whatever jax backend is active; pass
JAX_PLATFORMS=cpu to force host CPU).

Usage: python benchmarks/bench_ivf.py [--sizes 8192 32768 100000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def clustered_descriptors(rng, n, d=128, n_clusters=256):
    """SIFT-like data: descriptors concentrate around visual words."""
    words = rng.uniform(0, 255, size=(n_clusters, d))
    idx = rng.integers(0, n_clusters, size=n)
    return np.clip(
        words[idx] + rng.normal(0, 18.0, size=(n, d)), 0, 255
    ).astype(np.float32)


def exact_topk_subsample(x, y_sub, k=2, chunk=512):
    """Numpy oracle on a query subsample (chunked: the full distance
    matrix at 100k x 100k would be 40 GB)."""
    out_i = np.empty((len(y_sub), k), np.int64)
    out_d = np.empty((len(y_sub), k), np.float32)
    xx = (x.astype(np.float64) ** 2).sum(1)
    for s in range(0, len(y_sub), chunk):
        q = y_sub[s : s + chunk].astype(np.float64)
        d2 = xx[None, :] - 2.0 * q @ x.T.astype(np.float64) + (q**2).sum(1)[:, None]
        part = np.argsort(d2, axis=1)[:, :k]
        out_i[s : s + chunk] = part
        out_d[s : s + chunk] = np.take_along_axis(d2, part, 1)
    return out_i, out_d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", type=int,
                    default=[8192, 32768, 100000])
    ap.add_argument("--probe-queries", type=int, default=512)
    args = ap.parse_args()

    import jax

    from spectavi_tpu.match import nn_ivf
    from spectavi_tpu.ops.l2nn import l2_topk2

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    for n in args.sizes:
        x = clustered_descriptors(rng, n)
        y = clustered_descriptors(rng, n)

        t0 = time.time()
        ii, dd = nn_ivf(x, y)
        ivf_wall = time.time() - t0

        # dense baseline: the production exact matcher.  On TPU it is
        # the fused Pallas kernel, which STREAMS the distance matrix
        # through VMEM (no (Y, X) intermediate) and so scales to 100k+;
        # on CPU the XLA lowering materializes (Y, X) int32, so sizes
        # beyond 32768 are skipped there (40 GB at 100k).
        dense_wall = None
        if n <= 32768 or jax.default_backend() == "tpu":
            import jax.numpy as jnp

            xu = x.astype(np.uint8)
            yu = y.astype(np.uint8)
            t0 = time.time()
            di, _ = l2_topk2(jnp.asarray(xu), jnp.asarray(yu))
            np.asarray(di)
            dense_wall = time.time() - t0

        # recall vs exact oracle on a query subsample
        sub = rng.choice(n, size=min(args.probe_queries, n), replace=False)
        gi, _ = exact_topk_subsample(x, y[sub])
        hit1 = (ii[sub, 0].astype(np.int64) == gi[:, 0]).mean()
        both = np.asarray(
            [len(set(map(int, a)) & set(map(int, b))) / 2.0
             for a, b in zip(ii[sub], gi)]
        ).mean()
        dense_s = f"{dense_wall:8.1f} s" if dense_wall is not None else "   (skip)"
        print(
            f"  {n:>6} x {n:<6}: ivf {ivf_wall:8.1f} s | dense {dense_s} | "
            f"top-1 recall {hit1:6.1%} | top-2 set recall {both:6.1%}",
            flush=True,
        )
        ok = both >= 0.70
        print("  recall contract (>=70%):", "OK" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
