"""Per-octave breakdown of the SIFT detect pass (diagnosis tool).

``block_until_ready`` returns early through the axon tunnel, so each
stage is timed by pulling a scalar reduction of its outputs — timing =
dispatch + compute + constant scalar-pull latency (measured separately
as ``pull-floor``).  Run manually:

    python benchmarks/profile_sift_detect.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CASTLE = "/root/reference/data/castle/01.jpg"


def main():
    import jax
    import jax.numpy as jnp

    from spectavi_tpu.pipeline.io import imread
    from spectavi_tpu.features import sift

    im = imread(CASTLE, dtype="float32", force_grayscale=True)
    H0, W0 = im.shape
    o_min = -1
    n_oct = sift.num_octaves(H0, W0, o_min)
    budgets = sift._octave_budgets(H0, W0, o_min, n_oct, 32768)

    def scalar(tree):
        tot = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(tree):
            tot = tot + jnp.sum(leaf.astype(jnp.float32) * 0 + leaf.astype(jnp.float32))
        return tot

    def timeit(fn, reps=3):
        _ = float(scalar(fn()))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(scalar(fn()))
            best = min(best, time.perf_counter() - t0)
        return best

    one = jnp.ones((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        float(one + 1.0)
    floor = (time.perf_counter() - t0) / 5
    print(f"pull-floor: {floor:.3f}s")

    t = timeit(lambda: sift._base_first(jnp.asarray(im[None]), o_min))
    print(f"base_first: {t:.3f}s")

    first0 = sift._base_first(jnp.asarray(im[None]), o_min)
    firsts = [first0]
    total = 0.0
    for oi, budget in enumerate(budgets[:4]):
        first = firsts[-1]
        t = timeit(lambda f=first, b=budget: sift._octave_detect(f, 0.0, 10.0, b))
        nxt, mod, ang, det = sift._octave_detect(first, 0.0, 10.0, budget)
        firsts.append(nxt)
        total += t
        print(f"octave {oi - 1}: shape={first.shape} budget={budget} {t:.3f}s")
    print(f"sum detect(first 4, incl pull floors): {total:.3f}s")

    first = firsts[0]
    levels = jax.jit(jax.vmap(sift._octave_levels_core))
    t = timeit(lambda: levels(first))
    print(f"octave -1 levels-only: {t:.3f}s")
    gss, dog, mod, ang = levels(first)
    gss.block_until_ready()
    dr = jax.jit(lambda d: sift.detect_refine(d, 0.0, 10.0, budgets[0]))
    t = timeit(lambda: dr(dog[0]))
    print(f"octave -1 detect_refine-only: {t:.3f}s")

    blur_only = jax.jit(
        jax.vmap(
            lambda f: jnp.stack(
                [f]
                + [
                    sift._blur(
                        f,
                        sift.SIGMA_0
                        * float(
                            np.sqrt(
                                sift.SIGMA_K ** (2 * s)
                                - sift.SIGMA_K ** (2 * s - 2)
                            )
                        ),
                    )
                    for s in range(sift.S_MIN + 1, sift.S_MAX + 1)
                ]
            )
        )
    )
    t = timeit(lambda: blur_only(first))
    print(f"octave -1 blurs-only(parallel form): {t:.3f}s")
    grads = jax.jit(jax.vmap(sift._gradients))
    t = timeit(lambda: grads(gss))
    print(f"octave -1 gradients-only: {t:.3f}s")

    # detect_refine internals at octave -1
    em = jax.jit(lambda d: sift._extrema_mask(d, 0.0))
    t = timeit(lambda: em(dog[0]))
    print(f"octave -1 extrema-mask-only: {t:.3f}s")

    def ladder(d):
        Sn = d.shape[0]
        mask = sift._extrema_mask(d, 0.0)
        strength = jnp.where(mask, jnp.abs(d[1 : Sn - 1]), 0.0)
        smax = strength.max()
        taus = jnp.concatenate(
            [smax * 2.0 ** -jnp.arange(0, 24, dtype=d.dtype),
             jnp.zeros((1,), d.dtype)]
        )
        counts_at = jnp.stack([(strength > t).sum() for t in taus])
        return counts_at

    t = timeit(lambda: jax.jit(ladder)(dog[0]))
    print(f"octave -1 mask+ladder: {t:.3f}s")

    def compact(d):
        Sn = d.shape[0]
        mask = sift._extrema_mask(d, 0.0)
        (cand,) = jnp.nonzero(mask.reshape(-1), size=budgets[0], fill_value=0)
        return cand

    t = timeit(lambda: jax.jit(compact)(dog[0]))
    print(f"octave -1 mask+nonzero: {t:.3f}s")


if __name__ == "__main__":
    main()
