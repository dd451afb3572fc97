"""Compare Gaussian-blur formulations on the TPU (diagnosis tool).

The round-3 profile shows the separable blur at octave -1 costs ~0.6 s
per image — the largest single SIFT cost.  Candidates:

  a) current: row pass = 1-channel conv_general_dilated (HIGHEST),
     col pass = shifted-slice sum;
  b) shifted-slice sum on BOTH axes;
  c) banded-matrix matmuls on BOTH axes (MXU, HIGHEST precision);
  d) row conv with H folded into the conv batch dim.

All must agree with (a) to ~1e-6 (HIGHEST everywhere).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from spectavi_tpu.features import sift

    rng = np.random.default_rng(0)
    H, W = 2128, 2832
    im = jnp.asarray(rng.random((H, W)).astype(np.float32))
    sigma = 2.0
    k = sift._gaussian_kernel(sigma)
    r = (k.shape[0] - 1) // 2
    print(f"kernel taps: {k.shape[0]}")

    def slice_sum(p, k, axis, n):
        acc = None
        for d in range(k.shape[0]):
            s = jax.lax.slice_in_dim(p, d, d + n, axis=axis)
            acc = float(k[d]) * s if acc is None else acc + float(k[d]) * s
        return acc

    @jax.jit
    def blur_a(im):
        return sift._blur(im, sigma)

    @jax.jit
    def blur_b(im):
        p = jnp.pad(im, ((0, 0), (r, r)), mode="edge")
        im2 = slice_sum(p, k, 1, im.shape[1])
        p = jnp.pad(im2, ((r, r), (0, 0)), mode="edge")
        return slice_sum(p, k, 0, im.shape[0])

    def band(n, k, r, dtype):
        i = jnp.arange(n)
        d = i[None, :] - i[None, :].T  # j - i
        base = jnp.where(
            jnp.abs(d) <= r, jnp.asarray(k, dtype)[jnp.clip(d + r, 0, 2 * r)], 0.0
        )
        cs = jnp.cumsum(jnp.asarray(k, dtype))
        under = jnp.where(i < r, cs[jnp.clip(r - 1 - i, 0, 2 * r)], 0.0)
        over = jnp.where(i >= n - r, cs[jnp.clip(r - 1 - (n - 1 - i), 0, 2 * r)], 0.0)
        base = base.at[:, 0].add(under)
        base = base.at[:, -1].add(over)
        return base

    @jax.jit
    def blur_c(im):
        BH = band(im.shape[0], k, r, im.dtype)
        BW = band(im.shape[1], k, r, im.dtype)
        t = jnp.dot(im, BW.T, precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(BH, t, precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def blur_d(im):
        p = jnp.pad(im, ((0, 0), (r, r)), mode="edge")
        out = jax.lax.conv_general_dilated(
            p[:, None, None, :],  # N=H, C=1, H=1, W
            jnp.asarray(k)[None, None, None, :],
            (1, 1),
            "VALID",
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, 0, :]
        p2 = jnp.pad(out, ((r, r), (0, 0)), mode="edge")
        out2 = jax.lax.conv_general_dilated(
            p2.T[:, None, None, :],
            jnp.asarray(k)[None, None, None, :],
            (1, 1),
            "VALID",
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, 0, :]
        return out2.T

    ref = np.asarray(blur_a(im))

    def timeit(fn, reps=3):
        out = np.asarray(fn(im))
        err = np.abs(out - ref).max()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s = float(jnp.sum(fn(im)))
            best = min(best, time.perf_counter() - t0)
        return best, err

    one = jnp.ones((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        float(one + 1.0)
    floor = (time.perf_counter() - t0) / 5
    print(f"pull-floor: {floor:.3f}s")

    for name, fn in (("a-current", blur_a), ("b-slices", blur_b),
                     ("c-matmul", blur_c), ("d-batchconv", blur_d)):
        t, err = timeit(fn)
        print(f"{name}: {t - floor:.4f}s (raw {t:.4f})  maxerr={err:.2e}")


if __name__ == "__main__":
    main()
