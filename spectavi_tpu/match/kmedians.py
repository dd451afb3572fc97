"""K-medians clustering and cluster-filtered nearest neighbours.

Capability parity with ``KMedians`` (reference ``src/KMedians.h:16-296``),
re-designed for TPU.  The reference runs Lloyd-style k-medians with a
*balanced greedy* assignment (a global heap where each median may take
at most one point per round — inherently sequential) and a
``nth_element`` per-dimension median update.  On TPU:

* assignment is the standard argmin over an ``(N, K)`` L1 distance
  matrix (one batched reduction);
* the median update is a masked per-dimension median over cluster
  members (sort-based, batched over clusters);
* the greedy balance constraint is dropped: clusters start from a
  round-robin split (as in the reference's ``initialize_medians``) and
  are then free to find their natural (unbalanced) sizes over the
  Lloyd iterations — the cross-set NN only needs clusters to be
  *sensible*, and the reference itself documents the method's quality
  as "very disappointing" (``test/test_feature.py:86-87``).  Lloyd
  rounds are two matmul-shaped reductions each, so the default runs 8
  of them (vs the reference's fixed 2 heap sweeps) at negligible cost.

Cross-set NN (reference ``find_nearest_neighbours``, ``:260-295``):
cluster both sets, brute-force match medians, then run the exact L1
NN masked to the union of the ``c`` nearest opposite clusters — the
bucket gather of the reference becomes a dense mask, like cascade
hashing.

The reference bug passing ``xrows`` for the y-clustering size
(``src/Spectavi.cpp:310``, SURVEY.md §2.5) is not replicated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_F32_MAX = jnp.finfo(jnp.float32).max


def _l1(a, b):
    """(A, D), (B, D) -> (A, B) L1 distances."""
    return jnp.abs(a[:, None, :] - b[None, :, :]).sum(-1)


@partial(jax.jit, static_argnames=("k", "niter"))
def kmedians(key, x, k, niter=8):
    """Cluster ``x (N, D)`` into ``k`` L1 medians.

    Returns ``(medians (k, D), assign (N,) int32)``.

    Memory discipline (round-4 verdict item 8): the obvious masked
    median materializes a ``(k, N, D)`` intermediate — 13 GB at
    50k x 132 with the auto cluster count — so the update instead
    computes an EXACT grouped median with two stable sorts per
    dimension: sort values, stable-sort that order by cluster id
    (a lexicographic (cluster, value) sort), then gather each
    cluster's middle element(s) from its contiguous run.  Everything
    is ``(N, D)``-shaped.  The assignment distance matrix is likewise
    streamed in row chunks instead of materializing ``(N, k, D)``.
    A 50k x 132 / k=500 run fits in well under 2 GB.
    """
    N, D = x.shape
    perm = jax.random.permutation(key, N)
    # round-robin initial grouping (reference initialize_medians,
    # src/KMedians.h:208-233): point perm[i] goes to cluster i % k
    init_assign = jnp.zeros(N, jnp.int32).at[perm].set(
        jnp.arange(N, dtype=jnp.int32) % k
    )

    def update_medians(assign):
        # lexicographic (cluster, value) order via two stable argsorts
        order1 = jnp.argsort(x, axis=0, stable=True)  # (N, D) value order
        a1 = assign[order1]  # cluster ids in value order
        order2 = jnp.argsort(a1, axis=0, stable=True)
        final = jnp.take_along_axis(order1, order2, axis=0)
        sorted_vals = jnp.take_along_axis(x, final, axis=0)  # (N, D)
        counts = jnp.bincount(assign, length=k)  # (k,)
        starts = jnp.concatenate(
            [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]]
        )
        lo = starts + (counts - 1) // 2  # middle element(s) of each run
        hi = starts + counts // 2
        med = (sorted_vals[lo, :] + sorted_vals[hi, :]) / 2.0  # (k, D)
        # empty clusters: lo/hi index another cluster's run — keep an
        # arbitrary point instead (same convention as before)
        return jnp.where((counts > 0)[:, None], med, x[:1, :])

    # row-chunked assignment: peak (chunk, k, D) instead of (N, k, D)
    chunk = max(1, min(N, int(64e6) // max(k * D * 4, 1)))
    pad = (-N) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))

    def assign_points(med):
        def per_chunk(xc):
            d = jnp.abs(xc[:, None, :] - med[None, :, :]).sum(-1)
            return jnp.argmin(d, axis=1).astype(jnp.int32)

        out = jax.lax.map(per_chunk, xp.reshape(-1, chunk, D))
        return out.reshape(-1)[:N]

    assign = init_assign
    for _ in range(niter):
        assign = assign_points(update_medians(assign))
    return update_medians(assign), assign


@partial(jax.jit, static_argnames=("nmx", "nmy", "c", "k"))
def _nn_kmedians_match(keyx, keyy, x, y, nmx, nmy, c, k):
    medx, ax = kmedians(keyx, x, nmx)
    medy, ay = kmedians(keyy, y, nmy)
    # c nearest x-clusters for each y-cluster (L1 on medians)
    mdist = _l1(medy, medx)  # (nmy, nmx)
    _, near = jax.lax.top_k(-mdist, c)  # (nmy, c)
    allowed = near[ay]  # (Y, c) of x-cluster ids
    mask = (allowed[:, :, None] == ax[None, None, :]).any(1)  # (Y, X)
    dist = _l1(y, x)
    dist = jnp.where(mask, dist, _F32_MAX)
    neg_d, idx = jax.lax.top_k(-dist, k)
    return idx, -neg_d


def nn_kmedians(x, y, k, c=5, key=None):
    """API parity with ``spectavi.feature.nn_kmedians`` (reference
    ``spectavi/feature.py:328-337``): cluster counts auto-tuned as
    ``nm = round(sqrt(rows / c) * c)``."""
    x = np.asarray(x, dtype="float32")
    y = np.asarray(y, dtype="float32")
    assert x.shape[1] == y.shape[1]
    nmx = int(np.round(np.sqrt(x.shape[0] / c) * c))
    nmy = int(np.round(np.sqrt(y.shape[0] / c) * c))
    if key is None:
        key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    idx, dist = _nn_kmedians_match(
        kx, ky, jnp.asarray(x), jnp.asarray(y), nmx, nmy, int(c), int(k)
    )
    return np.asarray(idx).astype(np.uint64), np.asarray(dist).astype(np.float32)
