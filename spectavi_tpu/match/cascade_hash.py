"""Cascade-of-hashes nearest neighbours, TPU style.

Capability parity with ``CascadingHashNn`` (reference
``src/CascadingHashNn.h:53-246``, after CVPR'14 "Fast and Accurate
Image Matching with Cascade Hashing for 3D Reconstruction"), re-thought
for TPU:

* hyperplane hashing is a matmul (``proj = x @ W``) followed by a
  sign-bit pack — MXU work instead of the reference's per-row loops;
* per query, the ``g`` lowest-|projection| bits are flipped through all
  ``2^g`` assignments to produce candidate codes (identical semantics
  to ``generate_y_candidate_hashcodes``, reference ``:150-185``);
* the buckets exist to SKIP work (reference ``:208-245`` feeds only
  bucket members into the exact L1 re-rank).  That property is kept
  under XLA's static-shape regime the same way the IVF matcher does it:
  per-table bucket member lists are padded to a static per-bucket cap
  on the host, every query gathers the members of its ``n * 2^g``
  candidate buckets into a fixed-width candidate set, and the exact L1
  re-rank runs over only those ``K = n * 2^g * L`` candidates — ``O(Y
  K D)`` arithmetic instead of the dense ``O(Y X D)`` (≈25x fewer MACs
  at X = 8192 with default parameters).  Bucket overflow beyond the cap
  is counted and reported, bounding the approximation exactly like the
  IVF path.

Note the reference's ``m_hashcodes_y`` OOB read (``:146,211``, see
SURVEY.md §2.5) is NOT replicated — query codes are derived from the
projections directly.

Determinism: hyperplanes are drawn from a JAX PRNG key (the reference
uses an unseeded ``std::random_device``, making its own test flaky).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_I32_MAX = jnp.iinfo(jnp.int32).max


def _pack_codes(proj):
    """Sign-bit pack ``(..., m)`` projections into int32 codes."""
    m = proj.shape[-1]
    bits = (proj >= 0).astype(jnp.int32)
    weights = (1 << jnp.arange(m, dtype=jnp.int32))
    return (bits * weights).sum(-1)


@partial(jax.jit, static_argnames=("m", "n", "g"))
def _hash_codes(key, x, y, m, n, g):
    """Hashing stage, all MXU: database codes per table and the 2^g
    candidate codes per (table, query)."""
    D = x.shape[1]
    W = jax.random.normal(key, (n, D, m), dtype=x.dtype)

    # center the projections on the database column mean: zero-offset
    # hyperplanes through uncentered data put most rows in one
    # half-space per bit, collapsing the table into a few mega-buckets
    # (the reference sidesteps this by REQUIRING callers to de-mean via
    # normalize_to_ubyte_and_multiple_16_dim; centering here makes the
    # buckets balanced for any caller, and the L1 re-rank is unchanged)
    mu = jnp.mean(x, axis=0)
    codes_x = _pack_codes(jnp.einsum("xd,ndm->nxm", x - mu, W))  # (n, X)
    proj_y = jnp.einsum("yd,ndm->nym", y - mu, W)  # (n, Y, m)
    base_y = _pack_codes(proj_y)  # (n, Y)

    # positions of the g least-confident bits per (table, query)
    _, flip_pos = jax.lax.top_k(-jnp.abs(proj_y), g)  # (n, Y, g)
    flip_masks = (1 << flip_pos).sum(-1)  # bits to clear, (n, Y)
    cleared = base_y & ~flip_masks

    # all 2^g assignments of the flipped bits
    combos = jnp.arange(1 << g, dtype=jnp.int32)  # (C,)
    combo_bits = (combos[:, None] >> jnp.arange(g, dtype=jnp.int32)[None, :]) & 1
    set_bits = (combo_bits[None, None] * (1 << flip_pos[:, :, None, :])).sum(-1)
    cand = cleared[:, :, None] | set_bits  # (n, Y, C)
    return codes_x, cand


@partial(jax.jit, static_argnames=("k",))
def _rerank_chunk(xb, yb, member_ids, member_valid, k):
    """Exact L1 top-k over each query's gathered candidate set.

    ``xb (X, D)`` int32 bytes, ``yb (Yc, D)``, ``member_ids (Yc, K)``
    db rows (+valid).  Duplicate candidates (same db row reachable
    through several tables/codes) are de-duplicated exactly like the
    reference's ``SetFilter`` (``src/CascadingHashNn.h:22-51``): a row
    can occupy only one of the k output slots.
    """
    cand = xb[member_ids]  # (Yc, K, D) gathered candidate descriptors
    dist = jnp.abs(yb[:, None, :] - cand).sum(-1)  # (Yc, K)
    dist = jnp.where(member_valid, dist, _I32_MAX)

    idxs, dists = [], []
    for _ in range(k):
        i = jnp.argmin(dist, axis=1)
        d = jnp.take_along_axis(dist, i[:, None], 1)[:, 0]
        gid = jnp.take_along_axis(member_ids, i[:, None], 1)[:, 0]
        gid = jnp.where(d == _I32_MAX, -1, gid)
        idxs.append(gid)
        dists.append(d)
        # mask every slot holding this db row (dedup), not just slot i
        dist = jnp.where(member_ids == gid[:, None], _I32_MAX, dist)
    return jnp.stack(idxs, 1), jnp.stack(dists, 1)


def _bucket_tables(codes_x, m, cap_factor=6.0):
    """Static-shape inverted bucket tables per hash table (host numpy).

    Returns ``members (n, 2^m, L)`` int32, ``valid (n, 2^m, L)`` bool,
    and the count of member slots dropped by the cap.
    """
    n, X = codes_x.shape
    B = 1 << m
    avg = max(1.0, X / B)
    counts = np.stack([np.bincount(codes_x[t], minlength=B) for t in range(n)])
    L = int(min(counts.max(), max(8, np.ceil(cap_factor * avg))))
    members = np.zeros((n, B, L), np.int32)
    valid = np.zeros((n, B, L), bool)
    overflow = 0
    for t in range(n):
        order = np.argsort(codes_x[t], kind="stable")
        starts = np.zeros(B + 1, np.int64)
        np.cumsum(counts[t], out=starts[1:])
        for b in np.nonzero(counts[t])[0]:
            rows = order[starts[b] : starts[b + 1]]
            take = rows[:L]
            members[t, b, : len(take)] = take
            valid[t, b, : len(take)] = True
            overflow += max(0, len(rows) - L)
    return members, valid, overflow


def nn_cascading_hash(x, y, k=2, m=None, n=2, g=2, key=None, chunk=512):
    """API parity with ``spectavi.feature.nn_cascading_hash`` (reference
    ``spectavi/feature.py:360-376``), including the auto bit-rate
    ``m = floor(log2(max_rows / 6))`` and the brute-force fallback when
    ``m < 4``.  Returns ``(idx uint64, dist float32)``; a query slot
    with no candidate (every probed bucket empty) has index 0 and
    distance ``2^31-1`` (detect via the distance, never via a wrapped
    index).
    """
    x = np.asarray(x)
    y = np.asarray(y)
    assert x.shape[1] == y.shape[1]
    if m is None:
        mrows = max(x.shape[0], y.shape[0])
        m = int(np.floor(np.log2(mrows / 6.0)))
        if m < 4:
            from spectavi_tpu.match.bruteforce import nn_bruteforcel1k2

            return nn_bruteforcel1k2(
                (x + 128).astype("uint8"), (y + 128).astype("uint8")
            )
    if key is None:
        key = jax.random.PRNGKey(0)
    m, n, g, k = int(m), int(n), int(g), int(k)
    xj = jnp.asarray(x.astype("float32"))
    yj = jnp.asarray(y.astype("float32"))

    codes_x, cand = _hash_codes(key, xj, yj, m, n, g)
    codes_x = np.asarray(codes_x)  # (n, X)
    cand = np.asarray(cand)  # (n, Y, C)

    members, valid, _overflow = _bucket_tables(codes_x, m)

    # gather each query's candidate buckets into one fixed-width set
    # (host gather is O(Y K); the arithmetic-heavy re-rank runs jitted)
    n_t, Yr, C = cand.shape
    L = members.shape[2]
    mem = members[np.arange(n_t)[:, None, None], cand]  # (n, Y, C, L)
    mval = valid[np.arange(n_t)[:, None, None], cand]
    member_ids = mem.transpose(1, 0, 2, 3).reshape(Yr, n_t * C * L)
    member_valid = mval.transpose(1, 0, 2, 3).reshape(Yr, n_t * C * L)

    # exact L1 re-rank on +128-shifted byte data (reference
    # CascadingHashNn::find_neighbours, src/CascadingHashNn.h:229-245)
    xb = jnp.asarray(np.round(x).astype(np.int32) + 128)
    idx_out, dist_out = [], []
    for i in range(0, Yr, chunk):
        yb = jnp.asarray(np.round(y[i : i + chunk]).astype(np.int32) + 128)
        idx, dist = _rerank_chunk(
            xb,
            yb,
            jnp.asarray(member_ids[i : i + chunk]),
            jnp.asarray(member_valid[i : i + chunk]),
            k,
        )
        idx_out.append(np.asarray(idx))
        dist_out.append(np.asarray(dist))
    nn_idx = np.vstack(idx_out)
    nn_dist = np.vstack(dist_out)
    # pin empty-candidate slots to index 0 BEFORE the unsigned cast
    # (-1 would wrap to 2^64-1); callers detect them via the distance
    nn_idx[nn_idx < 0] = 0
    return nn_idx.astype(np.uint64), nn_dist.astype(np.float32)
