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
* the reference gathers bucket members through hash tables — a
  data-dependent scatter/gather that XLA's static-shape regime (and the
  MXU) hates.  Here the bucket filter becomes a dense boolean mask over
  the ``(Y, X)`` pair grid (code equality across tables/candidates) and
  the exact L1 re-rank runs masked.  Same answers, dense arithmetic.

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


@partial(jax.jit, static_argnames=("m", "n", "g", "k"))
def _cascade_hash_match(key, x, y, m, n, g, k):
    """Full cascade-hash match. ``x``: (X, D) float32 in [-128, 127],
    ``y``: (Y, D).  Returns (idx (Y, k) int32, dist (Y, k) int32)."""
    D = x.shape[1]
    W = jax.random.normal(key, (n, D, m), dtype=x.dtype)

    codes_x = _pack_codes(jnp.einsum("xd,ndm->nxm", x, W))  # (n, X)
    proj_y = jnp.einsum("yd,ndm->nym", y, W)  # (n, Y, m)
    base_y = _pack_codes(proj_y)  # (n, Y)

    # positions of the g least-confident bits per (table, query)
    _, flip_pos = jax.lax.top_k(-jnp.abs(proj_y), g)  # (n, Y, g)
    flip_masks = (1 << flip_pos).sum(-1)  # bits to clear, (n, Y)
    cleared = base_y & ~flip_masks

    # all 2^g assignments of the flipped bits
    combos = jnp.arange(1 << g, dtype=jnp.int32)  # (C,)
    combo_bits = (combos[:, None] >> jnp.arange(g, dtype=jnp.int32)[None, :]) & 1
    # candidate code c = cleared | sum_k combo_bits[c,k] << flip_pos[k]
    set_bits = (combo_bits[None, None] * (1 << flip_pos[:, :, None, :])).sum(-1)
    cand = cleared[:, :, None] | set_bits  # (n, Y, C)

    # dense bucket filter: pair (y, x) is a candidate iff codes match in
    # any (table, candidate-code) slot; accumulate per slot to keep the
    # peak intermediate at (Y, X) instead of (n, Y, X, 2^g)
    Yr = y.shape[0]
    Xr = x.shape[0]
    mask = jnp.zeros((Yr, Xr), dtype=bool)
    for t in range(n):
        for c in range(1 << g):
            mask = mask | (cand[t, :, c][:, None] == codes_x[t][None, :])

    # exact L1 re-rank on +128-shifted byte data (reference
    # CascadingHashNn::find_neighbours, src/CascadingHashNn.h:229-245)
    xb = jnp.round(x).astype(jnp.int32) + 128
    yb = jnp.round(y).astype(jnp.int32) + 128
    dist = jnp.abs(yb[:, None, :] - xb[None, :, :]).sum(-1)  # (Y, X)
    dist = jnp.where(mask, dist, _I32_MAX)
    neg_d, idx = jax.lax.top_k(-dist, k)
    d = -neg_d
    idx = jnp.where(d == _I32_MAX, -1, idx)
    return idx, d


def nn_cascading_hash(x, y, k=2, m=None, n=2, g=2, key=None, chunk=2048):
    """API parity with ``spectavi.feature.nn_cascading_hash`` (reference
    ``spectavi/feature.py:360-376``), including the auto bit-rate
    ``m = floor(log2(max_rows / 6))`` and the brute-force fallback when
    ``m < 4``.  Returns ``(idx uint64, dist float32)``."""
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
    xj = jnp.asarray(x.astype("float32"))
    idx_out, dist_out = [], []
    for i in range(0, y.shape[0], chunk):
        yc = jnp.asarray(y[i : i + chunk].astype("float32"))
        idx, dist = _cascade_hash_match(key, xj, yc, int(m), int(n), int(g), int(k))
        idx_out.append(np.asarray(idx))
        dist_out.append(np.asarray(dist))
    return (
        np.vstack(idx_out).astype(np.uint64),
        np.vstack(dist_out).astype(np.float32),
    )
