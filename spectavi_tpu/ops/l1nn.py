"""Pallas TPU kernel: streaming exact top-2 L1 nearest neighbours.

TPU re-design of the reference's SSE SAD matcher
(``src/BruteForceNnL1K2.h:55-146``): the reference scans database rows
per query with ``_mm_sad_epu8`` and prune-on-partial-sum; here the
``(Y, X)`` distance matrix is computed in VMEM tiles on the VPU with a
running (best, second-best) merged per query tile — the
flash-attention-style streaming reduction suggested in SURVEY.md §5.7.
The full distance matrix never exists in HBM: HBM traffic is
``O(X*D + Y*D)`` instead of ``O(X*Y)``.

Data-dependent pruning is deliberately dropped: it serializes on CPU
SIMD lanes already, and on the VPU dense evaluation of the whole tile
is faster than any divergent early exit.

The portable XLA fallback (``l1_topk2_xla``) computes identical int32
distances, so tests run the same semantics on CPU; ``l1_topk2``
dispatches on backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = jnp.iinfo(jnp.int32).max


def _l1_topk2_kernel(x_ref, y_ref, idx_ref, dist_ref, *, n_valid, tx):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, _I32_MAX)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    yv = y_ref[:].astype(jnp.int32)  # (TY, D)
    xv = x_ref[:].astype(jnp.int32)  # (TX, D)
    ty = yv.shape[0]
    d = jnp.abs(yv[:, None, :] - xv[None, :, :]).sum(-1)  # (TY, TX)

    col = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 1)
    gcol = j * tx + col
    d = jnp.where(gcol < n_valid, d, _I32_MAX)

    # argmin is unsupported for int32 in Mosaic; use min + lowest index
    # attaining it (also gives first-occurrence tie-breaks explicitly)
    m1 = jnp.min(d, axis=1, keepdims=True)  # (TY, 1)
    i1 = jnp.min(jnp.where(d == m1, col, _I32_MAX), axis=1, keepdims=True)
    dm = jnp.where(col == i1, _I32_MAX, d)
    m2 = jnp.min(dm, axis=1, keepdims=True)
    i2 = jnp.min(jnp.where(dm == m2, col, _I32_MAX), axis=1, keepdims=True)
    gi1 = j * tx + i1
    gi2 = j * tx + i2

    b1 = dist_ref[:, 0:1]
    b2 = dist_ref[:, 1:2]
    bi1 = idx_ref[:, 0:1]
    bi2 = idx_ref[:, 1:2]

    # merge two sorted pairs (b1<=b2 from the running state, m1<=m2 from
    # this tile); ties keep the running entry, i.e. the lower x index —
    # same order the reference's ascending scan produces.
    new_wins = m1 < b1
    f_d = jnp.where(new_wins, m1, b1)
    f_i = jnp.where(new_wins, gi1, bi1)
    # second best: loser of the first comparison vs the next candidate
    # from the winning side
    s_d_new = jnp.where(b1 <= m2, b1, m2)  # when the new m1 won
    s_i_new = jnp.where(b1 <= m2, bi1, gi2)
    s_d_old = jnp.where(m1 < b2, m1, b2)  # when the running b1 won
    s_i_old = jnp.where(m1 < b2, gi1, bi2)
    s_d = jnp.where(new_wins, s_d_new, s_d_old)
    s_i = jnp.where(new_wins, s_i_new, s_i_old)

    dist_ref[:, 0:1] = f_d
    dist_ref[:, 1:2] = s_d
    idx_ref[:, 0:1] = f_i
    idx_ref[:, 1:2] = s_i


def l1_topk2_pallas(x, y, ty=32, tx=128, interpret=False):
    """Streaming top-2 L1 matcher as a Pallas TPU kernel.

    ``x``: ``(X, D)`` database, ``y``: ``(Y, D)`` queries (integer
    dtypes).  Returns ``(idx (Y, 2) int32, dist (Y, 2) int32)``.
    """
    X, D = x.shape
    Y = y.shape[0]
    padx = (-X) % tx
    pady = (-Y) % ty
    padd = (-D) % 128
    xp = jnp.pad(x, ((0, padx), (0, padd)))
    yp = jnp.pad(y, ((0, pady), (0, padd)))
    Xp, Dp = xp.shape
    Yp = yp.shape[0]

    grid = (Yp // ty, Xp // tx)
    kernel = functools.partial(_l1_topk2_kernel, n_valid=X, tx=tx)
    idx, dist = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tx, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ty, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Yp, 2), jnp.int32),
            jax.ShapeDtypeStruct((Yp, 2), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * Yp * Xp * Dp, bytes_accessed=Xp * Dp + Yp * Dp, transcendentals=0
        ),
        interpret=interpret,
    )(xp, yp)
    return idx[:Y], dist[:Y]


def l1_topk2(x, y):
    """Exact top-2 L1 matcher (int32 distances).

    Dispatches to the XLA implementation on every backend: measured on
    the v5e chip, XLA's fused broadcast-|a-b|-reduce + top_k reaches
    ~14k pairs/s at 4096x4096x128 — the hand-written Pallas kernel
    (:func:`l1_topk2_pallas`) is limited by its 3D VMEM temporaries and
    is four orders of magnitude slower; it is kept as a reference
    streaming-reduction kernel (exact-equal outputs, tested in
    interpret mode) rather than the production path.
    """
    if x.dtype not in (jnp.uint8, jnp.int8, jnp.int16, jnp.int32, jnp.uint16):
        raise TypeError(f"integer descriptors expected, got {x.dtype}")
    from spectavi_tpu.match.bruteforce import l1_topk2_xla

    return l1_topk2_xla(x, y)
