"""Exact top-2 L1 nearest neighbours (reference SSE SAD semantics).

TPU re-design of ``src/BruteForceNnL1K2.h:55-146``: the reference
scans database rows per query with ``_mm_sad_epu8`` and
prune-on-partial-sum; here the ``(Y, X)`` L1 distance matrix is
evaluated densely in blocks and reduced with a batched top-2.
Data-dependent pruning is deliberately dropped — it serializes even on
CPU SIMD lanes, and dense evaluation wins on the VPU.

Implementation decision (round 2, measured): L1 distance is
``sum_d |x_d - y_d|`` — not a matmul — so any kernel must materialize
a 3D ``(tile_x, tile_y, D)`` broadcast difference.  Mosaic spills
those 3D temporaries to VMEM and the round-1 hand-written streaming
kernel measured ~4 orders of magnitude off the XLA lowering; it was
deleted rather than kept as a museum piece.  The production choices
are therefore:

* **L1 parity path** — this module: XLA's fused
  broadcast-|a-b|-reduce + top-2 (``l1_topk2_xla``), which keeps the
  3D intermediate in registers tile by tile;
* **fast path** — squared-L2 on the MXU
  (:mod:`spectavi_tpu.ops.l2nn_pallas`), where the distance *is* a
  matmul; L2 is also Lowe's original SIFT metric, the reference's L1
  being an SSE-era compromise.  The pipeline's matching steps use L2.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_topk2(x, y):
    """Exact top-2 L1 matcher (int32 distances).

    ``x (X, D)`` database, ``y (Y, D)`` queries, integer dtypes.
    Returns ``(idx (Y, 2) int32, dist (Y, 2) int32)`` ascending with
    first-occurrence tie-breaks.
    """
    if x.dtype not in (jnp.uint8, jnp.int8, jnp.int16, jnp.int32, jnp.uint16):
        raise TypeError(f"integer descriptors expected, got {x.dtype}")
    from spectavi_tpu.match.bruteforce import l1_topk2_xla

    return l1_topk2_xla(x, y)
