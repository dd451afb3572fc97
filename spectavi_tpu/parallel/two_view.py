"""Sharded matching and the multi-chip two-view step.

This is the scale-out layer the reference does not have (SURVEY.md
§5.8): image pairs are data-parallel over the ``pairs`` mesh axis, and
within a pair the descriptor database is sharded over the ``blocks``
axis — each device computes exact top-2 neighbours against its local
block, then the partial top-2 lists are merged with an ``all_gather``
over ICI (the collective analogue of the reference's per-shard HNSW
merge, ``src/Hnswlib.h:68-93``).

The two-view step has full pipeline parity with the single-chip path
(``pipeline/two_view.py::step2_match_keypoints`` + ``step3``): the
inverted-Lowe ratio test runs on device as a static-shape point mask
(failing queries are weighted out of RANSAC sampling and scoring
instead of being compacted away), matching uses the L2 fast path, and
per-pair inlier masks are returned so hosts can triangulate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
# NOTE: jax.shard_map (the non-experimental API) stalls compilation of
# these programs on this machine's TPU-present environment; the
# deprecated experimental entry point compiles fine.
from jax.experimental.shard_map import shard_map

from spectavi_tpu.match.bruteforce import l1_topk2_xla
from spectavi_tpu.mvg.ransac import ransac_essential_core
from spectavi_tpu.parallel.mesh import BLOCKS, PAIRS


def _mesh_platform(mesh):
    return next(iter(mesh.devices.flat)).platform


def _l2_kernel_for(mesh):
    """Exact L2 top-2 kernel for this mesh's devices: the fused Pallas
    kernel on TPU meshes, the portable XLA path elsewhere (virtual CPU
    meshes in tests).  Identical outputs either way."""
    if _mesh_platform(mesh) == "tpu":
        from spectavi_tpu.ops.l2nn_pallas import l2_topk2_fused

        return l2_topk2_fused
    from spectavi_tpu.ops.l2nn import l2_topk_mxu

    return lambda x, y: l2_topk_mxu(x, y, k=2)


def _merge_block_topk(idx, dist, axis_name, block_rows):
    """Merge per-block local top-2 (local indices) into global top-2."""
    bid = jax.lax.axis_index(axis_name)
    gidx = idx + bid * block_rows
    all_idx = jax.lax.all_gather(gidx, axis_name)  # (nb, Y, 2)
    all_dist = jax.lax.all_gather(dist, axis_name)
    nb = all_idx.shape[0]
    Y = all_idx.shape[1]
    idx2 = jnp.moveaxis(all_idx, 0, 1).reshape(Y, nb * 2)
    d2 = jnp.moveaxis(all_dist, 0, 1).reshape(Y, nb * 2)
    neg_d, sel = jax.lax.top_k(-d2, 2)
    return jnp.take_along_axis(idx2, sel, axis=1), -neg_d


def sharded_l1_topk2(mesh, x, y):
    """Exact top-2 L1 matching with the database sharded over ``blocks``.

    ``x``: ``(X, D)`` int descriptors (X divisible by the blocks axis),
    ``y``: ``(Y, D)`` queries (replicated).  Output replicated.
    """
    return _sharded_topk2(mesh, x, y, l1_topk2_xla)


def sharded_l2_topk2(mesh, x, y):
    """Exact top-2 squared-L2 matching (MXU fast path) with the
    database sharded over ``blocks``; same contract as
    :func:`sharded_l1_topk2`."""
    return _sharded_topk2(mesh, x, y, _l2_kernel_for(mesh))


def _sharded_topk2(mesh, x, y, kernel):
    def local(xl, yl):
        idx, dist = kernel(xl, yl)
        return _merge_block_topk(idx, dist, BLOCKS, xl.shape[0])

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCKS, None), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(x, y)


_STEP_CACHE = {}


def make_two_view_step(mesh, trials=512, reproj_allowed=1e-3, svr_allowed=3e-2, min_ratio=1.75, masked=False, compact_to=4096):
    """Build the jitted multi-chip two-view "training step".

    Input: a batch of image pairs, sharded ``pairs`` x ``blocks``:

    * ``desc0 (B, X, D)`` uint8 descriptors of image 0 (the database),
      sharded ``(pairs, blocks)``;
    * ``desc1 (B, Y, D)`` uint8 descriptors of image 1 (queries),
      sharded ``(pairs,)``;
    * ``pts0 (B, X, 2)``, ``pts1 (B, Y, 2)`` calibrated euclidean
      keypoint coordinates, sharded ``(pairs,)``;
    * ``keys (B, 2)`` uint32 PRNG keys, sharded ``(pairs,)``.

    Per pair: sharded exact top-2 L2 matching (all_gather merge over
    ICI) -> on-device inverted-Lowe ratio test (``d2/d1 >= min_ratio^2``
    on squared distances — the single-chip pipeline's test on L2
    distances; failing queries become a static-shape point mask) ->
    batched RANSAC over the masked correspondences.

    Returns per-pair ``(essential (B,3,3), camera (B,3,4),
    count (B,), inlier_mask (B, Y))`` — enough for hosts to
    triangulate exactly like the single-chip pipeline.

    ``masked=True`` builds the ragged-batch variant used by
    :func:`spectavi_tpu.pipeline.sfm.run_sfm`'s batched pair backend:
    the step takes two extra ``(B,)`` int32 inputs ``nx, ny`` (valid
    database/query row counts per pair; rows beyond them are padding)
    and drops matches into padding plus padded queries from the ratio
    mask before RANSAC.  Pad the database by replicating a real row —
    a query whose true neighbour IS that row then sees d2 == d1 and is
    conservatively dropped by the ratio test, never silently matched to
    garbage.

    ``compact_to``: before RANSAC, the ratio survivors are compacted
    on device into a static ``min(compact_to, Y)``-row bucket (top-k
    by ratio margin), so hypothesis scoring costs O(trials x
    survivors) instead of O(trials x Y) — the loop path's
    compact-then-fit shape, inside the fused program (round-4 verdict
    item 4: padding every pair to the batch-max keypoint count made
    the batched backend 2.5x slower warm than the loop).  In the rare
    case a pair has more than ``compact_to`` survivors (default 4096
    covers every measured castle-scale pair at 2-3.9k) only the
    strongest ratio margins compete in RANSAC and can appear in the
    inlier mask; consumers should therefore ratio against
    ``min(survivors, compact_to)`` competitors, not raw survivors
    (``run_sfm``'s batched backend does).  The returned ``ratio_ok``
    still reports every survivor.

    The built step is memoized per ``(mesh, params)``: every call used
    to return a FRESH ``jax.jit`` wrapper, so repeated
    ``run_sfm(pair_backend="batched")`` calls re-traced the whole
    fused program each time (measured: 20+ s/run of pure retracing on
    the warm 10-view scene while the underlying executable sat in the
    compile cache).
    """
    cache_key = (mesh, trials, float(reproj_allowed), float(svr_allowed),
                 float(min_ratio), masked, compact_to)
    hit = _STEP_CACHE.get(cache_key)
    if hit is not None:
        return hit
    kernel = _l2_kernel_for(mesh)

    def per_pair(desc0, desc1, pts0, pts1, key, nx=None, ny=None):
        Y = desc1.shape[0]
        idx, dist = kernel(desc0, desc1)
        idx, dist = _merge_block_topk(idx, dist, BLOCKS, desc0.shape[0])
        # inverted-Lowe ratio test on squared L2 distances
        d1 = jnp.maximum(dist[:, 0].astype(pts0.dtype), 1e-12)
        d2 = dist[:, 1].astype(pts0.dtype)
        ratio_ok = d2 >= (min_ratio**2) * d1
        if nx is not None:
            qi = jnp.arange(Y)
            ratio_ok = ratio_ok & (idx[:, 0] < nx) & (qi < ny)
        C = min(compact_to, Y)
        margin = jnp.where(ratio_ok, d2 / d1, -1.0)
        _, topq = jax.lax.top_k(margin, C)  # survivor compaction
        cmask = ratio_ok[topq]
        x0 = pts0[idx[topq, 0]]
        x1 = pts1[topq]
        out = ransac_essential_core(
            key, x0, x1, trials, reproj_allowed, svr_allowed,
            point_mask=cmask,
        )
        inlier_full = jnp.zeros(Y, bool).at[topq].set(out["inlier_mask"])
        return (
            out["essential"],
            out["camera"],
            out["count"],
            inlier_full,
            idx[:, 0],
            ratio_ok,
        )

    pair_spec = (
        P(PAIRS, BLOCKS, None),
        P(PAIRS, None, None),
        P(PAIRS, None, None),
        P(PAIRS, None, None),
        P(PAIRS, None),
    )
    if masked:
        def stepfn(desc0, desc1, pts0, pts1, keys, nx, ny):
            return jax.vmap(per_pair)(desc0, desc1, pts0, pts1, keys, nx, ny)

        in_specs = pair_spec + (P(PAIRS), P(PAIRS))
        out_specs = (P(PAIRS),) * 6
    else:
        def stepfn(desc0, desc1, pts0, pts1, keys):
            out = jax.vmap(per_pair)(desc0, desc1, pts0, pts1, keys)
            return out[:4]

        in_specs = pair_spec
        out_specs = (P(PAIRS),) * 4

    sharded = shard_map(
        stepfn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_rep=False,
    )
    step = jax.jit(sharded)
    _STEP_CACHE[cache_key] = step
    return step
