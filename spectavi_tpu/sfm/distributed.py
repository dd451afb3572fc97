"""Distributed bundle adjustment over a device mesh.

The north-star capability (BASELINE.json: "distributed BA reduces
camera/point Schur complements via psum/all-gather over ICI").

Sharding layout: observations (``cam_idx, pt_idx, uv, w``) are sharded
over a mesh axis; cameras and points are replicated.  Every reduction
in the single-device solver (:mod:`spectavi_tpu.sfm.bundle_adjust`)
is a segment-sum over observations, so the distributed version is the
same code with local segment-sums followed by ``psum`` over ICI — that
hook is threaded through ``_ba_quantities`` / ``_solve_schur``.  The CG
iteration on the reduced camera system runs replicated (its matvec
contains the psums), so every device steps in lockstep and the update
is consistent without a broadcast.
"""

from __future__ import annotations

import jax

from jax.sharding import PartitionSpec as P
# NOTE: jax.shard_map (the non-experimental API) stalls compilation of
# these programs on this machine's TPU-present environment; the
# deprecated experimental entry point compiles fine.
from jax.experimental.shard_map import shard_map

from spectavi_tpu.sfm.bundle_adjust import _ba_quantities, _solve_schur


def make_sharded_ba_step(mesh, axis="pairs", cg_iters=100,
                         point_aligned=False):
    """Build a jitted LM step with observations sharded over ``axis``.

    Inputs: ``cams (C, 6)``, ``pts (M, 3)`` replicated;
    ``cam_idx/pt_idx/uv/w (O, ...)`` sharded over ``axis`` (O divisible
    by the axis size; pad with ``w = 0`` observations);
    ``lam`` scalar, ``fixed_cam_mask (C,)`` replicated.

    ``point_aligned=True`` declares the landmark partition contract
    (use :func:`shard_observations_by_point`): every observation of a
    given point lives on ONE shard.  Point-space segment sums are then
    already complete locally, so the per-CG-iteration collectives drop
    from two psums — one of them the O(M x 3) point vector — to a
    single O(C x 6) camera reduce (~1.2 KB at 50 cameras): the
    communication volume per iteration becomes independent of the
    number of landmarks.  (V and bp still take one O(M) psum per STEP
    during setup, where masked zero contributions from other shards
    are correct.)

    Returns ``step(cams, pts, cam_idx, pt_idx, uv, w, lam, fixed, k) ->
    (new_cams, new_pts, cost)``.  ``k`` is the replicated shared radial
    ``(k1, k2)`` distortion vector (pass zeros for a pure pinhole) —
    the same model the single-device solver threads through
    ``_ba_quantities`` (``sfm/bundle_adjust.py:85-94``).
    """

    def local(cams, pts, cam_idx, pt_idx, uv, w, lam, fixed, k):
        psum = lambda t: jax.lax.psum(t, axis)
        psum_pt = None if point_aligned else psum
        U, Vinv, Wblk, bc, bp, cost = _ba_quantities(
            cams, pts, cam_idx, pt_idx, uv, w, lam, k=k, psum=psum
        )
        dc, dp = _solve_schur(
            U, Vinv, Wblk, bc, bp, cam_idx, pt_idx, fixed, psum=psum,
            psum_point=psum_pt, cg_iters=cg_iters,
        )
        return cams + dc, pts + dp, cost

    spec_rep = P()
    spec_obs = P(axis)
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spec_rep,
            spec_rep,
            spec_obs,
            spec_obs,
            spec_obs,
            spec_obs,
            spec_rep,
            spec_rep,
            spec_rep,
        ),
        out_specs=(spec_rep, spec_rep, spec_rep),
        check_rep=False,
    )
    return jax.jit(sharded)


def shard_observations_by_point(n_shards, cam_idx, pt_idx, uv, w):
    """Partition observations so every observation of a given point
    lands on ONE shard (the landmark partition of distributed BA) —
    the contract behind ``make_sharded_ba_step(point_aligned=True)``.

    Points are assigned to shards greedily by descending observation
    count (longest-processing-time balancing), then each shard's block
    is padded with zero-weight observations to the common length.
    Returns ``(cam_idx, pt_idx, uv, w)`` with leading dimension
    ``n_shards * per_shard``, laid out shard-major (shard i's rows are
    ``[i * per_shard, (i + 1) * per_shard)``) — ready to device_put
    with a ``P(axis)`` sharding.
    """
    import numpy as np

    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    uv = np.asarray(uv)
    w = np.asarray(w)
    pts, counts = np.unique(pt_idx, return_counts=True)
    order = np.argsort(-counts)
    load = np.zeros(n_shards, np.int64)
    shard_of_pt = {}
    for j in order:
        s = int(np.argmin(load))
        shard_of_pt[int(pts[j])] = s
        load[s] += counts[j]
    per_shard = int(load.max())
    O_out = n_shards * per_shard
    ci = np.zeros(O_out, cam_idx.dtype)
    pi = np.zeros(O_out, pt_idx.dtype)
    uvo = np.zeros((O_out, uv.shape[1]), uv.dtype)
    wo = np.zeros(O_out, w.dtype)
    cursor = np.arange(n_shards) * per_shard
    for o in range(len(cam_idx)):
        s = shard_of_pt[int(pt_idx[o])]
        at = cursor[s]
        ci[at] = cam_idx[o]
        pi[at] = pt_idx[o]
        uvo[at] = uv[o]
        wo[at] = w[o]
        cursor[s] += 1
    return ci, pi, uvo, wo


def pad_observations(cam_idx, pt_idx, uv, w, multiple):
    """Pad observation arrays with zero-weight entries so the leading
    dimension divides the mesh axis size."""
    import numpy as np

    O = len(cam_idx)
    pad = (-O) % multiple
    if pad == 0:
        return cam_idx, pt_idx, uv, w
    cam_idx = np.concatenate([cam_idx, np.zeros(pad, cam_idx.dtype)])
    pt_idx = np.concatenate([pt_idx, np.zeros(pad, pt_idx.dtype)])
    uv = np.concatenate([uv, np.zeros((pad, 2), uv.dtype)])
    w = np.concatenate([w, np.zeros(pad, w.dtype)])
    return cam_idx, pt_idx, uv, w
