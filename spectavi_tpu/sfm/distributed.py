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


def make_sharded_ba_step(mesh, axis="pairs", cg_iters=100):
    """Build a jitted LM step with observations sharded over ``axis``.

    Inputs: ``cams (C, 6)``, ``pts (M, 3)`` replicated;
    ``cam_idx/pt_idx/uv/w (O, ...)`` sharded over ``axis`` (O divisible
    by the axis size; pad with ``w = 0`` observations);
    ``lam`` scalar, ``fixed_cam_mask (C,)`` replicated.

    Returns ``step(cams, pts, cam_idx, pt_idx, uv, w, lam, fixed) ->
    (new_cams, new_pts, cost)``.
    """

    def local(cams, pts, cam_idx, pt_idx, uv, w, lam, fixed):
        psum = lambda t: jax.lax.psum(t, axis)
        U, Vinv, Wblk, bc, bp, cost = _ba_quantities(
            cams, pts, cam_idx, pt_idx, uv, w, lam, psum=psum
        )
        dc, dp = _solve_schur(
            U, Vinv, Wblk, bc, bp, cam_idx, pt_idx, fixed, psum=psum,
            cg_iters=cg_iters,
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
        ),
        out_specs=(spec_rep, spec_rep, spec_rep),
        check_rep=False,
    )
    return jax.jit(sharded)


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
