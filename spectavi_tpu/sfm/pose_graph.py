"""Pose graph construction: tracks, pose chaining, N-view triangulation.

New capability beyond the reference (its pipeline stops at a single
two-view reconstruction).  Host-side graph logic (union-find tracks,
spanning-tree pose chaining with depth-ratio scale resolution) feeds
batched device programs (masked N-view DLT triangulation, then
:mod:`spectavi_tpu.sfm.bundle_adjust`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spectavi_tpu.sfm.bundle_adjust import rodrigues, rotation_to_rvec


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, a):
        p = self.parent.setdefault(a, a)
        while p != a:
            self.parent[a] = p = self.parent.setdefault(p, p)
            a, p = p, self.parent[p]
        return a

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


def build_tracks(pair_matches, n_views):
    """Union keypoint matches into multi-view tracks.

    Parameters
    ----------
    pair_matches : dict ``(i, j) -> (idx_i, idx_j)`` arrays of matched
        keypoint indices per image pair.
    n_views : number of images.

    Returns
    -------
    tracks : ``(T, n_views)`` int32, keypoint index per view or -1.
        Tracks with conflicting observations (two keypoints of the same
        view in one track) are dropped.
    """
    uf = _UnionFind()
    for (i, j), (idx_i, idx_j) in pair_matches.items():
        for a, b in zip(np.asarray(idx_i), np.asarray(idx_j)):
            uf.union((i, int(a)), (j, int(b)))
    groups = {}
    for key in list(uf.parent):
        groups.setdefault(uf.find(key), []).append(key)
    tracks = []
    for members in groups.values():
        if len(members) < 2:
            continue
        row = -np.ones(n_views, dtype=np.int32)
        ok = True
        for v, k in members:
            if row[v] != -1 and row[v] != k:
                ok = False
                break
            row[v] = k
        if ok and (row != -1).sum() >= 2:
            tracks.append(row)
    return (
        np.stack(tracks)
        if tracks
        else np.zeros((0, n_views), dtype=np.int32)
    )


@partial(jax.jit, static_argnames=())
def triangulate_nview(P, uv, mask):
    """Masked N-view DLT triangulation.

    ``P (V, 3, 4)`` cameras, ``uv (T, V, 2)`` calibrated observations,
    ``mask (T, V)`` validity.  Returns homogeneous points ``(T, 4)``.
    Rows of the DLT system from unobserved views are zeroed — they do
    not affect the null vector.
    """
    A0 = uv[..., 0:1] * P[None, :, 2, :] - P[None, :, 0, :]  # (T, V, 4)
    A1 = uv[..., 1:2] * P[None, :, 2, :] - P[None, :, 1, :]
    A = jnp.concatenate([A0, A1], axis=1)  # (T, 2V, 4)
    m = jnp.concatenate([mask, mask], axis=1)[..., None]
    A = jnp.where(m, A, 0.0)
    _, _, Vt = jnp.linalg.svd(A)
    return Vt[..., 3, :]


def pose_matrix(rvec, tvec):
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    return np.hstack([R, np.asarray(tvec)[:, None]])


def compose_relative(pose_i, rel_ij):
    """World->cam_j from world->cam_i and cam_i->cam_j transforms,
    each given as ``(R, t)`` numpy tuples."""
    Ri, ti = pose_i
    Rij, tij = rel_ij
    return Rij @ Ri, Rij @ ti + tij


def chain_poses(edges, n_views, keypoints, ref_view=0):
    """Initialize global poses from pairwise relative poses.

    Parameters
    ----------
    edges : dict ``(i, j) -> dict`` with keys ``R`` (3,3), ``t`` (3,)
        (cam_i -> cam_j, unit-scale translation), ``idx_i``, ``idx_j``
        (inlier match keypoint indices into view i / view j).
    n_views : number of views.
    keypoints : list of ``(n_kp, 2)`` calibrated euclidean keypoints
        per view (for depth-based scale resolution).
    ref_view : gauge view (identity pose).

    Returns
    -------
    cams : ``(n_views, 6)`` axis-angle poses (world = ref_view frame).

    Scale resolution: translations of pairwise essentials are
    unit-norm.  Walking a BFS spanning tree, each new edge's scale is
    estimated by comparing the depths of keypoints (in the shared view)
    triangulated by the already-placed edge vs. the new edge, taking
    the median ratio.
    """
    from spectavi_tpu.mvg.triangulate import triangulate

    adj = {}
    for (i, j) in edges:
        adj.setdefault(i, []).append(j)
        adj.setdefault(j, []).append(i)

    poses = {ref_view: (np.eye(3), np.zeros(3))}
    # per-view map: kp index -> depth in that view's frame (from the
    # edge that placed it)
    depth_maps = {v: {} for v in range(n_views)}

    def edge_rel(a, b):
        """Relative pose a->b and the matches, from stored edges."""
        if (a, b) in edges:
            e = edges[(a, b)]
            return e["R"], e["t"], np.asarray(e["idx_i"]), np.asarray(e["idx_j"])
        e = edges[(b, a)]
        R = e["R"].T
        t = -R @ e["t"]
        return R, t, np.asarray(e["idx_j"]), np.asarray(e["idx_i"])

    def pair_depths(a, b, R, t, idx_a, idx_b):
        """Triangulate matches of the pair in cam_a's local frame and
        return depths in view a and view b."""
        P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
        P1 = np.hstack([R, t[:, None]])
        xa = keypoints[a][idx_a]
        xb = keypoints[b][idx_b]
        X = np.asarray(
            triangulate(jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(xa), jnp.asarray(xb))
        )
        X = X / np.where(np.abs(X[:, 3:]) > 1e-12, X[:, 3:], 1e-12)
        da = X[:, 2]
        db = (R @ X[:, :3].T + t[:, None])[2]
        return da, db

    visited = {ref_view}
    queue = [ref_view]
    order = []
    while queue:
        v = queue.pop(0)
        for w in adj.get(v, []):
            if w not in visited:
                visited.add(w)
                order.append((v, w))
                queue.append(w)

    first_edge = True
    for (a, b) in order:
        R, t, idx_a, idx_b = edge_rel(a, b)
        da, db = pair_depths(a, b, R, t, idx_a, idx_b)
        scale = 1.0
        if not first_edge:
            # common keypoints in the shared view a
            known = depth_maps[a]
            common = [
                (known[int(k)], da[n])
                for n, k in enumerate(idx_a)
                if int(k) in known and da[n] > 1e-9
            ]
            if len(common) >= 3:
                ratios = np.asarray([kd / dd for kd, dd in common])
                ratios = ratios[np.isfinite(ratios) & (ratios > 0)]
                if len(ratios) >= 3:
                    scale = float(np.median(ratios))
        first_edge = False
        t = t * scale
        poses[b] = compose_relative(poses[a], (R, t))
        for n, k in enumerate(idx_a):
            depth_maps[a].setdefault(int(k), da[n] * scale)
        for n, k in enumerate(idx_b):
            depth_maps[b].setdefault(int(k), db[n] * scale)

    cams = np.zeros((n_views, 6))
    for v, (R, t) in poses.items():
        cams[v, :3] = rotation_to_rvec(R)
        cams[v, 3:] = t
    return cams


def tracks_to_observations(tracks, keypoints):
    """Flatten a track table into BA observation arrays.

    Returns ``(cam_idx, pt_idx, uv)`` over all (track, view) entries.
    """
    cam_idx, pt_idx, uv = [], [], []
    for ti, row in enumerate(np.asarray(tracks)):
        for v, k in enumerate(row):
            if k < 0:
                continue
            cam_idx.append(v)
            pt_idx.append(ti)
            uv.append(keypoints[v][k])
    return (
        np.asarray(cam_idx, dtype=np.int32),
        np.asarray(pt_idx, dtype=np.int32),
        np.asarray(uv, dtype=np.float64),
    )
