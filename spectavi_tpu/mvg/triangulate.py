"""Batched DLT triangulation, reprojection error, and cheirality.

TPU re-design of ``DltTriangulator`` (reference
``src/DltTriangulator.h:27-88``): the reference triangulates one point
at a time with a sequential 4x4 SVD; here the whole correspondence set
(and, inside RANSAC, the whole hypothesis x camera x point tensor) is
one batched SVD.
"""

from __future__ import annotations

import jax.numpy as jnp

from spectavi_tpu.mvg.core import hnormalize


def _dlt_system(P0, P1, x0, x1):
    """Build the 4x4 DLT systems.

    ``P0, P1``: ``(..., 3, 4)``; ``x0, x1``: ``(..., 2)`` euclidean.
    Rows as in reference ``DltTriangulator::solve``
    (``src/DltTriangulator.h:51-54``).
    """
    A0 = x0[..., 0:1] * P0[..., 2, :] - P0[..., 0, :]
    A1 = x0[..., 1:2] * P0[..., 2, :] - P0[..., 1, :]
    A2 = x1[..., 0:1] * P1[..., 2, :] - P1[..., 0, :]
    A3 = x1[..., 1:2] * P1[..., 2, :] - P1[..., 1, :]
    A0, A1, A2, A3 = jnp.broadcast_arrays(A0, A1, A2, A3)
    return jnp.stack([A0, A1, A2, A3], axis=-2)


def triangulate(P0, P1, x0, x1):
    """Triangulate homogeneous 3D points.

    Parameters
    ----------
    P0, P1 : ``(..., 3, 4)`` camera matrices (broadcast against points).
    x0, x1 : ``(..., 2)`` euclidean or ``(..., 3)`` homogeneous image points.

    Returns
    -------
    X : ``(..., 4)`` homogeneous 3D points (SVD null vector of the DLT
        system, unit norm — same convention as the reference).
    """
    if x0.shape[-1] == 3:
        x0 = hnormalize(x0)
    if x1.shape[-1] == 3:
        x1 = hnormalize(x1)
    A = _dlt_system(P0, P1, x0, x1)
    _, _, Vt = jnp.linalg.svd(A)
    return Vt[..., 3, :]


def triangulate_full(P0, P1, x0, x1):
    """Triangulate and return everything RANSAC scoring needs.

    Returns ``(X, reproj_err, in_front)`` where

    * ``X``: ``(..., 4)`` homogeneous points,
    * ``reproj_err``: sum of the two per-view euclidean reprojection
      residual norms (reference ``DltTriangulator::reprojection_error``,
      ``src/DltTriangulator.h:67-74``),
    * ``in_front``: cheirality test — signed depth positive in both views
      (reference ``distance2camera{0,1}`` / ``is_infront_both_cameras``,
      ``src/DltTriangulator.h:76-86``).
    """
    if x0.shape[-1] == 3:
        x0 = hnormalize(x0)
    if x1.shape[-1] == 3:
        x1 = hnormalize(x1)
    A = _dlt_system(P0, P1, x0, x1)
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[..., 3, :]

    rp0 = jnp.einsum("...ij,...j->...i", P0, X)
    rp1 = jnp.einsum("...ij,...j->...i", P1, X)
    err0 = jnp.linalg.norm(hnormalize(rp0) - x0, axis=-1)
    err1 = jnp.linalg.norm(hnormalize(rp1) - x1, axis=-1)
    reproj = err0 + err1

    sign0 = jnp.sign(jnp.linalg.det(P0[..., :3, :3]))
    sign0 = jnp.where(sign0 == 0, 1.0, sign0)
    sign1 = jnp.sign(jnp.linalg.det(P1[..., :3, :3]))
    sign1 = jnp.where(sign1 == 0, 1.0, sign1)
    d0 = sign0 * rp0[..., 2] / X[..., 3]
    d1 = sign1 * rp1[..., 2] / X[..., 3]
    in_front = (d0 > 0) & (d1 > 0)
    return X, reproj, in_front


def reprojection_error(P0, P1, x0, x1):
    """Just the reprojection error of the DLT solution."""
    _, err, _ = triangulate_full(P0, P1, x0, x1)
    return err


def triangulate_fast_full(P0, P1, x0, x1):
    """Closed-form scoring triangulation (no SVD).

    Solves the *inhomogeneous* DLT least squares ``A[:, :3] w = -A[:, 3]``
    via 3x3 normal equations (adjugate inverse), i.e. fixes ``X = (w, 1)``.
    Differs from the SVD null vector only in the constraint
    normalization; for RANSAC inlier counting the decisions are
    equivalent (points near infinity fail cheirality either way), and it
    is orders of magnitude cheaper than batched 4x4 SVDs on TPU — this
    is the scoring path; :func:`triangulate_full` (SVD) remains the
    output-parity path.

    Returns ``(X (..., 4), reproj_err, in_front)``.
    """
    from spectavi_tpu.mvg.core import inv3x3

    if x0.shape[-1] == 3:
        x0 = hnormalize(x0)
    if x1.shape[-1] == 3:
        x1 = hnormalize(x1)
    A = _dlt_system(P0, P1, x0, x1)  # (..., 4, 4)
    B = A[..., :3]
    c = A[..., 3]
    BtB = jnp.swapaxes(B, -1, -2) @ B
    Btc = jnp.einsum("...ij,...i->...j", B, c)
    w = -jnp.einsum("...ij,...j->...i", inv3x3(BtB), Btc)
    X = jnp.concatenate([w, jnp.ones_like(w[..., :1])], axis=-1)

    rp0 = jnp.einsum("...ij,...j->...i", P0, X)
    rp1 = jnp.einsum("...ij,...j->...i", P1, X)
    err0 = jnp.linalg.norm(hnormalize(rp0) - x0, axis=-1)
    err1 = jnp.linalg.norm(hnormalize(rp1) - x1, axis=-1)
    reproj = err0 + err1

    sign0 = jnp.sign(jnp.linalg.det(P0[..., :3, :3]))
    sign0 = jnp.where(sign0 == 0, 1.0, sign0)
    sign1 = jnp.sign(jnp.linalg.det(P1[..., :3, :3]))
    sign1 = jnp.where(sign1 == 0, 1.0, sign1)
    d0 = sign0 * rp0[..., 2]
    d1 = sign1 * rp1[..., 2]
    in_front = (d0 > 0) & (d1 > 0)
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    reproj = jnp.where(finite, reproj, jnp.inf)
    in_front = in_front & finite
    return X, reproj, in_front
