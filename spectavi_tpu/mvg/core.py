"""Core projective-geometry primitives, fully batched and vmappable.

TPU-first re-design of the reference's per-item Eigen kernels
(``/root/reference/src/Camera.h:11-58``): every function here is a pure
``jax.numpy`` program over arbitrary leading batch dimensions, so the
per-trial / per-point C++ loops of the reference collapse into single
batched XLA ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def hnormalize(x):
    """Convert homogeneous to euclidean coordinates along the last axis.

    Mirrors ``spectavi.mvg.hnormalize`` (reference ``spectavi/mvg.py:14-18``).
    """
    return x[..., :-1] / x[..., -1:]


def homogeneous(x):
    """Append a 1-coordinate along the last axis (euclidean -> homogeneous)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def skew_symmetric(s):
    """Map vectors ``(..., 3)`` to skew-symmetric matrices ``(..., 3, 3)``.

    Matches ``skew_symmetric`` (reference ``src/Camera.h:48-58``), batched.
    """
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    z = jnp.zeros_like(s0)
    return jnp.stack(
        [
            jnp.stack([z, -s2, s1], axis=-1),
            jnp.stack([s2, z, -s0], axis=-1),
            jnp.stack([-s1, s0, z], axis=-1),
        ],
        axis=-2,
    )


def camera_from_rt(R, t):
    """Compose ``P = [R | t]`` from ``(..., 3, 3)`` and ``(..., 3)``."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def identity_camera(dtype=jnp.float64):
    """The canonical camera ``[I | 0]``."""
    return jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1
    )


def essential_to_cameras(E):
    """Decompose essential matrices ``(..., 3, 3)`` into 4 candidate cameras.

    Same SVD construction as ``Essential2Cameras`` (reference
    ``src/Camera.h:31-46``): ``t = U[:, 2]``, ``Ra = U D V^T``,
    ``Rb = U D^T V^T`` with ``D = [[0,1,0],[-1,0,0],[0,0,1]]``; candidates
    are ``(Ra, t), (Ra, -t), (Rb, t), (Rb, -t)``.

    Returns ``(..., 4, 3, 4)``.
    """
    U, _, Vt = jnp.linalg.svd(E)
    return cameras_from_svd(U, Vt)


def cameras_from_svd(U, Vt):
    """Candidate cameras from a precomputed SVD of E (see
    :func:`essential_to_cameras`); lets RANSAC reuse the SVD of F.

    Unlike the reference decomposition (``Essential2Cameras``,
    ``src/Camera.h:31-46``) the rotations are forced *proper*
    (det = +1): when ``det(U V^T) = -1`` the raw products are
    reflections — projectively the same cameras, but poison downstream
    pose chaining.  Scaling by the determinant flips the sign of the
    whole matrix, preserving the projective camera and the cheirality
    semantics.
    """
    D = jnp.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], U.dtype)
    t = U[..., :, 2]
    s = jnp.sign(jnp.linalg.det(U @ Vt))[..., None, None]
    Ra = U @ D @ Vt * s
    Rb = U @ D.T @ Vt * s
    P = jnp.stack(
        [
            camera_from_rt(Ra, t),
            camera_from_rt(Ra, -t),
            camera_from_rt(Rb, t),
            camera_from_rt(Rb, -t),
        ],
        axis=-3,
    )
    return P


def svd3x3(F):
    """Batched SVD of ``(..., 3, 3)`` via eigendecomposition of F^T F.

    ``jnp.linalg.svd`` lowers to a slow iterative kernel on TPU for
    small batched matrices; symmetric ``eigh`` is several times faster
    and is exact for our use: ``V`` from ``eigh(F^T F)`` (descending),
    ``s = sqrt(eigvals)``, ``u_i = F v_i / s_i`` for the two dominant
    columns, and ``u_2 = u_0 x u_1`` (the essential-matrix spectrum is
    ``(s, s, 0)``, so the smallest singular vector pair is the only
    well-separated one and the cross product sidesteps the 0/0).

    Returns ``(U, s, Vt)`` with ``s`` descending — same contract as
    ``jnp.linalg.svd`` up to column-sign/degenerate-subspace choices,
    which every consumer here is invariant to (singular values for
    gates; ``cameras_from_svd`` enumerates the sign ambiguities).
    """
    G = jnp.swapaxes(F, -1, -2) @ F
    w, V = jnp.linalg.eigh(G)  # ascending
    w = w[..., ::-1]
    V = V[..., ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    FV = F @ V
    u0 = FV[..., :, 0] / jnp.maximum(s[..., 0:1], 1e-30)
    u1 = FV[..., :, 1] / jnp.maximum(s[..., 1:2], 1e-30)
    # re-orthonormalize u1 against u0 (guards the degenerate pair)
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(
        jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-30
    )
    u0 = u0 / jnp.maximum(
        jnp.linalg.norm(u0, axis=-1, keepdims=True), 1e-30
    )
    u2 = jnp.cross(u0, u1)
    # sign: the true third left vector satisfies F v2 = s2 u2; for the
    # essential spectrum s2 ~ 0 either sign is a valid SVD
    sgn = jnp.sum(FV[..., :, 2] * u2, axis=-1, keepdims=True)
    u2 = u2 * jnp.where(sgn < 0, -1.0, 1.0)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)


def inv3x3(M):
    """Closed-form (adjugate) inverse of ``(..., 3, 3)`` matrices.

    Used instead of ``jnp.linalg.inv`` because LU-based ops fail to
    compile for f64 on the TPU backend; the adjugate form is also
    cheaper and fuses for small batched matrices.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def fundamental_from_cameras(P0, P1):
    """Fundamental matrix of a camera pair ``(..., 3, 4) x 2 -> (..., 3, 3)``.

    Same construction as ``Rectifier::fundamental`` (reference
    ``src/Camera.h:81-89``): camera centre C of P0 from the SVD null
    vector, epipole ``e' = P1 C``, pseudo-inverse ``P0^+``, and
    ``F = [e']_x P1 P0^+``.
    """
    _, _, Vt = jnp.linalg.svd(P0)
    C = Vt[..., 3, :]  # null vector of P0 = camera centre (homogeneous)
    ep = jnp.einsum("...ij,...j->...i", P1, C)
    P0T = jnp.swapaxes(P0, -1, -2)
    invP0 = P0T @ inv3x3(P0 @ P0T)
    return skew_symmetric(ep) @ P1 @ invP0
