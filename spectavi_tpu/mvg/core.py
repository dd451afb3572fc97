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


def eigh3x3_descending(G):
    """Closed-form eigendecomposition of symmetric ``(..., 3, 3)``.

    ``jnp.linalg.eigh`` HANGS/CRASHES the TPU worker on this backend
    (like the LU-based ops), and ``jnp.linalg.svd`` is a slow iterative
    kernel for small batched matrices — so this is fully closed-form
    and branch-free:

    * eigenvalues by the trigonometric (Smith) formula;
    * the eigenvector of the *smallest* eigenvalue from the columns of
      ``(G - l0 I)(G - l1 I)`` (Cayley-Hamilton: that product is a
      scaled projector onto the l2-eigenspace) — well-conditioned
      whenever l2 is separated, which is exactly the essential-matrix
      spectrum ``(s^2, s^2, 0)``;
    * the remaining pair by one exact 2x2 Jacobi rotation inside the
      orthogonal complement — immune to the l0 ~ l1 degeneracy that
      makes projector-based formulas blow up for essential matrices.

    Returns ``(w, V)`` with eigenvalues descending, ``V`` columns the
    matching eigenvectors.
    """
    dtype = G.dtype
    q = jnp.trace(G, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=dtype)
    B = G - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    p_safe = jnp.where(p > 0, p, 1.0)
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / (2.0 * p_safe**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l0 = q + 2.0 * p * jnp.cos(phi)
    l2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l1 = 3.0 * q - l0 - l2

    # Anchor the eigenvector with the best-separated eigenvalue: the
    # Cayley-Hamilton projector (G - lb)(G - lc) has columns spanning
    # the la-eigenspace, and is only well-conditioned when la is
    # separated from {lb, lc}.  Essential matrices degenerate the TOP
    # pair (s^2, s^2, 0) -> anchor l2; rank-1 matrices degenerate the
    # BOTTOM pair (s^2, 0, 0) -> anchor l0.  Branch-free select.
    anchor_low = (l1 - l2) >= (l0 - l1)
    la = jnp.where(anchor_low, l2, l0)
    lb = jnp.where(anchor_low, l0, l1)
    lc = jnp.where(anchor_low, l1, l2)
    P = (G - lb[..., None, None] * I) @ (G - lc[..., None, None] * I)
    norms = jnp.sum(P * P, axis=-2)  # (..., 3) column norms^2
    ci = jnp.argmax(norms, axis=-1)
    va = jnp.take_along_axis(P, ci[..., None, None], axis=-1)[..., 0]
    na = jnp.linalg.norm(va, axis=-1, keepdims=True)
    # G ~ qI: any unit vector is an eigenvector
    va = jnp.where(na > 1e-30, va / jnp.maximum(na, 1e-30),
                   jnp.array([0.0, 0.0, 1.0], dtype))

    # orthonormal completion {a, b} of va's complement (branch-free
    # pick of the axis least aligned with va)
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype), va.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype), va.shape)
    e = jnp.where(jnp.abs(va[..., 0:1]) < 0.9, ex, ey)
    a = jnp.cross(va, e)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-30)
    b = jnp.cross(va, a)

    # exact Jacobi rotation diagonalizing the 2x2 restriction of G
    Ga = jnp.einsum("...ij,...j->...i", G, a)
    Gb = jnp.einsum("...ij,...j->...i", G, b)
    al = jnp.sum(a * Ga, axis=-1)
    be = jnp.sum(b * Gb, axis=-1)
    ga = jnp.sum(a * Gb, axis=-1)
    th = 0.5 * jnp.arctan2(2.0 * ga, al - be)
    c, s = jnp.cos(th), jnp.sin(th)
    u = c[..., None] * a + s[..., None] * b
    w_ = -s[..., None] * a + c[..., None] * b
    lu = al * c**2 + 2 * ga * c * s + be * s**2
    lw = al * s**2 - 2 * ga * c * s + be * c**2
    swap = lw > lu
    vhi = jnp.where(swap[..., None], w_, u)   # larger of the pair
    vlo = jnp.where(swap[..., None], u, w_)
    whi = jnp.where(swap, lw, lu)
    wlo = jnp.where(swap, lu, lw)

    # assemble in descending order for both anchor choices
    alow = anchor_low[..., None]
    v0 = jnp.where(alow, vhi, va)
    v1 = jnp.where(alow, vlo, vhi)
    v2 = jnp.where(alow, va, vlo)
    w0 = jnp.where(anchor_low, whi, la)
    w1 = jnp.where(anchor_low, wlo, whi)
    w2 = jnp.where(anchor_low, la, wlo)
    V = jnp.stack([v0, v1, v2], axis=-1)
    w = jnp.stack([w0, w1, w2], axis=-1)
    return w, V


def svd3x3(F):
    """Batched SVD of ``(..., 3, 3)`` via the closed-form
    eigendecomposition of F^T F (:func:`eigh3x3_descending` — both
    ``jnp.linalg.svd`` and ``jnp.linalg.eigh`` are unusable for small
    batched matrices on this TPU backend, slow and worker-crashing
    respectively): ``s = sqrt(eigvals)``, ``u_i = F v_i / s_i`` for
    the two dominant columns, ``u_2 = u_0 x u_1`` sign-fixed against
    ``F v_2``.

    Returns ``(U, s, Vt)`` with ``s`` descending — same contract as
    ``jnp.linalg.svd`` up to column-sign/degenerate-subspace choices,
    which every consumer here is invariant to (singular values for
    gates; ``cameras_from_svd`` enumerates the sign ambiguities).
    """
    G = jnp.swapaxes(F, -1, -2) @ F
    w, V = eigh3x3_descending(G)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    FV = F @ V
    dtype = F.dtype
    u0 = FV[..., :, 0] / jnp.maximum(s[..., 0:1], 1e-30)
    n0 = jnp.linalg.norm(u0, axis=-1, keepdims=True)
    # rank-0 F: any orthonormal U is a valid factor
    u0 = jnp.where(n0 > 1e-20, u0 / jnp.maximum(n0, 1e-30),
                   jnp.array([1.0, 0.0, 0.0], dtype))
    u1 = FV[..., :, 1] / jnp.maximum(s[..., 1:2], 1e-30)
    # re-orthonormalize u1 against u0 (guards the degenerate pair)
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    # rank<=1 F: F v1 is parallel to u0 and the projection above is
    # pure cancellation noise — gate on s1 itself and complete with an
    # axis not aligned with u0 instead
    ex = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype), u0.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype), u0.shape)
    fill = jnp.where(jnp.abs(u0[..., 1:2]) < 0.9, ex, ey)
    fill = fill - jnp.sum(u0 * fill, axis=-1, keepdims=True) * u0
    fill = fill / jnp.maximum(
        jnp.linalg.norm(fill, axis=-1, keepdims=True), 1e-30
    )
    eps1 = 100.0 * jnp.finfo(dtype).eps
    ok1 = s[..., 1:2] > eps1 * jnp.maximum(s[..., 0:1], 1e-30)
    u1 = jnp.where(ok1, u1 / jnp.maximum(n1, 1e-30), fill)
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
