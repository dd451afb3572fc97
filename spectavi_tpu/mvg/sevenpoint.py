"""Batched 7-point fundamental-matrix solver.

Capability parity with ``FundamentalMatrixFitter`` (reference
``src/FundamentalMatrixFitter.h:107-237``), re-designed for TPU:

* the 7x9 constraint matrix is built for a whole batch of 7-point
  samples at once and solved with one batched SVD;
* the cubic ``det(z*F0 + (1-z)*F1) = 0`` is NOT hand-expanded into the
  reference's ~150-term polynomial — the determinant is a cubic in
  ``z``, so its coefficients are recovered exactly by evaluating the
  (closed-form, batched) 3x3 determinant at four nodes and solving the
  tiny fixed Vandermonde system;
* the closed-form cubic solve mirrors the reference's trigonometric /
  Cardano branches (``solve_cubic``, reference
  ``src/FundamentalMatrixFitter.h:66-105``) but is branch-free
  (``jnp.where`` over sanitized operands) so it vmaps.

All functions take arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-14
_TWOPI = 6.28318530717958648


def det3(M):
    """Closed-form determinant of ``(..., 3, 3)``."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def solve_cubic(a, b, c):
    """Real roots of ``x^3 + a x^2 + b x + c = 0``, batched + branch-free.

    Returns ``(roots, valid)`` with shapes ``(..., 3)``: ``roots[..., k]``
    is meaningful where ``valid[..., k]``.  Matches the root count
    semantics of the reference ``solve_cubic`` (3 real roots in the
    trigonometric branch; 1 or 2 in the Cardano branch, 2 when the
    conjugate pair degenerates to a real double root).
    """
    a2 = a * a
    q = (a2 - 3.0 * b) / 9.0
    r = (a * (2.0 * a2 - 9.0 * b) + 27.0 * c) / 54.0
    r2 = r * r
    q3 = q * q * q
    three_real = r2 < q3

    # --- trigonometric branch (3 real roots); sanitize q3 for sqrt ---
    q3_safe = jnp.where(three_real, q3, 1.0)
    q_safe = jnp.where(three_real, q, 1.0)
    t = jnp.clip(r / jnp.sqrt(q3_safe), -1.0, 1.0)
    t = jnp.arccos(t)
    a3 = a / 3.0
    qq = -2.0 * jnp.sqrt(q_safe)
    tri0 = qq * jnp.cos(t / 3.0) - a3
    tri1 = qq * jnp.cos((t + _TWOPI) / 3.0) - a3
    tri2 = qq * jnp.cos((t - _TWOPI) / 3.0) - a3

    # --- Cardano branch (1 real root, or 2 when the pair degenerates) ---
    disc = jnp.where(three_real, 0.0, r2 - q3)
    A = -jnp.cbrt(jnp.abs(r) + jnp.sqrt(disc)) * jnp.where(r < 0, -1.0, 1.0)
    # guard A == 0 (then B := 0)
    B = jnp.where(A == 0, 0.0, q / jnp.where(A == 0, 1.0, A))
    car0 = (A + B) - a3
    car1 = -0.5 * (A + B) - a3
    imag = 0.5 * jnp.sqrt(3.0) * (A - B)
    pair_is_real = jnp.abs(imag) < _EPS

    x0 = jnp.where(three_real, tri0, car0)
    x1 = jnp.where(three_real, tri1, car1)
    x2 = jnp.where(three_real, tri2, 0.0)
    v0 = jnp.ones_like(three_real)
    v1 = three_real | pair_is_real
    v2 = three_real
    roots = jnp.stack([x0, x1, x2], axis=-1)
    valid = jnp.stack([v0, v1, v2], axis=-1)
    return roots, valid


def _det_cubic_coeffs(F0, F1):
    """Coefficients (a, b, c, d) of ``det(z*F0 + (1-z)*F1)`` in ``z``.

    Exact for any ``F0, F1``: the determinant of an affine pencil of 3x3
    matrices is a cubic polynomial, so four evaluations pin it down.
    Nodes 0, 1, -1, 2 give an integer (well-conditioned) Vandermonde.
    """
    p0 = det3(F1)  # z = 0
    p1 = det3(F0)  # z = 1
    pm1 = det3(2.0 * F1 - F0)  # z = -1
    p2 = det3(2.0 * F0 - F1)  # z = 2
    d = p0
    b = 0.5 * (p1 + pm1) - p0
    s1 = p1 - p0 - b  # a + c
    s2 = 0.5 * (p2 - p0 - 4.0 * b)  # 4a + c
    a = (s2 - s1) / 3.0
    c = s1 - a
    return a, b, c, d


def nullspace2_mgs(A):
    """Two-vector null-space basis of batched ``(..., 7, 9)`` systems,
    LAPACK-free.

    Modified Gram-Schmidt orthonormalizes the 7 constraint rows, then
    the null basis is extracted from the complement projector
    ``P = I - Q Q^T`` (rank 2): its strongest column, and the
    strongest remaining column re-orthogonalized against it.  Exists
    because ``jnp.linalg.svd`` inside ``lax.while_loop`` stalls this
    machine's TPU compiler for tens of minutes (and ``eigh`` crashes
    the worker outright) — the whole-fit device RANSAC loop needs a
    closed-form path.
    """
    dtype = A.dtype
    qs = []
    for i in range(7):
        v = A[..., i, :]
        for q in qs:
            v = v - jnp.sum(q * v, axis=-1, keepdims=True) * q
        # second MGS pass stabilizes near-dependent rows
        for q in qs:
            v = v - jnp.sum(q * v, axis=-1, keepdims=True) * q
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # degenerate sample (dependent constraints): contribute nothing
        qs.append(jnp.where(n > 1e-25, v / jnp.maximum(n, 1e-30), 0.0))
    Q = jnp.stack(qs, axis=-2)  # (..., 7, 9)
    P = jnp.eye(9, dtype=dtype) - jnp.einsum("...ki,...kj->...ij", Q, Q)
    norms = jnp.sum(P * P, axis=-2)  # (..., 9) column strengths
    c0 = jnp.argmax(norms, axis=-1)
    v0 = jnp.take_along_axis(P, c0[..., None, None], axis=-1)[..., 0]
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=-1, keepdims=True), 1e-30)
    P1 = P - v0[..., :, None] * v0[..., None, :]
    norms1 = jnp.sum(P1 * P1, axis=-2)
    c1 = jnp.argmax(norms1, axis=-1)
    v1 = jnp.take_along_axis(P1, c1[..., None, None], axis=-1)[..., 0]
    v1 = v1 - jnp.sum(v0 * v1, axis=-1, keepdims=True) * v0
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-30)
    return v0, v1


def seven_point(x, xp, nullspace="svd"):
    """Batched 7-point algorithm.

    Parameters
    ----------
    x, xp : ``(..., 7, 2)``
        Euclidean point correspondences.
    nullspace : ``"svd"`` (reference-faithful, LAPACK) or ``"mgs"``
        (closed-form :func:`nullspace2_mgs` — required inside device
        loops on this TPU backend; any null-space basis spans the same
        F pencil, so the recovered roots agree).

    Returns
    -------
    F : ``(..., 3, 3, 3)``
        Up to three fundamental matrices per batch element.
    valid : ``(..., 3)`` bool
        Which of the three candidate matrices are real solutions.
    """
    u, v = x[..., 0], x[..., 1]
    up, vp = xp[..., 0], xp[..., 1]
    one = jnp.ones_like(u)
    # epipolar constraint rows [x'x, x'y, x', y'x, y'y, y', x, y, 1]
    # (reference add_putative_match, src/FundamentalMatrixFitter.h:110-124)
    A = jnp.stack(
        [up * u, up * v, up, vp * u, vp * v, vp, u, v, one], axis=-1
    )  # (..., 7, 9)
    if nullspace == "mgs":
        n0, n1 = nullspace2_mgs(A)
        F0 = n0.reshape(*n0.shape[:-1], 3, 3)
        F1 = n1.reshape(*n1.shape[:-1], 3, 3)
    else:
        _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
        F0 = Vt[..., 7, :].reshape(*Vt.shape[:-2], 3, 3)
        F1 = Vt[..., 8, :].reshape(*Vt.shape[:-2], 3, 3)

    a, b, c, d = _det_cubic_coeffs(F0, F1)
    degenerate = jnp.abs(a) < _EPS
    a_safe = jnp.where(degenerate, 1.0, a)
    roots, valid = solve_cubic(b / a_safe, c / a_safe, d / a_safe)
    valid = valid & ~degenerate[..., None]

    # F_k = z_k * F0 + (1 - z_k) * F1 for each of the 3 roots
    F = (
        roots[..., :, None, None] * F0[..., None, :, :]
        + (1.0 - roots[..., :, None, None]) * F1[..., None, :, :]
    )
    return F, valid
