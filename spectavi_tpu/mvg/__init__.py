"""``spectavi_tpu.mvg`` — multi-view geometry.

Public API mirrors the reference's ``spectavi.mvg``
(``/root/reference/spectavi/mvg.py``): ``hnormalize``,
``seven_point_algorithm``, ``dlt_triangulate``,
``dlt_reprojection_error``, ``ransac_fitter``,
``image_pair_rectification`` — all backed by batched JAX programs
instead of ctypes calls into per-item C++ loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spectavi_tpu.mvg.core import (  # noqa: F401
    inv3x3,
    camera_from_rt,
    cameras_from_svd,
    essential_to_cameras,
    fundamental_from_cameras,
    hnormalize,
    homogeneous,
    identity_camera,
    skew_symmetric,
)
from spectavi_tpu.mvg.ransac import (  # noqa: F401
    DEFAULT_OPTIONS,
    ransac_essential_batch,
    ransac_fitter,
)
from spectavi_tpu.mvg.rectify import image_pair_rectification, rectify_pair  # noqa: F401
from spectavi_tpu.mvg.sevenpoint import seven_point, solve_cubic  # noqa: F401
from spectavi_tpu.mvg.triangulate import (  # noqa: F401
    reprojection_error,
    triangulate_fast_full,
    triangulate,
    triangulate_full,
)


def seven_point_algorithm(x, xp):
    """Single-sample 7-point solve, reference-compatible.

    Accepts ``(7, 2)`` euclidean or ``(7, 3)`` homogeneous points
    (auto-hnormalized, reference ``spectavi/mvg.py:239-249``) and
    returns the real solutions vertically stacked as ``(3*nroot, 3)``.
    """
    x = np.asarray(x, dtype=np.float64)
    xp = np.asarray(xp, dtype=np.float64)
    if not (x.shape[0] == 7 and xp.shape[0] == 7):
        raise TypeError("Must be 7 points.")
    if not (x.shape[1] == 2 and xp.shape[1] == 2):
        x, xp = np.asarray(hnormalize(x)), np.asarray(hnormalize(xp))
    F, valid = seven_point(jnp.asarray(x), jnp.asarray(xp))
    F = np.asarray(F)
    valid = np.asarray(valid)
    return np.vstack(list(F[valid])) if valid.any() else np.zeros((0, 3))


def dlt_triangulate(P0, P1, x, xp, ret_error=False):
    """Batched DLT triangulation, reference-compatible signature
    (reference ``spectavi/mvg.py:282-302``): homogeneous ``(npt, 3)``
    inputs, returns ``(npt, 4)`` points or ``(npt, 1)`` errors."""
    P0 = np.asarray(P0, dtype=np.float64)
    P1 = np.asarray(P1, dtype=np.float64)
    if not (P0.shape == (3, 4) and P1.shape == (3, 4)):
        raise TypeError("P0,P1 must be camera matrices.")
    x = np.asarray(x, dtype=np.float64)
    xp = np.asarray(xp, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    if xp.ndim == 1:
        xp = xp[None, :]
    if x.shape[0] != xp.shape[0]:
        raise TypeError("Must be same # points or shape.")
    if not (x.ndim == 2 and xp.ndim == 2):
        raise TypeError("Wrong dimensionality of input.")
    if not (x.shape[1] == 3 and xp.shape[1] == 3):
        raise TypeError("Coords must be homogenous.")
    if ret_error:
        err = reprojection_error(jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(x), jnp.asarray(xp))
        return np.asarray(err)[:, None]
    X = triangulate(jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(x), jnp.asarray(xp))
    return np.asarray(X)


def dlt_reprojection_error(P0, P1, x, xp):
    return dlt_triangulate(P0, P1, x, xp, ret_error=True)
