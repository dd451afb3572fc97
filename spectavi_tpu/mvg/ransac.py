"""RANSAC essential-matrix estimation as massively-parallel hypothesis scoring.

Re-design of ``RansacFitter`` (reference ``src/RansacFitter.h:21-288``)
for TPU: the reference runs sequential trials on OpenMP threads with a
lock around the best-model state and a racy first-success short-circuit.
Here a whole batch of trials is drawn with one PRNG key, solved with one
batched 7-point call, and scored as one ``(trial, root, camera, point)``
tensor; the winner is an argmax.  Deterministic given the key — which
also fixes the reference's unseeded-RNG flakiness.

Semantics parity (same gates as reference ``process_fundamental_matrix``,
``src/RansacFitter.h:42-98``):

* singular-value-ratio gate ``|s0 - s1| / ((s0 + s1)/2) <= svr_allowed``;
* E projected from F by forcing singular values ``(1, 1, 0)``;
* 4 candidate cameras from the essential decomposition;
* a point is an inlier iff DLT reprojection error <= threshold AND the
  triangulated point is in front of both cameras;
* the *raw* fundamental root (not the projected E) is returned as
  ``essential`` — matching the reference, which stores ``F0``
  (``src/RansacFitter.h:216``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spectavi_tpu.mvg.core import cameras_from_svd, hnormalize, identity_camera
from spectavi_tpu.mvg.sevenpoint import seven_point
from spectavi_tpu.mvg.triangulate import triangulate_fast_full

DEFAULT_OPTIONS = {
    "required_percent_inliers": 0.9,
    "reprojection_error_allowed": 0.5,
    "maximum_tries": 500,
    "find_best_even_in_failure": True,
    "singular_value_ratio_allowed": 3e-2,
    "progressbar": False,  # accepted for API parity; ignored
}


def ransac_essential_core(key, x0, x1, trials, reproj_allowed, svr_allowed, point_mask=None):
    """Run one batch of RANSAC trials; return the batch winner.

    Parameters
    ----------
    key : PRNG key.
    x0, x1 : ``(N, 2)`` euclidean correspondences (pre-hnormalized).
    trials : static int — number of 7-point samples in this batch.
    point_mask : optional ``(N,)`` bool — rows that are real
        correspondences (the wrapper pads N to power-of-two buckets so
        varying match counts reuse one compiled program; padded rows are
        never sampled and never counted).

    Returns
    -------
    dict with ``essential (3,3)``, ``camera (3,4)``, ``count`` (best
    inlier count), ``inlier_mask (N,)`` for the winner.
    """
    N = x0.shape[0]
    dtype = x0.dtype
    if point_mask is None:
        point_mask = jnp.ones(N, dtype=bool)
    p = point_mask.astype(dtype)
    p = p / p.sum()
    keys = jax.random.split(key, trials)
    sample = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(7,), replace=False, p=p)
    )(keys)
    F, valid = seven_point(x0[sample], x1[sample])  # (T,3,3,3), (T,3)

    P0 = identity_camera(dtype)

    def score_trial(args):
        Ft, validt = args  # (3,3,3), (3,)
        U, S, Vt = jnp.linalg.svd(Ft)
        ratio = jnp.abs(S[:, 0] - S[:, 1]) / (jnp.abs(S[:, 0] + S[:, 1]) / 2.0)
        gate = (ratio <= svr_allowed) & validt
        P1 = cameras_from_svd(U, Vt)  # (3,4,3,4)
        # score every (root, camera) against every point: (3,4,N)
        # (closed-form scoring triangulation; SVD only for the winner)
        _, reproj, infront = triangulate_fast_full(
            P0,
            P1[:, :, None, :, :],
            x0[None, None, :, :],
            x1[None, None, :, :],
        )
        inlier = (reproj <= reproj_allowed) & infront & point_mask
        counts = inlier.sum(-1)  # (3,4)
        counts = jnp.where(gate[:, None], counts, -1)
        return counts

    # vectorize trials in chunks: vmap gives the hardware wide batches,
    # the outer map bounds peak memory (each chunk scores a
    # (chunk, 3, 4, N) tensor)
    chunk = min(64, trials)
    pad = (-trials) % chunk
    Fp = jnp.pad(F, ((0, pad), (0, 0), (0, 0), (0, 0)))
    vp = jnp.pad(valid, ((0, pad), (0, 0)))
    Fc = Fp.reshape(-1, chunk, 3, 3, 3)
    vc = vp.reshape(-1, chunk, 3)
    counts = jax.lax.map(jax.vmap(score_trial), (Fc, vc))
    counts = counts.reshape(-1, 3, 4)[:trials]  # (T,3,4)
    flat = counts.reshape(-1)
    best = jnp.argmax(flat)
    it, ir, _ = jnp.unravel_index(best, counts.shape)
    Fb = F[it, ir]
    # The winner's camera must come from re-scoring all 4 candidates of
    # THIS svd call: SVD sign conventions can differ between program
    # points (observed on TPU), so reusing the camera *index* selected
    # inside score_trial could pick the opposite-translation twin.
    # Re-scoring also guarantees mask.sum() == count.
    Ub, Sb, Vtb = jnp.linalg.svd(Fb)
    P1s = cameras_from_svd(Ub, Vtb)  # (4, 3, 4)
    _, reproj, infront = triangulate_fast_full(
        P0, P1s[:, None, :, :], x0[None], x1[None]
    )
    inlier4 = (reproj <= reproj_allowed) & infront & point_mask  # (4, N)
    counts4 = inlier4.sum(-1)
    icb = jnp.argmax(counts4)
    return {
        "essential": Fb,
        "camera": P1s[icb],
        "count": counts4[icb],
        "inlier_mask": inlier4[icb],
    }


ransac_essential_batch = partial(jax.jit, static_argnames=("trials",))(
    ransac_essential_core
)


@jax.jit
def _lo_refine_step(x0, x1, weights, reproj_allowed, point_mask):
    """One local-optimization step (LO-RANSAC): weighted 8-point fit on
    the current inliers, project to an essential matrix, re-select the
    best camera by cheirality, and re-score all matches.

    ``weights (N,)`` — 1.0 for current inliers, 0.0 otherwise.
    Returns ``(E, camera, count, mask)``.
    """
    u, v = x0[:, 0], x0[:, 1]
    up, vp = x1[:, 0], x1[:, 1]
    one = jnp.ones_like(u)
    A = jnp.stack([up * u, up * v, up, vp * u, vp * v, vp, u, v, one], axis=-1)
    A = A * weights[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[8].reshape(3, 3)
    U, S, Vt3 = jnp.linalg.svd(F)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], F.dtype)) @ Vt3
    P1 = cameras_from_svd(U, Vt3)  # (4, 3, 4)
    P0 = identity_camera(x0.dtype)
    _, reproj, infront = triangulate_fast_full(
        P0, P1[:, None, :, :], x0[None], x1[None]
    )
    inlier = (reproj <= reproj_allowed) & infront & point_mask  # (4, N)
    counts = inlier.sum(-1)
    ic = jnp.argmax(counts)
    return E, P1[ic], counts[ic], inlier[ic]


def ransac_fitter(x0, x1, options=None, key=None, batch_trials=512, max_batches=2000, confidence=0.999):
    """Fit a two-view essential matrix to tentative correspondences.

    API parity with ``spectavi.mvg.ransac_fitter`` (reference
    ``spectavi/mvg.py:138-221``): same options dict, same return dict
    (``success``, ``essential``, ``camera``, ``inlier_percent``,
    ``inlier_idx``).  Extra ``key`` argument makes the fit
    deterministic; ``maximum_tries`` is honoured by looping jitted
    batches of ``batch_trials`` trials with early exit on success —
    the batched analogue of the reference's first-success
    short-circuit (``src/RansacFitter.h:185-187``).
    """
    opts = dict(DEFAULT_OPTIONS)
    if options:
        opts.update(options)
    x0 = np.asarray(x0)
    x1 = np.asarray(x1)
    if x0.shape[0] != x1.shape[0]:
        raise ValueError("Supplied incorrect point matches, numbers do not match.")
    if x0.shape[0] < 10:
        raise ValueError("Supplied less than 10 point matches, unsupported.")
    if x0.shape[1] == 3:
        x0 = np.asarray(hnormalize(x0))
    if x1.shape[1] == 3:
        x1 = np.asarray(hnormalize(x1))
    if key is None:
        key = jax.random.PRNGKey(0)

    N = x0.shape[0]
    required = opts["required_percent_inliers"]
    max_tries = int(opts["maximum_tries"])
    # pad the match count to a power-of-two bucket so different pairs
    # (multi-pair SfM) reuse one compiled program per bucket
    Np = max(16, 1 << (N - 1).bit_length())
    pmask = np.zeros(Np, dtype=bool)
    pmask[:N] = True
    x0j = jnp.asarray(np.pad(x0, ((0, Np - N), (0, 0))))
    x1j = jnp.asarray(np.pad(x1, ((0, Np - N), (0, 0))))
    pmask_j = jnp.asarray(pmask)

    best = None
    best_count = -1
    tries = 0
    batches = 0
    while tries < max_tries and batches < max_batches:
        trials = min(batch_trials, max_tries - tries)
        key, sub = jax.random.split(key)
        out = ransac_essential_batch(
            sub,
            x0j,
            x1j,
            trials,
            opts["reprojection_error_allowed"],
            opts["singular_value_ratio_allowed"],
            pmask_j,
        )
        count = int(out["count"])
        if best is None or count > best_count:
            best_count = count
            best = out
        tries += trials
        batches += 1
        w = max(best_count, 0) / N
        if w >= required:
            break
        # adaptive termination: enough trials for `confidence` odds of
        # having sampled an all-inlier 7-subset at the observed rate
        if w > 0:
            denom = np.log1p(-min(w**7, 1 - 1e-12))
            needed = np.log(1 - confidence) / denom
            if tries >= needed:
                break

    essential = np.asarray(best["essential"])
    camera = np.asarray(best["camera"])
    mask = np.asarray(best["inlier_mask"])

    # local optimization (LO-RANSAC, beyond the reference): iterated
    # all-inlier 8-point refits typically grow the consensus set
    # substantially on real data; disable with options
    # {"local_optimization": False} for strict minimal-sample parity.
    if opts.get("local_optimization", True) and mask.sum() >= 8:
        for _ in range(4):
            E_r, P_r, count_r, mask_r = _lo_refine_step(
                x0j, x1j, jnp.asarray(mask, x0j.dtype),
                opts["reprojection_error_allowed"], pmask_j,
            )
            count_r = int(count_r)
            if count_r <= best_count:
                break
            best_count = count_r
            essential = np.asarray(E_r)
            camera = np.asarray(P_r)
            mask = np.asarray(mask_r)

    success = best_count / N >= required
    return {
        "success": bool(success),
        "essential": essential,
        "camera": camera,
        "inlier_percent": best_count / N,
        "inlier_idx": np.where(mask[:N])[0].astype(np.int32),
    }
