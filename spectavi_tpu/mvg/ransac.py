"""RANSAC essential-matrix estimation as massively-parallel hypothesis scoring.

Re-design of ``RansacFitter`` (reference ``src/RansacFitter.h:21-288``)
for TPU: the reference runs sequential trials on OpenMP threads with a
lock around the best-model state and a racy first-success
short-circuit.  Here each 8192-trial mega-batch is ONE straight-line
jitted device program: one batched 7-point call; a cheap Sampson
epipolar prescreen RANKS all ``trials x 3`` roots
(:func:`_sampson_counts` — ~40 flops/point; the round-3 design scored
every hypothesis with the full triangulate-4-cameras criterion and
spent 1.9 s/2048-trial block on it, 38x this path); then the top-16
shortlist is re-scored and LO-polished under the exact reference
criterion, so the returned winner/count/inlier mask keep reference
semantics.  The host drives a thin adaptive loop around the block
program with depth-2 speculative pipelining (block k+1's kernel runs
while block k's count crosses the tunnel); a warm castle fit is
0.2-0.4 s end to end.  Deterministic given the key — which also fixes
the reference's unseeded-RNG flakiness.

TPU-specific linear algebra: hypothesis scoring decomposes F with
:func:`spectavi_tpu.mvg.core.svd3x3` (closed-form —
``jnp.linalg.svd`` is a slow iterative kernel for small batched
matrices on TPU and ``jnp.linalg.eigh`` crashes the worker outright),
and the LO-RANSAC 8-point refit uses a thin SVD instead of
``full_matrices=True`` (which would build an N x N basis).

Semantics parity (same gates as reference ``process_fundamental_matrix``,
``src/RansacFitter.h:42-98``):

* singular-value-ratio gate ``|s0 - s1| / ((s0 + s1)/2) <= svr_allowed``;
* E projected from F by forcing singular values ``(1, 1, 0)``;
* 4 candidate cameras from the essential decomposition;
* a point is an inlier iff DLT reprojection error <= threshold AND the
  triangulated point is in front of both cameras;
* the *raw* fundamental root (not the projected E) is returned as
  ``essential`` — matching the reference, which stores ``F0``
  (``src/RansacFitter.h:216``).  Exception: when the LO-RANSAC
  extension (absent from the reference) improves the model, the
  returned ``essential`` is the locally-optimized, singular-value-
  projected E — the model the returned camera/inliers belong to.
  Disable with ``options={"local_optimization": False}`` for strict
  raw-root parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spectavi_tpu.mvg.core import (
    cameras_from_svd,
    hnormalize,
    identity_camera,
    svd3x3,
)
from spectavi_tpu.mvg.sevenpoint import seven_point
from spectavi_tpu.mvg.triangulate import triangulate_fast_full

DEFAULT_OPTIONS = {
    "required_percent_inliers": 0.9,
    "reprojection_error_allowed": 0.5,
    "maximum_tries": 500,
    "find_best_even_in_failure": True,
    "singular_value_ratio_allowed": 3e-2,
    # stdout progress over the trial budget, like the reference's bar
    # (src/RansacFitter.h:169-184).  Batched trials finish in a few
    # blocks, so the bar advances per mega-batch, not per trial.
    "progressbar": False,
}

_PROGRESS_BAR_LENGTH = 50  # reference: PROGRESS_BAR_LENGTH (src/RansacFitter.h:19)


def _sample_subsets(key, n, trials, point_mask):
    """Draw ``(trials, 7)`` index samples without replacement from the
    unmasked rows: uniform keys + 7 iterated masked argmins (argmin is
    cheap in XLA; ``random.choice(replace=False)`` sorts)."""
    u = jax.random.uniform(key, (trials, n))
    u = jnp.where(point_mask[None, :], u, jnp.inf)
    idxs = []
    for _ in range(7):
        i = jnp.argmin(u, axis=1)
        idxs.append(i)
        u = u.at[jnp.arange(trials), i].set(jnp.inf)
    return jnp.stack(idxs, axis=1)


def _score_hypotheses(F, valid, x0, x1, point_mask, reproj_allowed, svr_allowed, chunk=64):
    """Inlier counts for a batch of 7-point roots.

    ``F (T, 3, 3, 3)``, ``valid (T, 3)`` -> ``counts (T, 3)`` with -1
    where the SVR/validity gate fails.
    """
    trials = F.shape[0]
    P0 = identity_camera(x0.dtype)

    def score_trial(args):
        Ft, validt = args  # (3,3,3), (3,)
        U, S, Vt = svd3x3(Ft)
        ratio = jnp.abs(S[:, 0] - S[:, 1]) / (jnp.abs(S[:, 0] + S[:, 1]) / 2.0)
        gate = (ratio <= svr_allowed) & validt
        P1 = cameras_from_svd(U, Vt)  # (3,4,3,4)
        _, reproj, infront = triangulate_fast_full(
            P0,
            P1[:, :, None, :, :],
            x0[None, None, :, :],
            x1[None, None, :, :],
        )
        inlier = (reproj <= reproj_allowed) & infront & point_mask
        counts = inlier.sum(-1).astype(jnp.int32)  # (3,4)
        return jnp.where(gate[:, None], counts, -1).max(-1)  # (3,)

    pad = (-trials) % chunk
    Fp = jnp.pad(F, ((0, pad), (0, 0), (0, 0), (0, 0)))
    vp = jnp.pad(valid, ((0, pad), (0, 0)))
    Fc = Fp.reshape(-1, chunk, 3, 3, 3)
    vc = vp.reshape(-1, chunk, 3)
    counts = jax.lax.map(jax.vmap(score_trial), (Fc, vc))
    return counts.reshape(-1, 3)[:trials]  # (T, 3)


def _sampson_counts(F, valid, x0, x1, point_mask, reproj_allowed, svr_allowed, chunk=1024):
    """Cheap epipolar (Sampson) inlier counts for RANKING hypotheses.

    Same gates as :func:`_score_hypotheses` (SVR + validity), but the
    per-point test is the first-order Sampson distance of the
    singular-value-projected E instead of the reference's full
    triangulate-4-cameras + cheirality criterion — ~40 flops/point
    instead of ~10^3.  The shortlist this ranking produces is re-scored
    with the exact reference criterion (``_rescore_best`` + the LO
    polish) before anything is returned, so the winner's count and
    inlier mask keep reference semantics; only which hypotheses make
    the top-k shortlist can differ, and only near the decision
    boundary.  Measured on castle: ranking by Sampson vs full scoring
    picks shortlists whose polished winners agree, at ~20x less device
    time (the full scoring was 1.9 s/2048-trial block — the single-chip
    pipeline's dominant cost).

    ``F (T, 3, 3, 3)``, ``valid (T, 3)`` -> ``(counts (T, 3),
    gate (T, 3))``: ``counts`` is the Sampson inlier count of every
    VALID root (-1 only where the 7-point solve itself failed —
    invalid roots are numerical garbage and must never seed anything),
    ``gate`` is the reference's SVR+validity gate.  Callers that need
    reference parity use ``where(gate, counts, -1)``; the LO seeding
    deliberately keeps SVR near-misses (see :func:`ransac_fit_block`).
    """
    trials = F.shape[0]
    thr2 = (0.5 * reproj_allowed) ** 2  # reproj is err0+err1; Sampson ~ one-image distance

    def count_trial(args):
        Ft, validt = args  # (3,3,3), (3,)
        U, S, Vt = svd3x3(Ft)
        ratio = jnp.abs(S[:, 0] - S[:, 1]) / (jnp.abs(S[:, 0] + S[:, 1]) / 2.0)
        gate = (ratio <= svr_allowed) & validt
        E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], Ft.dtype)) @ Vt
        # homogeneous points
        x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=-1)  # (N, 3)
        x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
        Ex0 = jnp.einsum("rij,nj->rni", E, x0h)  # (3, N, 3)
        Etx1 = jnp.einsum("rji,nj->rni", E, x1h)
        xEx = jnp.einsum("ni,rni->rn", x1h, Ex0)  # (3, N)
        denom = (
            Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2
            + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2
        )
        sampson2 = (xEx * xEx) / jnp.maximum(denom, 1e-30)
        inlier = (sampson2 <= thr2) & point_mask[None, :]
        counts = inlier.sum(-1).astype(jnp.int32)  # (3,)
        return jnp.where(validt, counts, -1), gate

    pad = (-trials) % chunk
    Fp = jnp.pad(F, ((0, pad), (0, 0), (0, 0), (0, 0)))
    vp = jnp.pad(valid, ((0, pad), (0, 0)))
    Fc = Fp.reshape(-1, chunk, 3, 3, 3)
    vc = vp.reshape(-1, chunk, 3)
    counts, gate = jax.lax.map(jax.vmap(count_trial), (Fc, vc))
    return (
        counts.reshape(-1, 3)[:trials],
        gate.reshape(-1, 3)[:trials],
    )  # (T, 3) x2


def _rescore_best(F, x0, x1, point_mask, reproj_allowed):
    """Re-score one F: best of its 4 cameras, with the mask.

    The winner's camera must be instantiated and scored from ONE
    decomposition call site: SVD sign conventions can differ between
    program points (observed on TPU), so a camera *index* chosen
    elsewhere could pick the opposite-translation twin.
    """
    P0 = identity_camera(x0.dtype)
    U, S, Vt = svd3x3(F)
    P1s = cameras_from_svd(U, Vt)  # (4, 3, 4)
    _, reproj, infront = triangulate_fast_full(
        P0, P1s[:, None, :, :], x0[None], x1[None]
    )
    inlier = (reproj <= reproj_allowed) & infront & point_mask  # (4, N)
    counts = inlier.sum(-1).astype(jnp.int32)
    ic = jnp.argmax(counts)
    return P1s[ic], counts[ic], inlier[ic]


def ransac_essential_core(key, x0, x1, trials, reproj_allowed, svr_allowed, point_mask=None):
    """Run one batch of RANSAC trials; return the batch winner.

    Parameters
    ----------
    key : PRNG key.
    x0, x1 : ``(N, 2)`` euclidean correspondences (pre-hnormalized).
    trials : static int — number of 7-point samples in this batch.
    point_mask : optional ``(N,)`` bool — rows that are real
        correspondences (wrappers pad N to power-of-two buckets so
        varying match counts reuse one compiled program; padded rows
        are never sampled and never counted).

    Returns
    -------
    dict with ``essential (3,3)``, ``camera (3,4)``, ``count`` (best
    inlier count, -1 if every hypothesis failed the gate),
    ``inlier_mask (N,)`` for the winner.
    """
    N = x0.shape[0]
    if point_mask is None:
        point_mask = jnp.ones(N, dtype=bool)
    sample = _sample_subsets(key, N, trials, point_mask)
    F, valid = seven_point(x0[sample], x1[sample], nullspace="mgs")
    counts, gate = _sampson_counts(
        F, valid, x0, x1, point_mask, reproj_allowed, svr_allowed
    )
    counts = jnp.where(gate, counts, -1)  # strict reference gating here
    flat = counts.reshape(-1)
    # the Sampson prescreen only guarantees (and is only tested to put)
    # the exact-criterion winner in the top-k, not at the argmax — so
    # re-score a k-shortlist under the exact reference criterion and
    # pick the exact-count argmax (mirrors ransac_fit_block's shortlist
    # re-scoring; round-4 advisor finding)
    k_rank = min(8, flat.shape[0])
    topv, top_i = jax.lax.top_k(flat, k_rank)
    it, ir = jnp.unravel_index(top_i, counts.shape)
    Fk = F[it, ir]  # (k, 3, 3)
    cams, cnts, msks = jax.vmap(
        lambda Fb: _rescore_best(Fb, x0, x1, point_mask, reproj_allowed)
    )(Fk)
    cnts = jnp.where(topv >= 0, cnts, -1)  # gate-failing seeds can't win
    bi = jnp.argmax(cnts)
    best_ok = cnts[bi] >= 0
    return {
        "essential": Fk[bi],
        "camera": cams[bi],
        "count": jnp.where(best_ok, cnts[bi], -1),
        "inlier_mask": msks[bi] & best_ok,
    }


ransac_essential_batch = partial(jax.jit, static_argnames=("trials",))(
    ransac_essential_core
)


def _cg_solve9(G, b, iters=16):
    """Solve ``G x = b`` for 9x9 SPD ``G`` by unrolled conjugate
    gradient — pure vector ops, no LAPACK, no scalar-graph explosion
    (both of which stall/crash this TPU backend's compiler)."""
    x = jnp.zeros_like(b)
    r = b
    p = b
    rs = jnp.dot(r, r)
    for _ in range(iters):
        Ap = G @ p
        alpha = rs / jnp.maximum(jnp.dot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.dot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        rs = rs_new
    return x


def _lo_refine_step(x0, x1, weights, reproj_allowed, weight_allowed,
                    point_mask, F_init):
    """One LO-RANSAC step: weighted 8-point refit on the current
    inliers, projection to an essential matrix, camera re-selection,
    full re-score.

    The smallest singular direction of the weighted constraint matrix
    comes from ridged inverse iteration on ``G = A^T A`` with an
    unrolled-CG inner solve (no LAPACK: ``svd``/``eigh`` here either
    stall this TPU backend's compiler for minutes or crash the worker;
    see ``sevenpoint.nullspace2_mgs`` for the same story), warm-started
    from the current RANSAC winner ``F_init`` so 2 iterations converge
    far below the inlier noise floor.
    """
    u, v = x0[:, 0], x0[:, 1]
    up, vp = x1[:, 0], x1[:, 1]
    one = jnp.ones_like(u)
    A = jnp.stack([up * u, up * v, up, vp * u, vp * v, vp, u, v, one], axis=-1)
    A = A * weights[:, None]
    G = jnp.swapaxes(A, 0, 1) @ A
    G = G / jnp.maximum(jnp.trace(G), 1e-30)
    G = G + (100.0 * jnp.finfo(x0.dtype).eps) * jnp.eye(9, dtype=x0.dtype)
    f = F_init.reshape(9)
    f = f / jnp.maximum(jnp.linalg.norm(f), 1e-30)
    for _ in range(2):
        f = _cg_solve9(G, f)
        f = f / jnp.maximum(jnp.linalg.norm(f), 1e-30)
    F = f.reshape(3, 3)
    U3, S3, Vt3 = svd3x3(F)
    E = U3 @ jnp.diag(jnp.array([1.0, 1.0, 0.0], F.dtype)) @ Vt3
    P1 = cameras_from_svd(U3, Vt3)  # (4, 3, 4)
    P0 = identity_camera(x0.dtype)
    _, reproj, infront = triangulate_fast_full(
        P0, P1[:, None, :, :], x0[None], x1[None]
    )
    inlier = (reproj <= reproj_allowed) & infront & point_mask  # (4, N)
    loose = (reproj <= weight_allowed) & infront & point_mask
    counts = inlier.sum(-1).astype(jnp.int32)
    ic = jnp.argmax(counts)
    return E, P1[ic], counts[ic], inlier[ic], loose[ic]


@partial(jax.jit, static_argnames=("batch_trials", "lo_iters"))
def ransac_fit_block(
    key,
    x0,
    x1,
    point_mask,
    reproj_allowed,
    svr_allowed,
    live_trials,
    batch_trials=2048,
    lo_iters=3,
):
    """One RANSAC mega-batch + winner re-score + fused LO refinement as
    a single straight-line device program.

    Deliberately contains NO ``while_loop`` and NO LAPACK calls: on
    this machine's TPU backend ``linalg.eigh`` crashes the worker,
    ``linalg.svd`` compiles for minutes, and loop-wrapped versions of
    either stall the remote compiler beyond 10 minutes even at tiny
    shapes.  Everything inside is closed-form/vectorized (MGS 7-point
    null spaces, ``svd3x3``, unrolled-CG inverse iteration for the LO
    8-point).  The host drives the adaptive/confidence loop around
    this block — typically ONE call, so one dispatch + one result pull
    per fit.

    ``live_trials``: number of leading trials allowed to win (the
    remainder are masked) — this is how ``maximum_tries`` is honoured
    exactly without recompiling for the final partial batch.

    Returns ``(essential, camera, count, inlier_mask)``; ``count`` is
    -1 when no raw root passed the reference gate AND no LO seed
    produced a model (see below).
    """
    N = x0.shape[0]
    sample = _sample_subsets(key, N, batch_trials, point_mask)
    F, valid = seven_point(x0[sample], x1[sample], nullspace="mgs")
    live = jnp.arange(batch_trials) < live_trials
    counts, gate = _sampson_counts(
        F, valid & live[:, None], x0, x1, point_mask,
        reproj_allowed, svr_allowed,
    )
    flat_counts = counts.reshape(-1)  # -1 only for invalid/masked roots
    flat_gate = gate.reshape(-1)

    # fused LO-RANSAC over the TOP-K seeds with threshold annealing
    # (Chum et al.: refit on inliers at a loosened threshold, shrink
    # toward the true one).  Minimal 7-point samples on real scenes
    # with unmodelled lens distortion give E's far from the best
    # consensus — several competing local optima exist — so polishing
    # only the argmax trial leaves 15-30% of the achievable consensus
    # on the table (measured on castle: 0.38-0.70 across PRNG keys
    # before, 0.58+ consistently after).
    #
    # Seeding deliberately ADMITS SVR-gate near-misses: at ex01's
    # svr_allowed=1e-3 only ~1-5 of 24k roots pass the gate per batch
    # on castle (measured round 4), so gating the LO seeds too made
    # the block winner a lottery over a handful of hypotheses.  A
    # gate-failing but Sampson-strong VALID root is a fine LO seed —
    # the LO output is singular-value-projected, i.e. exactly
    # essential (SVR = 0) — while its RAW result keeps the strict
    # reference gate (with lo_iters=0 behaviour is exactly the
    # reference's).  Gate-passers still rank strictly above
    # near-misses in the seed order.
    k_seeds = 16
    seed_key = flat_counts + jnp.where(flat_gate, N + 2, 0)
    _, top_i = jax.lax.top_k(seed_key, k_seeds)
    it, ir = jnp.unravel_index(top_i, counts.shape)
    okb_all = flat_gate[top_i]  # reference gate per seed
    validb_all = flat_counts[top_i] >= 0  # 7-point-valid, live per seed
    muls = (2.0, 1.4, 1.0)

    def polish(Fb, okb, validb):
        cam0, cnt0, msk0 = _rescore_best(
            Fb, x0, x1, point_mask, reproj_allowed
        )
        best_E, best_cam = Fb, cam0
        best_cnt = jnp.where(okb, cnt0, -1)  # raw result: strict gate
        best_msk = msk0 & okb
        Fcur = Fb
        wsel = msk0 & validb  # LO seed weights: full-criterion inliers
        enough = validb & (cnt0 >= 8)
        for m in muls[:lo_iters]:
            E2, P2, c2, m2, loose2 = _lo_refine_step(
                x0, x1, wsel.astype(x0.dtype), reproj_allowed,
                reproj_allowed * m, point_mask, Fcur,
            )
            c2 = jnp.where(enough, c2, -1)
            better = c2 > best_cnt
            best_E = jnp.where(better, E2, best_E)
            best_cam = jnp.where(better, P2, best_cam)
            best_cnt = jnp.maximum(best_cnt, c2)
            best_msk = jnp.where(better, m2, best_msk)
            # continue the anneal from the refined model regardless of
            # whether this rung improved the theta-count
            Fcur = jnp.where(enough, E2, Fcur)
            wsel = jnp.where(enough, loose2, wsel)
        return best_E, best_cam, best_cnt, best_msk

    Es, cams, cnts, msks = jax.vmap(polish)(F[it, ir], okb_all, validb_all)
    bi = jnp.argmax(cnts)
    return Es[bi], cams[bi], cnts[bi], msks[bi]


def ransac_fitter(x0, x1, options=None, key=None, batch_trials=8192, confidence=0.999):
    """Fit a two-view essential matrix to tentative correspondences.

    API parity with ``spectavi.mvg.ransac_fitter`` (reference
    ``spectavi/mvg.py:138-221``): same options dict, same return dict
    (``success``, ``essential``, ``camera``, ``inlier_percent``,
    ``inlier_idx``).  Extra ``key`` argument makes the fit
    deterministic.  The host loops :func:`ransac_fit_block` mega-batch
    programs, keeping the best block result; it stops when the
    required count is reached (the batched analogue of the reference's
    first-success short-circuit, ``src/RansacFitter.h:185-187``), when
    ``maximum_tries`` trials have been drawn (honoured exactly via
    live-trial masking — no silent cap), or when enough trials have
    run for ``confidence`` odds of having sampled an all-inlier
    7-subset at the observed inlier rate.  The typical fit is ONE
    block call — one device dispatch + one result pull.
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
    # size the static mega-batch to the trial budget: a caller asking
    # for 500 tries shouldn't pay for (and compile) an 8192-trial
    # program with 94% of its trials masked off
    batch_trials = min(
        batch_trials,
        max(512, 1 << int(np.ceil(np.log2(max(max_tries, 2))))),
    )
    # pad the match count to a power-of-two bucket so different pairs
    # (multi-pair SfM) reuse one compiled program per bucket
    Np = max(16, 1 << (N - 1).bit_length())
    pmask = np.zeros(Np, dtype=bool)
    pmask[:N] = True
    x0j = jnp.asarray(np.pad(x0, ((0, Np - N), (0, 0))))
    x1j = jnp.asarray(np.pad(x1, ((0, Np - N), (0, 0))))

    lo_iters = 3 if opts.get("local_optimization", True) else 0
    required_count = int(np.ceil(required * N))
    pmask_j = jnp.asarray(pmask)
    reproj_j = jnp.asarray(opts["reprojection_error_allowed"], x0j.dtype)
    svr_j = jnp.asarray(opts["singular_value_ratio_allowed"], x0j.dtype)

    best = None
    best_count = -1
    tries = 0
    stalled = 0

    # Speculative pipelining: keep `depth` mega-batch blocks in flight
    # and only then pull the oldest block's count.  JAX dispatch is
    # async, so block k+1's kernel runs while the host waits on block
    # k's result through the tunnel — the ~0.5-1 s/pull latency that
    # used to serialize every block (round-3 castle step3: 7.7-9.7 s
    # warm for 3-5 blocks) is paid once, not per block.  Termination
    # semantics are unchanged; at most `depth-1` speculative blocks of
    # device work are discarded on early exit.
    import collections

    pending = collections.deque()
    planned = 0

    def _enqueue():
        nonlocal key, planned
        live = min(batch_trials, max_tries - planned)
        key, sub = jax.random.split(key)
        out = ransac_fit_block(
            sub, x0j, x1j, pmask_j, reproj_j, svr_j,
            jnp.asarray(live, jnp.int32),
            batch_trials=batch_trials,
            lo_iters=lo_iters,
        )
        pending.append((out, live))
        planned += live

    depth = 2
    while planned < max_tries and len(pending) < depth:
        _enqueue()
    progressbar = bool(opts.get("progressbar"))
    while pending:
        out, live = pending.popleft()
        count = int(out[2])
        if progressbar:
            frac = min((tries + live) / max_tries, 1.0)
            n = int(_PROGRESS_BAR_LENGTH * frac)
            print(
                "\r[" + "=" * n + " " * (_PROGRESS_BAR_LENGTH - n)
                + f"] {tries + live}/{max_tries} trials, best {max(count, best_count, 0)}",
                end="", flush=True,
            )
        if count > best_count + max(2, int(0.005 * N)):
            stalled = 0  # still materially improving
        else:
            stalled += 1
        if count > best_count:
            best_count = count
            best = out
        tries += live
        if best_count >= required_count:
            break
        # adaptive termination: enough trials for `confidence` odds of
        # an all-inlier 7-subset at the observed inlier rate — but only
        # once mega-batches stop materially (>0.5%) improving the
        # consensus, bounded to 6 extra blocks (real scenes with
        # unmodelled distortion have several competing local optima;
        # one 2048-trial batch is cheap next to returning a
        # 0.38-consensus model when a 0.53 one exists)
        w = max(best_count, 0) / N
        if w > 0 and (stalled >= 2 or tries >= 8 * batch_trials):
            needed = np.log(1.0 - confidence) / np.log1p(
                -min(w**7, 1.0 - 1e-12)
            )
            if tries >= needed:
                break
        if planned < max_tries and len(pending) < depth:
            _enqueue()
    if progressbar:
        print(flush=True)
    if best is None or best_count < 0:
        # every trial failed the SVR/validity gate: no model was ever
        # stored (reference parity — a gate-failing F never reaches the
        # best-fit state, src/RansacFitter.h:200-252).  ``best`` stays
        # None in that case (a -1 count never beats the initial -1), so
        # this check must precede the unpack.
        return {
            "success": False,
            "essential": np.zeros((3, 3)),
            "camera": np.zeros((3, 4)),
            "inlier_percent": 0.0,
            "inlier_idx": np.zeros((0,), np.int32),
        }

    essential, camera, _, mask = best
    success = best_count / N >= required
    if not success and not opts["find_best_even_in_failure"]:
        # reference parity (src/RansacFitter.h:206-230): without this
        # flag a below-threshold model is never stored, so failure
        # returns empty outputs rather than the best-so-far model.
        return {
            "success": False,
            "essential": np.zeros((3, 3)),
            "camera": np.zeros((3, 4)),
            "inlier_percent": best_count / N,
            "inlier_idx": np.zeros((0,), np.int32),
        }
    mask = np.asarray(mask)
    return {
        "success": bool(success),
        "essential": np.asarray(essential),
        "camera": np.asarray(camera),
        "inlier_percent": best_count / N,
        "inlier_idx": np.where(mask[:N])[0].astype(np.int32),
    }
