"""SIFT keypoint detection and description on TPU.

From-scratch JAX implementation of the SIFT algorithm following
vlfeat's conventions (the reference wraps vlfeat's C implementation,
``src/Sift.h:49-137``; the driver loop there is octave-serial and
keypoint-serial).  Here every stage is a batched array program with
static shapes:

* the Gaussian scale space is built with separable replicate-pad
  convolutions (XLA convs);
* DoG extrema detection is a single 26-neighbour comparison over the
  whole ``(scales, H, W)`` volume;
* the dynamic keypoint count is handled with the padding/masking
  discipline: candidates are compacted to a static per-octave budget
  with ``jnp.nonzero(size=...)`` and every later stage carries a
  validity mask;
* sub-pixel refinement is Newton iteration on *all* candidates at once
  (3x3 closed-form solves, gathered 27-neighbourhoods);
* orientation histograms and the 4x4x8 descriptor are computed as
  batched window gathers + separable triangle-weight contractions
  (an einsum — MXU work — instead of vlfeat's per-pixel scatter).

Parameters mirror the reference's defaults: ``S = 3`` levels/octave,
``o_min = -1`` (2x upsampled first octave), auto octave count,
``edge_thresh = 10``, ``peak_thresh = 0``, ``magnif = 3``.  Output rows
are ``[x, y, sigma, angle, 128-d descriptor]`` = 132 floats with the
descriptor scaled by 512 and clamped to [0, 255], exactly the
reference's layout (``src/Sift.h:13,115-121``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spectavi_tpu.mvg.core import inv3x3

# --- fixed algorithm constants (vlfeat conventions) ---
S = 3  # levels per octave
S_MIN = -1
S_MAX = S + 1  # levels run s_min .. s_max  (S+3 images per octave)
SIGMA_N = 0.5  # nominal smoothing of the input image
SIGMA_K = 2.0 ** (1.0 / S)
SIGMA_0 = 1.6 * SIGMA_K
NBINS_ORI = 36
NBP = 4  # spatial bins per side
NBO = 8  # orientation bins
WIN_FACTOR = float(NBP) / 2  # descriptor Gaussian window factor
MAX_ANGLES = 4

TWO_PI = 2.0 * np.pi


def _gaussian_kernel(sigma):
    r = max(int(np.ceil(4.0 * sigma)), 1)
    xs = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _blur(im, sigma):
    """Separable Gaussian blur with replicate padding (vlfeat's
    PAD_BY_CONTINUITY convolution).

    BOTH passes are sums of statically shifted slices in fp32 — pure
    VPU work that XLA fuses into one loop per pass, keeping the natural
    ``(H, W)`` lanes-on-W layout.  Measured on the v5e
    (``benchmarks/profile_blur_variants.py``): a castle-octave(-1)
    blur is ~1 ms this way, while a 1-channel
    ``conv_general_dilated`` row pass costs ~55 ms (single-channel
    convs hit a pathological MXU layout), and a width-1-lane spatial
    conv col pass explodes its padding 128x under vmap.  fp32 slice
    sums differ from the HIGHEST-precision conv by <=2 ulp on [0,1)
    images — below the DoG detection thresholds (golden-parity tests
    unchanged).
    """
    if sigma < 1e-8:
        return im
    k = _gaussian_kernel(sigma)
    r = (k.shape[0] - 1) // 2

    def pass_along(a, axis, n):
        acc = float(k[0]) * jax.lax.slice_in_dim(a, 0, n, axis=axis)
        for d in range(1, 2 * r + 1):
            acc = acc + float(k[d]) * jax.lax.slice_in_dim(
                a, d, d + n, axis=axis
            )
        return acc

    # rows (along W)
    p = jnp.pad(im, ((0, 0), (r, r)), mode="edge")
    im = pass_along(p, 1, im.shape[1])
    # cols (along H)
    p = jnp.pad(im, ((r, r), (0, 0)), mode="edge")
    return pass_along(p, 0, im.shape[0])


def _upsample2(im):
    """2x bilinear upsample, vlfeat ``copy_and_upsample_rows`` applied
    twice: out[2i] = in[i], out[2i+1] = (in[i] + in[i+1]) / 2 (clamped)."""

    def up_axis(a, axis):
        a = jnp.moveaxis(a, axis, 0)
        nxt = jnp.concatenate([a[1:], a[-1:]], axis=0)
        half = 0.5 * (a + nxt)
        out = jnp.stack([a, half], axis=1).reshape((-1,) + a.shape[1:])
        return jnp.moveaxis(out, 0, axis)

    return up_axis(up_axis(im, 0), 1)


def _downsample2(im):
    return im[::2, ::2]


def num_octaves(height, width, o_min=-1):
    return max(int(np.floor(np.log2(min(width, height)))) - o_min - 3, 1)


def _octave_levels_core(first):
    """All levels of one octave from its first level (the per-level
    incremental sigmas are static constants)."""
    levels = [first]
    for s in range(S_MIN + 1, S_MAX + 1):
        sd = SIGMA_0 * np.sqrt(SIGMA_K ** (2 * s) - SIGMA_K ** (2 * s - 2))
        levels.append(_blur(levels[-1], sd))
    gss = jnp.stack(levels)
    dog = gss[1:] - gss[:-1]
    mod, ang = _gradients(gss)
    return gss, dog, mod, ang


def _gradients(gss):
    """Gradient modulus/angle for the descriptor/orientation levels.

    ``gss``: ``(S+3, H, W)``; returns ``(mod, ang)`` of shape
    ``(S, H, W)`` for levels s = 0..S-1 (indices 1..S of the octave).
    Central differences with the 0.5 factor, edges replicated.
    """
    lv = gss[1 : 1 + S]
    gx = 0.5 * (jnp.roll(lv, -1, axis=2) - jnp.roll(lv, 1, axis=2))
    gy = 0.5 * (jnp.roll(lv, -1, axis=1) - jnp.roll(lv, 1, axis=1))
    # replicate edge gradients (roll wraps; fix borders with one-sided)
    gx = gx.at[:, :, 0].set(lv[:, :, 1] - lv[:, :, 0])
    gx = gx.at[:, :, -1].set(lv[:, :, -1] - lv[:, :, -2])
    gy = gy.at[:, 0, :].set(lv[:, 1, :] - lv[:, 0, :])
    gy = gy.at[:, -1, :].set(lv[:, -1, :] - lv[:, -2, :])
    mod = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.mod(jnp.arctan2(gy, gx), TWO_PI)
    return mod, ang


def _extrema_mask(dog, peak_thresh):
    """26-neighbour extrema of the DoG volume ``(S+2, H, W)`` at scales
    1..S (i.e. detection levels), interior pixels only.

    Separable formulation: the strict 26-neighbour maximum is assembled
    from running 3-window maxima along x then y — the two off-scale
    planes contribute their full 3x3 max, the centre plane contributes
    its y+-1 row maxima and x+-1 values (centre excluded).  10 shifted
    passes for the max and 10 for the min instead of the previous 26
    roll+compare pairs per side (52 full-volume reads); identical
    strict-inequality semantics, measured ~3x less detect HBM traffic.
    Rolled scale/spatial wrap values only land on the boundary
    scales/pixels that the interior restriction below discards.
    """
    v = dog
    thr = 0.8 * peak_thresh

    def ext3(a, axis, op):
        return op(a, op(jnp.roll(a, 1, axis), jnp.roll(a, -1, axis)))

    def neigh26(a, op):
        a_x = ext3(a, 2, op)       # 3-window along x (incl centre)
        a_xy = ext3(a_x, 1, op)    # 3x3 spatial (incl centre)
        return op(
            op(jnp.roll(a_xy, 1, 0), jnp.roll(a_xy, -1, 0)),  # s+-1 planes
            op(
                op(jnp.roll(a_x, 1, 1), jnp.roll(a_x, -1, 1)),  # y+-1 rows
                op(jnp.roll(a, 1, 2), jnp.roll(a, -1, 2)),      # x+-1
            ),
        )

    is_max = (v > thr) & (v > neigh26(v, jnp.maximum))
    is_min = (v < -thr) & (v < neigh26(v, jnp.minimum))
    mask = is_max | is_min
    # restrict to interior scales and pixels
    Sn, H, W = dog.shape
    mask = mask[1 : Sn - 1]
    ygrid = jnp.arange(H)
    xgrid = jnp.arange(W)
    mask = mask & ((ygrid >= 1) & (ygrid <= H - 2))[None, :, None]
    mask = mask & ((xgrid >= 1) & (xgrid <= W - 2))[None, None, :]
    return mask  # (S, H, W) for detection scales s = 0..S-1


def _gather3x3x3(dog, si, yi, xi):
    """Gather 3x3x3 neighbourhoods around (si+1, yi, xi) from the DoG
    volume; returns ``(K, 3, 3, 3)`` (ds, dy, dx)."""
    offs = jnp.arange(-1, 2)
    sidx = (si[:, None, None, None] + 1) + offs[None, :, None, None]
    yidx = yi[:, None, None, None] + offs[None, None, :, None]
    xidx = xi[:, None, None, None] + offs[None, None, None, :]
    Sn, H, W = dog.shape
    sidx = jnp.clip(sidx, 0, Sn - 1)
    yidx = jnp.clip(yidx, 0, H - 1)
    xidx = jnp.clip(xidx, 0, W - 1)
    flat = dog.reshape(-1)
    lin = (sidx * H + yidx) * W + xidx
    return flat[lin.reshape(-1)].reshape(si.shape[0], 3, 3, 3)


@partial(jax.jit, static_argnames=("max_kp", "n_iter"))
def detect_refine(dog, peak_thresh, edge_thresh, max_kp, n_iter=5):
    """Detect DoG extrema and refine them to sub-pixel accuracy.

    Returns dict of ``(max_kp,)`` arrays: ``x, y, s`` (refined, octave
    pixels / continuous scale), ``is_`` (integer detection level),
    ``valid``.
    """
    Sn, H, W = dog.shape  # Sn = S + 2
    mask = _extrema_mask(dog, peak_thresh)
    count = mask.sum()  # raw candidate count (may exceed max_kp)
    # saliency-ordered selection: when candidates exceed the static
    # budget, keep the strongest |DoG| responses instead of the first
    # max_kp in raster order (which would bias keypoints to the top of
    # the image).  The threshold is picked from a log ladder — the
    # smallest tau whose count fits the budget; tau=0 (keep all) when
    # everything fits, making the common case bit-identical.
    strength = jnp.where(mask, jnp.abs(dog[1 : Sn - 1]), 0.0)
    smax = strength.max()
    n_lad = 24
    taus = jnp.concatenate(
        [smax * 2.0 ** -jnp.arange(0, n_lad, dtype=dog.dtype),
         jnp.zeros((1,), dog.dtype)]
    )
    # counts_at[j] = #(strength > taus[j]), via ONE histogram pass: a
    # candidate's rung is b = floor(log2(smax/strength)) + 1 (the
    # smallest j with strength > smax * 2^-j), so the cumulative rung
    # histogram IS the ladder count.  The previous 25 separate
    # reductions each re-read the full volume (25x the detect pass's
    # largest HBM cost at octave -1).
    safe = strength > 0
    neglog = jnp.log2(smax) - jnp.log2(jnp.where(safe, strength, 1.0))
    rung = jnp.clip(jnp.floor(neglog).astype(jnp.int32) + 1, 1, n_lad)
    rung = jnp.where(safe, rung, n_lad + 1)
    hist = jnp.zeros(n_lad + 2, jnp.int32).at[rung.reshape(-1)].add(1)
    counts_at = jnp.cumsum(hist)[: n_lad + 1]
    # counts_at is ascending (taus descend to 0); the last rung that
    # fits wins.  tau=0 keeps every candidate (extrema have |DoG| > 0
    # strictly), so under-budget octaves are bit-identical to no
    # thresholding; the ladder only engages to drop the weakest.
    jbest = jnp.max(jnp.where(counts_at <= max_kp, jnp.arange(n_lad + 1), -1))
    tau = taus[jnp.maximum(jbest, 0)]
    mask = mask & (strength > tau)
    flat = mask.reshape(-1)
    kept = flat.sum()
    # compaction via exclusive-scan + scatter: ~40% faster than
    # jnp.nonzero(size=...) on TPU (nonzero lowers through a sort);
    # identical output order (ascending linear index)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    tgt = jnp.where(flat & (pos < max_kp), pos, max_kp)
    cand = jnp.zeros(max_kp, jnp.int32).at[tgt].set(
        jnp.arange(flat.shape[0], dtype=jnp.int32), mode="drop"
    )
    valid = jnp.arange(max_kp) < kept
    si = (cand // (H * W)).astype(jnp.int32)  # detection scale 0..S-1
    rem = cand % (H * W)
    yi = (rem // W).astype(jnp.int32)
    xi = (rem % W).astype(jnp.int32)

    def newton(carry, _):
        yi, xi = carry
        n = _gather3x3x3(dog, si, yi, xi)  # (K,3,3,3)
        # first derivatives (central)
        Dx = 0.5 * (n[:, 1, 1, 2] - n[:, 1, 1, 0])
        Dy = 0.5 * (n[:, 1, 2, 1] - n[:, 1, 0, 1])
        Ds = 0.5 * (n[:, 2, 1, 1] - n[:, 0, 1, 1])
        v = n[:, 1, 1, 1]
        Dxx = n[:, 1, 1, 2] + n[:, 1, 1, 0] - 2 * v
        Dyy = n[:, 1, 2, 1] + n[:, 1, 0, 1] - 2 * v
        Dss = n[:, 2, 1, 1] + n[:, 0, 1, 1] - 2 * v
        Dxy = 0.25 * (n[:, 1, 2, 2] + n[:, 1, 0, 0] - n[:, 1, 2, 0] - n[:, 1, 0, 2])
        Dxs = 0.25 * (n[:, 2, 1, 2] + n[:, 0, 1, 0] - n[:, 2, 1, 0] - n[:, 0, 1, 2])
        Dys = 0.25 * (n[:, 2, 2, 1] + n[:, 0, 0, 1] - n[:, 2, 0, 1] - n[:, 0, 2, 1])
        Hm = jnp.stack(
            [
                jnp.stack([Dxx, Dxy, Dxs], -1),
                jnp.stack([Dxy, Dyy, Dys], -1),
                jnp.stack([Dxs, Dys, Dss], -1),
            ],
            -2,
        )  # (K, 3, 3)
        g = jnp.stack([Dx, Dy, Ds], -1)
        det = jnp.linalg.det(Hm)
        safe = jnp.abs(det) > 1e-30
        Hs = jnp.where(safe[:, None, None], Hm, jnp.eye(3, dtype=Hm.dtype))
        b = -jnp.einsum("kij,kj->ki", inv3x3(Hs), g)
        b = jnp.where(safe[:, None], b, 0.0)
        # relocate integer position when the offset exceeds 0.6
        dx = jnp.where((b[:, 0] > 0.6) & (xi < W - 2), 1, 0) + jnp.where(
            (b[:, 0] < -0.6) & (xi > 1), -1, 0
        )
        dy = jnp.where((b[:, 1] > 0.6) & (yi < H - 2), 1, 0) + jnp.where(
            (b[:, 1] < -0.6) & (yi > 1), -1, 0
        )
        return (yi + dy, xi + dx), None

    (yi, xi), _ = jax.lax.scan(newton, (yi, xi), None, length=n_iter - 1)

    # final evaluation at the settled integer location
    n = _gather3x3x3(dog, si, yi, xi)
    Dx = 0.5 * (n[:, 1, 1, 2] - n[:, 1, 1, 0])
    Dy = 0.5 * (n[:, 1, 2, 1] - n[:, 1, 0, 1])
    Ds = 0.5 * (n[:, 2, 1, 1] - n[:, 0, 1, 1])
    v = n[:, 1, 1, 1]
    Dxx = n[:, 1, 1, 2] + n[:, 1, 1, 0] - 2 * v
    Dyy = n[:, 1, 2, 1] + n[:, 1, 0, 1] - 2 * v
    Dss = n[:, 2, 1, 1] + n[:, 0, 1, 1] - 2 * v
    Dxy = 0.25 * (n[:, 1, 2, 2] + n[:, 1, 0, 0] - n[:, 1, 2, 0] - n[:, 1, 0, 2])
    Dxs = 0.25 * (n[:, 2, 1, 2] + n[:, 0, 1, 0] - n[:, 2, 1, 0] - n[:, 0, 1, 2])
    Dys = 0.25 * (n[:, 2, 2, 1] + n[:, 0, 0, 1] - n[:, 2, 0, 1] - n[:, 0, 2, 1])
    Hm = jnp.stack(
        [
            jnp.stack([Dxx, Dxy, Dxs], -1),
            jnp.stack([Dxy, Dyy, Dys], -1),
            jnp.stack([Dxs, Dys, Dss], -1),
        ],
        -2,
    )
    g = jnp.stack([Dx, Dy, Ds], -1)
    det3d = jnp.linalg.det(Hm)
    safe = jnp.abs(det3d) > 1e-30
    Hs = jnp.where(safe[:, None, None], Hm, jnp.eye(3, dtype=Hm.dtype))
    b = -jnp.einsum("kij,kj->ki", inv3x3(Hs), g)
    b = jnp.where(safe[:, None], b, 0.0)

    val = v + 0.5 * (Dx * b[:, 0] + Dy * b[:, 1] + Ds * b[:, 2])
    det2 = Dxx * Dyy - Dxy * Dxy
    tr2 = (Dxx + Dyy) ** 2
    edge_ok = (det2 > 0) & (
        tr2 / jnp.where(det2 > 0, det2, 1.0)
        < (edge_thresh + 1.0) ** 2 / edge_thresh
    )
    xn = xi + b[:, 0]
    yn = yi + b[:, 1]
    sn = si + b[:, 2]  # detection-scale coordinates (0..S-1)

    good = (
        valid
        & (jnp.abs(val) > peak_thresh)
        & edge_ok
        & (jnp.abs(b[:, 0]) < 1.5)
        & (jnp.abs(b[:, 1]) < 1.5)
        & (jnp.abs(b[:, 2]) < 1.5)
        & (xn >= 0)
        & (xn <= W - 1)
        & (yn >= 0)
        & (yn <= H - 1)
    )
    return {
        "x": xn,
        "y": yn,
        "s": sn,
        "is_": si,
        "yi": yi,
        "xi": xi,
        "valid": good,
        "count": count,  # raw candidate count (may exceed max_kp)
    }


def _window_gather(level_arr, is_, yc, xc, radius):
    """Gather square windows from per-level arrays.

    ``level_arr``: ``(S, H, W)``; ``is_``: ``(K,)`` level ids;
    ``yc, xc``: ``(K,)`` integer centres.  Returns ``(vals (K, P),
    dy (K, P), dx (K, P), inb (K, P))`` with P = (2R+1)^2.
    """
    Sn, H, W = level_arr.shape
    offs = jnp.arange(-radius, radius + 1)
    ox = jnp.tile(offs[None, :], (2 * radius + 1, 1)).reshape(-1)
    oy = jnp.repeat(offs, 2 * radius + 1)
    yidx = yc[:, None] + oy[None, :]
    xidx = xc[:, None] + ox[None, :]
    inb = (yidx >= 0) & (yidx < H) & (xidx >= 0) & (xidx < W)
    yc_ = jnp.clip(yidx, 0, H - 1)
    xc_ = jnp.clip(xidx, 0, W - 1)
    lin = (is_[:, None] * H + yc_) * W + xc_
    vals = level_arr.reshape(-1)[lin.reshape(-1)].reshape(lin.shape)
    return vals, oy, ox, inb


@partial(jax.jit, static_argnames=("radius",))
def orientations(mod, ang, kp_x, kp_y, kp_sigma, kp_is, kp_valid, radius):
    """Dominant orientations per keypoint (vlfeat semantics: 36-bin
    gradient histogram, Gaussian window sigma = 1.5*sigma, 6x circular
    box smoothing, peaks >= 0.8*max with parabolic refinement, up to 4).

    Returns ``(angles (K, 4), avalid (K, 4))``.
    """
    yi = jnp.round(kp_y).astype(jnp.int32)
    xi = jnp.round(kp_x).astype(jnp.int32)
    m, oy, ox, inb = _window_gather(mod, kp_is, yi, xi, radius)
    a, _, _, _ = _window_gather(ang, kp_is, yi, xi, radius)

    sigmaw = 1.5 * kp_sigma  # octave-relative sigma
    Wr = jnp.maximum(jnp.floor(3.0 * sigmaw), 1.0)
    dy = (yi[:, None] + oy[None, :]) - kp_y[:, None]
    dx = (xi[:, None] + ox[None, :]) - kp_x[:, None]
    r2 = dx * dx + dy * dy
    wgt = jnp.exp(-r2 / (2.0 * sigmaw[:, None] ** 2))
    sel = inb & (r2 < Wr[:, None] ** 2 + 0.6)
    contrib = jnp.where(sel, m * wgt, 0.0)

    bins = jnp.floor(NBINS_ORI * a / TWO_PI).astype(jnp.int32) % NBINS_ORI
    # masked-sum per bin instead of a scatter-add: TPU scatters with
    # colliding indices serialize (~100x slower than these 36 fused
    # masked reductions)
    hist = jnp.stack(
        [jnp.where(bins == b, contrib, 0.0).sum(axis=1) for b in range(NBINS_ORI)],
        axis=1,
    )

    for _ in range(6):
        hist = (jnp.roll(hist, 1, axis=1) + hist + jnp.roll(hist, -1, axis=1)) / 3.0

    hmax = hist.max(axis=1, keepdims=True)
    hp = jnp.roll(hist, -1, axis=1)
    hm = jnp.roll(hist, 1, axis=1)
    is_peak = (hist > hm) & (hist > hp) & (hist >= 0.8 * hmax)
    # keep the first MAX_ANGLES peaks in bin order (vlfeat iterates bins
    # ascending and stops at 4)
    binidx = jnp.arange(NBINS_ORI)[None, :].repeat(hist.shape[0], 0)
    order_key = jnp.where(is_peak, binidx, NBINS_ORI + 1)
    sel_bins = -jax.lax.top_k(-order_key, MAX_ANGLES)[0]  # 4 smallest
    avalid = sel_bins <= NBINS_ORI
    sel_bins = jnp.clip(sel_bins, 0, NBINS_ORI - 1)
    h0 = jnp.take_along_axis(hist, sel_bins, 1)
    hpk = jnp.take_along_axis(hp, sel_bins, 1)
    hmk = jnp.take_along_axis(hm, sel_bins, 1)
    denom = hpk + hmk - 2.0 * h0
    di = jnp.where(jnp.abs(denom) > 1e-20, -0.5 * (hpk - hmk) / denom, 0.0)
    th = jnp.mod(TWO_PI * (sel_bins + di + 0.5) / NBINS_ORI, TWO_PI)
    avalid = avalid & kp_valid[:, None]
    return th, avalid


@partial(jax.jit, static_argnames=("radius", "magnif"))
def descriptors(mod, ang, kp_x, kp_y, kp_sigma, kp_is, kp_angle, kp_valid, radius, magnif=3.0):
    """4x4x8 SIFT descriptors (vlfeat semantics) for (keypoint, angle)
    rows.  Returns ``(K, 128)`` float32 in [0, 1]-normalized form."""
    yi = jnp.round(kp_y).astype(jnp.int32)
    xi = jnp.round(kp_x).astype(jnp.int32)
    m, oy, ox, inb = _window_gather(mod, kp_is, yi, xi, radius)
    a, _, _, _ = _window_gather(ang, kp_is, yi, xi, radius)

    SBP = magnif * kp_sigma  # (K,)
    wsigma = WIN_FACTOR * SBP
    Wr = SBP * (NBP + 1) / 2.0 * np.sqrt(2.0) + 0.5

    dy = (yi[:, None] + oy[None, :]) - kp_y[:, None]
    dx = (xi[:, None] + ox[None, :]) - kp_x[:, None]
    ct = jnp.cos(kp_angle)[:, None]
    st = jnp.sin(kp_angle)[:, None]
    nx = (ct * dx + st * dy) / SBP[:, None]
    ny = (-st * dx + ct * dy) / SBP[:, None]
    theta = jnp.mod(a - kp_angle[:, None], TWO_PI)
    nt = NBO * theta / TWO_PI

    win = jnp.exp(-(dx * dx + dy * dy) / (2.0 * wsigma[:, None] ** 2))
    sel = inb & (jnp.abs(dx) <= Wr[:, None]) & (jnp.abs(dy) <= Wr[:, None])
    contrib = jnp.where(sel, m * win, 0.0)  # (K, P)

    # separable triangle weights: spatial bins centred at i - (NBP-1)/2
    centers = jnp.arange(NBP, dtype=nx.dtype) - (NBP - 1) / 2.0  # (-1.5..1.5)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(nx[:, :, None] - centers))  # (K,P,4)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ny[:, :, None] - centers))
    obins = jnp.arange(NBO, dtype=nt.dtype)
    dth = jnp.abs(nt[:, :, None] - obins)
    dth = jnp.minimum(dth, NBO - dth)  # circular
    wo = jnp.maximum(0.0, 1.0 - dth)  # (K,P,8)

    # contract spatial bins with static loops so the peak intermediate
    # stays at (K, P) instead of (K, P, 4, 4)
    cols = []
    for iy_bin in range(NBP):
        for ix_bin in range(NBP):
            w2 = contrib * wy[:, :, iy_bin] * wx[:, :, ix_bin]  # (K, P)
            cols.append(jnp.einsum("kp,kpo->ko", w2, wo))  # (K, 8)
    desc = jnp.concatenate(cols, axis=1)  # row-major (y, x, o) like vlfeat

    # normalize -> clamp 0.2 -> renormalize
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, 0.2)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.where(kp_valid[:, None], desc, 0.0)
    return desc


def _bucket_pad(n, minimum=64):
    """Static-shape bucket for a dynamic count: next power of two."""
    return max(minimum, 1 << max(n - 1, 0).bit_length())


_R_OR = int(np.floor(3.0 * 1.5 * SIGMA_0 * 2 ** ((S - 1 + 1.5) / S)) + 1)


@partial(jax.jit, static_argnames=("magnif",))
def _describe_stage(mod, ang, meta_sel, kval, magnif):
    """Fused descriptor stage: one device call over the compacted
    (keypoint, angle) rows, chunked internally."""
    kth, _, kx, ky, ksig, kis_f = meta_sel
    kis = kis_f.astype(jnp.int32)
    r_de = int(
        np.floor(
            magnif
            * SIGMA_0
            * 2 ** ((S - 1 + 1.5) / S)
            * (NBP + 1)
            / 2.0
            * np.sqrt(2.0)
            + 1.0
        )
    )
    CH = 1024
    KA = kx.shape[0]
    pad = (-KA) % CH
    padc = lambda a: jnp.pad(a, (0, pad)).reshape(-1, CH)
    chunks = (
        padc(kx), padc(ky), padc(ksig), padc(kis), padc(kth),
        jnp.pad(kval, (0, pad), constant_values=False).reshape(-1, CH),
    )

    def one(args):
        cx, cy, cs, ci, ct, cv = args
        return descriptors(
            mod, ang, cx, cy, cs, ci.astype(jnp.int32), ct, cv, r_de, magnif
        )

    # lax.map keeps the compiled graph one-chunk-sized (an unrolled
    # Python loop here multiplied compile time by the chunk count)
    descs = jax.lax.map(one, chunks)
    return descs.reshape(-1, 128)[:KA]


@partial(jax.jit, static_argnames=("o_min",))
def _base_first(im_b, o_min):
    """Batched base preparation: up/downsample to octave ``o_min`` and
    apply the initial blur.  ``im_b (B, H, W)``."""

    def prep(im):
        base = im
        if o_min < 0:
            for _ in range(-o_min):
                base = _upsample2(base)
        elif o_min > 0:
            for _ in range(o_min):
                base = _downsample2(base)
        sa = SIGMA_0 * (SIGMA_K**S_MIN)
        sb = SIGMA_N * (2.0**-o_min)
        return _blur(base, float(np.sqrt(max(sa * sa - sb * sb, 0.0))))

    return jax.vmap(prep)(im_b)


@partial(jax.jit, static_argnames=("max_kp",))
def _octave_detect(first, peak_thresh, edge_thresh, max_kp):
    """One octave, detection only: ``first (B, H, W)`` ->
    ``(next_first, mod, ang, det (B, 6, max_kp))`` with det rows
    ``[x, y, sigma_oct, is, valid, raw_count]``.

    Per-octave programs (instead of round 1's one giant all-octave
    graph) compile an order of magnitude faster through the remote
    tunnel and are reused across every image of the same shape; the
    extra dispatches are cheap (~0.3 ms) because results are only
    PULLED once per pass, not per call.
    """
    gss, dog, mod, ang = jax.vmap(_octave_levels_core)(first)

    def det_one(d):
        det = detect_refine(d, peak_thresh, edge_thresh, max_kp)
        sigma_oct = SIGMA_0 * (2.0 ** (det["s"] / S))
        f = d.dtype
        return jnp.stack(
            [
                det["x"].astype(f),
                det["y"].astype(f),
                sigma_oct.astype(f),
                det["is_"].astype(f),
                det["valid"].astype(f),
                jnp.broadcast_to(det["count"].astype(f), det["x"].shape),
            ]
        )

    meta = jax.vmap(det_one)(dog)
    nxt = gss[:, S_MIN + S - S_MIN, ::2, ::2]
    return nxt, mod, ang, meta


@jax.jit
def _stack_grads(mods, angs):
    """Stack every octave's gradient levels into ONE zero-padded
    canonical array ``(B, 3*n_oct, H0, W0)`` (octave o at levels
    ``3o..3o+2``, top-left).  This lets a single compiled Pallas
    descriptor kernel serve every octave — out-of-octave patch pixels
    read zeros, which contribute nothing (weight = mod * win = 0),
    exactly vlfeat's out-of-image semantics."""
    B, _, H0, W0 = mods[0].shape
    L = 3 * len(mods)
    # canvas padded to the DMA alignment grid (rows 8, cols 128) so
    # aligned patch anchors never lose edge support
    H0p = -(-H0 // 8) * 8
    W0p = -(-W0 // 128) * 128
    modS = jnp.zeros((B, L, H0p, W0p), jnp.float32)
    angS = jnp.zeros((B, L, H0p, W0p), jnp.float32)
    for oi, (m, a) in enumerate(zip(mods, angs)):
        modS = jax.lax.dynamic_update_slice(modS, m, (0, 3 * oi, 0, 0))
        angS = jax.lax.dynamic_update_slice(angS, a, (0, 3 * oi, 0, 0))
    return modS, angS


def _describe_jobs_dev(jobs, grads, magnif, canvas=None):
    """Descriptors for every compacted (image, octave) job, LEFT ON
    DEVICE grouped per image.

    Returns ``(per_img, img_jobs_map)``: ``per_img[bi]`` is a device
    uint8 array of the image's job rows concatenated in job order
    (``bucket2`` rows per job, vlfeat x512 quantization applied on
    device), ``img_jobs_map[bi]`` the matching job list.

    TPU path: all octaves' gradients are stacked into one canonical
    array (:func:`_stack_grads`) and each IMAGE is one call into the
    Pallas patch-DMA descriptor kernel — one kernel compile total.
    (The XLA gather formulation runs at ~50M gathered pixels/s on this
    TPU and dominated SIFT wall-clock; per-octave kernel shapes would
    recompile 9x.)  CPU backends keep the XLA gather path; both
    produce identical descriptors.
    """
    from spectavi_tpu.ops.l2nn import _on_tpu

    B, _, H0, W0 = grads[0][0].shape
    # the padded canvas must hold one aligned patch: rows >= 104 and
    # cols > 128 (so the 128-aligned canvas reaches 256)
    use_pallas = _on_tpu(grads[0][0]) and H0 >= 104 and W0 > 128
    per_img = {}
    img_jobs_map = {}
    if not use_pallas:
        for bi in range(B):
            img_jobs = [j for j in jobs if j[0] == bi]
            if not img_jobs:
                continue
            ds = []
            for (_, oi, meta_sel, n_ang, bucket2) in img_jobs:
                mod, ang = grads[oi]
                d = _describe_stage(
                    mod[bi],
                    ang[bi],
                    jnp.asarray(meta_sel),
                    jnp.asarray(np.arange(bucket2) < n_ang),
                    magnif,
                )
                ds.append(
                    jnp.minimum(jnp.floor(512.0 * d), 255.0).astype(jnp.uint8)
                )
            per_img[bi] = ds[0] if len(ds) == 1 else jnp.concatenate(ds, axis=0)
            img_jobs_map[bi] = img_jobs
        return per_img, img_jobs_map

    from spectavi_tpu.ops.sift_desc import (
        PATCH_C,
        PATCH_R,
        finish_descriptors,
        sift_descriptors_pallas,
    )

    if canvas is None:
        canvas = _stack_grads(
            [m for (m, _) in grads], [a for (_, a) in grads]
        )
    modS, angS = canvas
    H0p, W0p = modS.shape[2], modS.shape[3]
    for bi in range(B):
        img_jobs = [j for j in jobs if j[0] == bi]
        if not img_jobs:
            continue
        ky = np.concatenate([j[2][3] for j in img_jobs])
        kx = np.concatenate([j[2][2] for j in img_jobs])
        sig = np.concatenate([j[2][4] for j in img_jobs])
        th = np.concatenate([j[2][0] for j in img_jobs])
        lvl = np.concatenate(
            [
                j[1] * 3 + np.clip(j[2][5].astype(np.int32), 0, S - 1)
                for j in img_jobs
            ]
        )
        val = np.concatenate(
            [np.arange(j[4]) < j[3] for j in img_jobs]
        )
        # aligned patch anchors (Mosaic DMA: rows 8-aligned, cols
        # 128-aligned), clipped to the STACKED canvas — out-of-octave
        # pixels read zeros and contribute nothing
        yi = (
            np.clip(
                (np.round(ky).astype(np.int32) - 48) & ~7,
                0,
                H0p - PATCH_R,
            )
        ).astype(np.int32)
        xi = (
            np.clip(
                (np.round(kx).astype(np.int32) - 44) & ~127,
                0,
                W0p - PATCH_C,
            )
        ).astype(np.int32)
        raw = sift_descriptors_pallas(
            modS[bi],
            angS[bi],
            jnp.asarray(yi),
            jnp.asarray(xi),
            jnp.asarray(lvl),
            jnp.asarray(ky),
            jnp.asarray(kx),
            jnp.asarray(sig),
            jnp.asarray(th),
            jnp.asarray(val.astype(np.int32)),
            magnif,
        )
        d = finish_descriptors(raw, jnp.asarray(val))
        # vlfeat's output quantization (reference src/Sift.h:119-121)
        # applied ON DEVICE so any result pull is uint8 — 4x fewer
        # bytes through this machine's ~7 MB/s device tunnel, and the
        # reference's own output values are exactly these integers
        per_img[bi] = jnp.minimum(jnp.floor(512.0 * d), 255.0).astype(
            jnp.uint8
        )
        img_jobs_map[bi] = img_jobs
    return per_img, img_jobs_map


def _describe_jobs(jobs, grads, magnif, canvas=None):
    """Host variant of :func:`_describe_jobs_dev`: one pull, rows
    reordered from per-image concatenation back to job order."""
    per_img, _ = _describe_jobs_dev(jobs, grads, magnif, canvas)
    order = sorted(per_img)
    desc_np = (
        np.asarray(jnp.concatenate([per_img[bi] for bi in order], axis=0))
        .astype(np.float32)
    )
    out = np.empty((sum(j[4] for j in jobs), 128), np.float32)
    img_off = {}
    pos = 0
    for bi in order:
        img_off[bi] = pos
        pos += sum(j[4] for j in jobs if j[0] == bi)
    job_out_off = 0
    cursor = dict(img_off)
    for j in jobs:
        bi, _, _, _, bucket2 = j
        src = cursor[bi]
        out[job_out_off : job_out_off + bucket2] = desc_np[src : src + bucket2]
        cursor[bi] = src + bucket2
        job_out_off += bucket2
    return out


def _octave_budgets(H0, W0, o_min, n_octaves, max_kp_per_octave):
    budgets = []
    H, W = H0 << max(-o_min, 0), W0 << max(-o_min, 0)
    if o_min > 0:
        H, W = H0 >> o_min, W0 >> o_min
    for _ in range(n_octaves):
        budgets.append(int(min(max_kp_per_octave, max(512, (H * W) // 16))))
        H, W = H // 2, W // 2
    return tuple(budgets)


def _orient_jobs(det_jobs, grads):
    """Orientation histograms + peaks for compacted detections.

    Returns ``(angles, canvas)``: ``angles[(bi, oi)] = (th (bucket, 4),
    avalid (bucket, 4))`` numpy arrays, and the stacked gradient canvas
    (TPU path) for reuse by the descriptor stage.
    """
    from spectavi_tpu.ops.l2nn import _on_tpu

    B, _, H0, W0 = grads[0][0].shape
    use_pallas = _on_tpu(grads[0][0]) and H0 >= 104 and W0 > 128
    angles = {}
    if not use_pallas:
        devs = []
        for (bi, oi, det_sel, n_kp, bucket) in det_jobs:
            mod, ang = grads[oi]
            kis = jnp.asarray(
                np.clip(det_sel[3].astype(np.int32), 0, S - 1)
            )
            th, av = orientations(
                mod[bi],
                ang[bi],
                jnp.asarray(det_sel[0]),
                jnp.asarray(det_sel[1]),
                jnp.asarray(det_sel[2]),
                kis,
                jnp.asarray(np.arange(bucket) < n_kp),
                _R_OR,
            )
            devs.append((th, av))
        pulled = jax.device_get(devs)  # one staged pull
        for job, ta in zip(det_jobs, pulled):
            angles[(job[0], job[1])] = ta
        return angles, None

    from spectavi_tpu.ops.sift_orient import (
        PATCH_C as OR_PC,
        PATCH_R as OR_PR,
        orientation_peaks,
        sift_orient_hist_pallas,
    )

    canvas = _stack_grads([m for (m, _) in grads], [a for (_, a) in grads])
    modS, angS = canvas
    H0p, W0p = modS.shape[2], modS.shape[3]
    devs = []
    groups = []
    for bi in range(B):
        img_jobs = [j for j in det_jobs if j[0] == bi]
        if not img_jobs:
            continue
        kx = np.concatenate([j[2][0] for j in img_jobs])
        ky = np.concatenate([j[2][1] for j in img_jobs])
        sig = np.concatenate([j[2][2] for j in img_jobs])
        lvl = np.concatenate(
            [
                j[1] * 3 + np.clip(j[2][3].astype(np.int32), 0, S - 1)
                for j in img_jobs
            ]
        )
        val = np.concatenate([np.arange(j[4]) < j[3] for j in img_jobs])
        yi = np.clip(
            (np.round(ky).astype(np.int32) - OR_PR // 2) & ~7,
            0,
            H0p - OR_PR,
        )
        xi = np.clip(
            (np.round(kx).astype(np.int32) - 19) & ~127, 0, W0p - OR_PC
        )
        hist = sift_orient_hist_pallas(
            modS[bi], angS[bi],
            jnp.asarray(yi), jnp.asarray(xi), jnp.asarray(lvl),
            jnp.asarray(ky), jnp.asarray(kx), jnp.asarray(sig),
            jnp.asarray(val.astype(np.int32)),
        )
        th, av = orientation_peaks(hist, jnp.asarray(val))
        devs.append((th, av))
        groups.append((bi, img_jobs))
    pulled = jax.device_get(devs)  # ONE staged pull for all images:
    # per-image np.asarray paid a full tunnel round trip each (B=10:
    # ~1-1.7 s of pure latency in the multi-view SIFT phase)
    for (bi, img_jobs), (th, av) in zip(groups, pulled):
        off = 0
        for j in img_jobs:
            angles[(bi, j[1])] = (
                th[off : off + j[4]],
                av[off : off + j[4]],
            )
            off += j[4]
    return angles, canvas


@partial(jax.jit, static_argnames=("cap", "n_oct"))
def _compact_detections(det_cat, oct_ids, cap, n_oct):
    """Cross-octave compaction of valid detections ON DEVICE.

    ``det_cat (B, 6, T)`` is every octave's detection table
    concatenated; only ~20-30% of its rows are valid, and the full
    table is megabytes through this machine's ~5 MB/s device tunnel —
    the detect phase's dominant warm cost was this pull (castle pair:
    4.75 MB, 1.6-1.7 s, vs 0.01 s of dispatch).  Compact to the valid
    rows (octave-major, original order — identical downstream job
    content) and pull ``(B, 4, cap)`` = [x, y, sigma, is] plus tiny
    per-octave valid/raw-candidate counts instead.
    """

    def one(db):
        valid = db[4] > 0
        pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
        tgt = jnp.where(valid & (pos < cap), pos, cap)
        rows = db[:4]  # x, y, sigma, is
        out = jnp.zeros((4, cap), db.dtype).at[:, tgt].set(
            rows, mode="drop"
        )
        counts = jax.ops.segment_sum(
            valid.astype(jnp.int32), oct_ids, num_segments=n_oct
        )
        return out, counts

    return jax.vmap(one)(det_cat)


def _sift_batched_same_shape(
    ims, peak_thresh, edge_thresh, magnif, o_min, n_octaves,
    max_kp_per_octave, return_device=False,
):
    """SIFT for a batch of same-shape images with three host pulls
    total (detections, orientation angles, descriptors); every
    per-pixel stage runs per-octave batched on device, and on TPU the
    orientation/descriptor window work runs in patch-DMA Pallas
    kernels over compacted keypoints only.

    ``return_device=True`` skips the descriptor pull entirely: each
    image yields ``{"meta": (n, 4) numpy [x, y, sigma, angle],
    "desc": (n, 128) DEVICE uint8}`` so a downstream on-device matcher
    never pays the ~128 B/keypoint descriptor transfer (castle pair:
    7.1 MB, ~1 s of the SIFT wall through this tunnel) only to upload
    it again."""
    B = len(ims)
    H0, W0 = ims[0].shape
    if n_octaves is None:
        n_octaves = num_octaves(H0, W0, o_min)
    budgets = _octave_budgets(H0, W0, o_min, n_octaves, max_kp_per_octave)

    # pass 1: async per-octave dispatches, one compacted pull
    first = _base_first(jnp.asarray(np.stack(ims)), o_min)
    det_metas, grads = [], []
    for budget in budgets:
        first, mod, ang, det = _octave_detect(
            first, peak_thresh, edge_thresh, budget
        )
        det_metas.append(det)
        grads.append((mod, ang))
    T = sum(budgets)
    CAP = min(T, 32768)
    oct_ids = jnp.asarray(
        np.repeat(np.arange(len(budgets), dtype=np.int32), budgets)
    )
    det_cat = jnp.concatenate(det_metas, axis=2)  # (B, 6, T)
    raws_dev = jnp.stack([d[:, 5, 0] for d in det_metas], axis=1)  # (B, n_oct)
    comp_dev, counts_dev = _compact_detections(
        det_cat, oct_ids, CAP, len(budgets)
    )
    if B * CAP > 131072:
        # two-phase pull for LARGE batches: the worst-case table is
        # B x 4 x CAP x 4 bytes (a 10-view 480x640 batch: 5.2 MB, ~1 s
        # of its 3.2 s SIFT phase) while typical valid counts run
        # 5-20% of CAP.  Pull the tiny per-octave counts first, then
        # only a power-of-two row bucket covering the real maximum.
        # Small batches (castle pair: 1.05 MB) keep the single pull —
        # the extra sync costs more than it saves there.
        counts, raws = jax.device_get((counts_dev, raws_dev))
        need = int(counts.sum(axis=1).max())
        K = min(CAP, _bucket_pad(max(need, 1), minimum=256))
        comp = np.asarray(comp_dev[:, :, :K]) if need <= CAP else None
    else:
        comp, counts, raws = jax.device_get(
            (comp_dev, counts_dev, raws_dev)
        )
        if counts.sum(axis=1).max() > CAP:
            comp = None
    if comp is None:
        # pathological keypoint density: the compaction cap would drop
        # detections — fall back to pulling the full table
        det_all = np.asarray(det_cat)

    # host: split the compacted rows into per-(image, octave) jobs
    det_jobs = []  # (bi, oi, det_sel (4, bucket), n_kp, bucket)
    for bi in range(B):
        off = 0
        for oi, budget in enumerate(budgets):
            n_candidates = int(raws[bi, oi])
            if n_candidates > budget:
                import warnings

                warnings.warn(
                    f"SIFT octave {oi}: {n_candidates} DoG candidates "
                    f"exceed the static budget {budget}; keeping the "
                    "strongest |DoG| responses. Raise max_kp_per_octave "
                    "to keep more.",
                    stacklevel=3,
                )
            if comp is not None:
                n_kp = int(counts[bi, oi])
                seg = comp[bi, :, off : off + n_kp]
                off += n_kp
                if n_kp == 0:
                    continue
                bucket = _bucket_pad(n_kp)
                det_sel = np.concatenate(
                    [seg, np.repeat(seg[:, :1], bucket - n_kp, axis=1)],
                    axis=1,
                )
            else:
                det = det_all[bi, :, off : off + budget]
                off += budget
                sel = np.where(det[4] > 0)[0]
                n_kp = len(sel)
                if n_kp == 0:
                    continue
                bucket = _bucket_pad(n_kp)
                sel_pad = np.concatenate(
                    [sel, np.zeros(bucket - n_kp, dtype=sel.dtype)]
                )
                det_sel = det[:4, sel_pad]
            det_jobs.append((bi, oi, det_sel, n_kp, bucket))

    def empty_out():
        if return_device:
            return [
                {"meta": np.zeros((0, 4), np.float32),
                 "desc": jnp.zeros((0, 128), jnp.uint8)}
                for _ in range(B)
            ]
        return [np.zeros((0, 132), np.float32) for _ in range(B)]

    if not det_jobs:
        return empty_out()

    angles, canvas = _orient_jobs(det_jobs, grads)

    # host: expand (keypoint, angle) rows, compact to describe jobs
    jobs = []  # (img, octave, meta_sel, n_ang, bucket2)
    for (bi, oi, det_sel, n_kp, bucket) in det_jobs:
        th, av = angles[(bi, oi)]
        av = av & (np.arange(bucket) < n_kp)[:, None]
        meta6 = np.stack(
            [
                th.reshape(-1),
                av.reshape(-1).astype(th.dtype),
                np.repeat(det_sel[0], MAX_ANGLES),
                np.repeat(det_sel[1], MAX_ANGLES),
                np.repeat(det_sel[2], MAX_ANGLES),
                np.repeat(det_sel[3], MAX_ANGLES),
            ]
        )
        sel2 = np.where(meta6[1] > 0)[0]
        n_ang = len(sel2)
        if n_ang == 0:
            continue
        bucket2 = _bucket_pad(n_ang)
        sel2_pad = np.concatenate(
            [sel2, np.zeros(bucket2 - n_ang, dtype=sel2.dtype)]
        )
        jobs.append((bi, oi, meta6[:, sel2_pad], n_ang, bucket2))

    if not jobs:
        return empty_out()

    if return_device:
        per_img, img_jobs_map = _describe_jobs_dev(
            jobs, grads, float(magnif), canvas
        )
        outs_dev = []
        for bi in range(B):
            img_jobs = img_jobs_map.get(bi)
            if not img_jobs:
                outs_dev.append(
                    {"meta": np.zeros((0, 4), np.float32),
                     "desc": jnp.zeros((0, 128), jnp.uint8)}
                )
                continue
            sel, metas, off = [], [], 0
            for (_, oi, meta_sel, n_ang, bucket2) in img_jobs:
                sel.append(np.arange(off, off + n_ang))
                off += bucket2
                xper = 2.0 ** (o_min + oi)
                metas.append(
                    np.stack(
                        [meta_sel[2] * xper, meta_sel[3] * xper,
                         meta_sel[4] * xper, meta_sel[0]],
                        axis=1,
                    )[:n_ang]
                )
            desc = jnp.take(
                per_img[bi], jnp.asarray(np.concatenate(sel)), axis=0
            )
            outs_dev.append(
                {"meta": np.concatenate(metas).astype(np.float32),
                 "desc": desc}
            )
        return outs_dev

    desc_all = _describe_jobs(jobs, grads, float(magnif), canvas)

    outs = [[] for _ in range(B)]
    doff = 0
    for (bi, oi, meta_sel, n_ang, bucket2) in jobs:
        xper = 2.0 ** (o_min + oi)
        desc = desc_all[doff : doff + bucket2]
        doff += bucket2
        rows = np.concatenate(
            [
                (meta_sel[2] * xper)[:, None],
                (meta_sel[3] * xper)[:, None],
                (meta_sel[4] * xper)[:, None],
                meta_sel[0][:, None],
                desc,  # already vlfeat-quantized by _describe_jobs
            ],
            axis=1,
        ).astype(np.float32)
        outs[bi].append(rows[:n_ang])
    return [
        np.concatenate(o, axis=0) if o else np.zeros((0, 132), np.float32)
        for o in outs
    ]


def sift_filter(
    im,
    peak_thresh=0.0,
    edge_thresh=10.0,
    magnif=3.0,
    o_min=-1,
    n_octaves=None,
    max_kp_per_octave=32768,
):
    """Detect SIFT keypoints + 128-d descriptors.

    API parity with ``spectavi.feature.sift_filter`` (reference
    ``spectavi/feature.py:29-50``): 2-D float image in, ``(nkp, 132)``
    float32 out with rows ``[x, y, sigma, angle, desc x 128]``.
    """
    im = np.asarray(im, dtype=np.float32)
    if im.ndim != 2:
        raise TypeError("Only 2d images are supported.")
    return _sift_batched_same_shape(
        [im], peak_thresh, edge_thresh, magnif, o_min, n_octaves,
        max_kp_per_octave,
    )[0]


def sift_filter_batch(
    ims,
    nthread=None,
    peak_thresh=0.0,
    edge_thresh=10.0,
    magnif=3.0,
    o_min=-1,
    n_octaves=None,
    max_kp_per_octave=32768,
):
    """Batch SIFT (reference ``sift_filter_batch``): list in, list out.

    Images of equal shape are stacked and run through the vmapped
    per-octave programs together — the TPU-native replacement for the
    reference's OpenMP fork over images (``src/Spectavi.cpp:198-215``).
    ``nthread`` kept for API parity (scheduling is XLA's job).  The
    tuning keywords are declared explicitly so a misspelled kwarg
    raises ``TypeError`` instead of being silently ignored.
    """
    del nthread
    ims = [np.asarray(im, dtype=np.float32) for im in ims]
    for im in ims:
        if im.ndim != 2:
            raise TypeError("Only 2d images are supported.")
    groups = {}
    for i, im in enumerate(ims):
        groups.setdefault(im.shape, []).append(i)
    out = [None] * len(ims)
    for shape, idxs in groups.items():
        res = _sift_batched_same_shape(
            [ims[i] for i in idxs],
            peak_thresh,
            edge_thresh,
            magnif,
            o_min,
            n_octaves,
            max_kp_per_octave,
        )
        for i, r in zip(idxs, res):
            out[i] = r
    return out


def sift_filter_batch_device(
    ims,
    peak_thresh=0.0,
    edge_thresh=10.0,
    magnif=3.0,
    o_min=-1,
    n_octaves=None,
    max_kp_per_octave=32768,
):
    """Batch SIFT with DEVICE-RESIDENT descriptors.

    Same detection/description as :func:`sift_filter_batch`, but each
    image's result is ``{"meta": (n, 4) numpy float32 [x, y, sigma,
    angle], "desc": (n, 128) device uint8 (vlfeat x512-quantized)}``.
    For pipelines that match on device right after detection, this
    skips pulling 128 bytes/keypoint through the host link AND the
    re-upload before matching — the two largest transfers of the
    two-view front end on a tunneled accelerator.  Reassemble the
    host-API 132-col rows with ``np.concatenate([meta,
    np.asarray(desc, np.float32)], axis=1)`` when needed.
    """
    ims = [np.asarray(im, dtype=np.float32) for im in ims]
    for im in ims:
        if im.ndim != 2:
            raise TypeError("Only 2d images are supported.")
    groups = {}
    for i, im in enumerate(ims):
        groups.setdefault(im.shape, []).append(i)
    out = [None] * len(ims)
    for shape, idxs in groups.items():
        res = _sift_batched_same_shape(
            [ims[i] for i in idxs],
            peak_thresh,
            edge_thresh,
            magnif,
            o_min,
            n_octaves,
            max_kp_per_octave,
            return_device=True,
        )
        for i, r in zip(idxs, res):
            out[i] = r
    return out


def sift_filter_striped(im, nthread=8, buffer_size=20):
    """SIFT over halo'd horizontal stripes.

    Capability parity with the reference's striped mode
    (``spectavi/feature.py:111-152``): the image is cut into ``nthread``
    horizontal bands, each extended by a ``buffer_size``-row halo so
    border keypoints see their full support, and each band's keypoints
    are then filtered back to the band interior (strict inequalities,
    like the reference, so a keypoint exactly on a seam is dropped).
    On TPU the bands exist for *memory* scaling, not threading — a
    band's scale-space is a fraction of the full image's.
    """
    im = np.asarray(im, dtype=np.float32)
    height = im.shape[0]
    seams = np.linspace(0, height, nthread + 1).round().astype(int)
    halo_lo = np.maximum(seams[:-1] - buffer_size, 0)
    halo_hi = np.minimum(seams[1:] + buffer_size + 1, height)
    bands = sift_filter_batch(
        [im[lo:hi] for lo, hi in zip(halo_lo, halo_hi)]
    )
    kept = []
    for kp, lo, y0, y1 in zip(bands, halo_lo, seams[:-1], seams[1:]):
        kp = kp.copy()
        kp[:, 1] += lo  # back to whole-image coordinates
        interior = (kp[:, 1] > y0) & (kp[:, 1] < y1)
        kept.append(kp[interior])
    return np.vstack(kept)
