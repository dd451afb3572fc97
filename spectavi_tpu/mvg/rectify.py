"""Epipolar image-pair rectification as one batched gather.

Re-design of ``Rectifier`` (reference ``src/Camera.h:60-441``): the
reference loops over output scanlines, intersecting each with an
epipolar line and resampling with nearest-neighbour lookups; here all
epipolar lines are computed at once and both images are resampled with
a single vectorized gather.  The reference's NCC row-alignment machinery
is dead code (loop bound ``itry < 0`` and shift hardwired to 0,
``src/Camera.h:334,378``), so the matching capability is plain epipolar
resampling — which is exactly what this implements.

Conventions preserved from the reference resampler
(``src/Camera.h:112-151, 259-326``):

* per output row ``r`` (from ``-extra`` to ``H + extra``), the epipolar
  line in image 0 is ``F^T (0, r, 1)``; its first sample point seeds the
  epipolar line ``F . seed`` in image 1;
* sample x-positions are ``linspace(0, W-1, round(sf*W))``;
* nearest-neighbour lookup truncates coordinates toward zero (C-style
  ``(int)`` cast) and writes 0 (image) / -1 (index map) out of bounds;
* index maps store the row-major linear source coordinate ``y*W + x``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spectavi_tpu.mvg.core import fundamental_from_cameras


def _resample_lines(im, xx, yy, W, H):
    """Nearest-neighbour sample ``im`` at ``(xx, yy)`` grids.

    ``im``: ``(H, W, C)``; ``xx``: ``(S,)``; ``yy``: ``(R, S)``.
    Returns ``(vals (R, S, C), idx (R, S))``.
    """
    xi = jnp.trunc(xx).astype(jnp.int32)  # (S,)
    yi = jnp.trunc(yy).astype(jnp.int32)  # (R, S)
    valid = (xi[None, :] >= 0) & (xi[None, :] < W) & (yi >= 0) & (yi < H)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    vals = im[yc, xc[None, :].repeat(yy.shape[0], axis=0)]  # (R, S, C)
    vals = jnp.where(valid[..., None], vals, 0.0)
    idx = jnp.where(valid, yi * W + xi[None, :], -1)
    return vals, idx


def _epipolar_yy(F, rows_vals, xx):
    """Per-row epipolar sample y-coordinates in both images.

    The reference's scheme (``src/Camera.h:100-151``): the epipolar
    line in image 0 comes from the origin point ``(0, r, 1)`` in image
    1; its first sample seeds the corresponding line in image 1.
    ``rows_vals``: ``(R,)`` output-row coordinates (``r - extra``);
    ``xx``: ``(S,)`` sample x-positions.  Returns ``(yy0, yy1)`` of
    shape ``(R, S)``.
    """
    ones = jnp.ones_like(rows_vals)
    zeros = jnp.zeros_like(rows_vals)
    origins = jnp.stack([zeros, rows_vals, ones], axis=-1)  # (R, 3)
    lines0 = origins @ F  # == (F.T @ origin) rows
    # l0*x + l1*y + l2 = 0  =>  y = (-l2 - l0*x) / l1  (no division by l2;
    # reference compute_line, src/Camera.h:100-110)
    yy0 = (-lines0[:, 2:3] - lines0[:, 0:1] * xx[None, :]) / lines0[:, 1:2]
    seeds = jnp.stack([jnp.full_like(rows_vals, xx[0]), yy0[:, 0], ones], axis=-1)
    lines1 = seeds @ F.T  # == (F @ seed) rows
    yy1 = (-lines1[:, 2:3] - lines1[:, 0:1] * xx[None, :]) / lines1[:, 1:2]
    return yy0, yy1


@partial(jax.jit, static_argnames=("sampling_factor",))
def rectify_pair(P0, P1, im0, im1, sampling_factor=1.2):
    """Rectify an image pair along epipolar lines.

    ``im0, im1``: ``(H, W, C)`` float arrays (same shape).
    Returns ``(r0, r1, idx0, idx1)`` with ``r*`` of shape
    ``(H + 2*extra, S, C)`` and ``idx*`` of shape ``(H + 2*extra, S)``
    where ``S = int(sampling_factor * W)`` and
    ``extra = max(H, W*C) // 2`` (reference ``src/Camera.h:263-267`` —
    note the reference folds channels into its column count, a quirk
    preserved here for output-shape parity).
    """
    H, W, C = im0.shape
    extra = int(max(H, W * C) / 2.0)
    S = int(sampling_factor * W)

    rows = jnp.arange(-extra, H + extra, dtype=P0.dtype)  # (R,)
    F = fundamental_from_cameras(P0, P1)
    xx = jnp.linspace(0.0, W - 1.0, S, dtype=P0.dtype)  # (S,)
    yy0, yy1 = _epipolar_yy(F, rows, xx)

    r0, idx0 = _resample_lines(im0, xx, yy0, W, H)
    r1, idx1 = _resample_lines(im1, xx, yy1, W, H)
    return r0, r1, idx0, idx1


def _rectify_pair_host(P0, P1, im0, im1, sampling_factor):
    """Numpy twin of :func:`rectify_pair` (same semantics, float64).

    Rectification is an *output-formatting* step: its products (the
    rectified jpgs and the raw index maps) are consumed on the host and
    written to disk, the sampling is a memory-bound gather with zero
    FLOPs of substance, and the line geometry wants float64 (the
    reference is an f64 Eigen code path; f64 on this TPU is emulated at
    ~f32 precision and real f64 compute is slow).  Pulling the ~100 MB
    of rectified output through the device tunnel dominated the
    pipeline's step 5 (31 s warm) — host numpy does the whole thing in
    tens of milliseconds.  :func:`rectify_pair` remains the device path
    for pipelines that consume rectified tensors on-device.
    """
    H, W, C = im0.shape
    extra = int(max(H, W * C) / 2.0)
    S = int(sampling_factor * W)
    rows = np.arange(-extra, H + extra, dtype=np.float64)
    F = np.asarray(fundamental_from_cameras(jnp.asarray(P0), jnp.asarray(P1)))
    origins = np.stack([np.zeros_like(rows), rows, np.ones_like(rows)], -1)
    lines0 = origins @ F
    xx = np.linspace(0.0, W - 1.0, S)
    yy0 = (-lines0[:, 2:3] - lines0[:, 0:1] * xx[None, :]) / lines0[:, 1:2]
    seeds = np.stack([np.full_like(rows, xx[0]), yy0[:, 0], np.ones_like(rows)], -1)
    lines1 = seeds @ F.T
    yy1 = (-lines1[:, 2:3] - lines1[:, 0:1] * xx[None, :]) / lines1[:, 1:2]

    def resample(im, yy):
        xi = np.trunc(xx).astype(np.int32)
        yi = np.trunc(yy).astype(np.int32)
        valid = (xi[None, :] >= 0) & (xi[None, :] < W) & (yi >= 0) & (yi < H)
        lin = yi * W + xi[None, :]
        # flat 1-D take (numpy's broadcast fancy-indexing path is ~50x
        # slower at this size); invalid entries read row 0, then zeroed
        vals = im.reshape(-1, C)[np.where(valid, lin, 0)]
        vals[~valid] = 0.0
        idx = np.where(valid, lin, -1).astype(np.int32)
        return vals, idx

    r0, i0 = resample(im0, yy0)
    r1, i1 = resample(im1, yy1)
    return r0, r1, i0, i1


@partial(jax.jit, static_argnames=("shape", "sampling_factor"))
def _rectify_row_bbox(P0, P1, shape, sampling_factor):
    """Device pass 1: valid-region bounding box from line geometry ONLY
    (4 scalars) — no pixel gather.  Validity of an output sample needs
    just the truncated source coordinates, so the (R, S) gather over
    the reference's huge padded output canvas (``extra = max(H, W*C)/2``
    rows above and below, ``src/Camera.h:263-267``) is deferred to
    pass 2, which touches only the rows inside this bbox."""
    H, W, C = shape
    extra = int(max(H, W * C) / 2.0)
    S = int(sampling_factor * W)
    rows = jnp.arange(-extra, H + extra, dtype=P0.dtype)  # (R,)
    R = rows.shape[0]
    F = fundamental_from_cameras(P0, P1)
    xx = jnp.linspace(0.0, W - 1.0, S, dtype=P0.dtype)
    yy0, yy1 = _epipolar_yy(F, rows, xx)
    xi = jnp.trunc(xx).astype(jnp.int32)
    xvalid = (xi >= 0) & (xi < W)

    def yvalid(yy):
        yi = jnp.trunc(yy).astype(jnp.int32)
        return (yi >= 0) & (yi < H)

    valid = xvalid[None, :] & (yvalid(yy0) | yvalid(yy1))
    anyrow = valid.any(axis=1)
    anycol = valid.any(axis=0)
    rowsi = jnp.arange(R)
    colsi = jnp.arange(S)
    lowy = jnp.min(jnp.where(anyrow, rowsi, R))
    highy = jnp.max(jnp.where(anyrow, rowsi, -1))
    lowx = jnp.min(jnp.where(anycol, colsi, S))
    highx = jnp.max(jnp.where(anycol, colsi, -1))
    return jnp.stack([lowy, highy, lowx, highx])


@partial(jax.jit, static_argnames=("Hq", "sampling_factor", "y16"))
def _rectify_window(P0, P1, im0, im1, row0, scale0, scale1, Hq, sampling_factor, y16):
    """Device pass 2: resample only ``Hq`` output rows starting at
    (dynamic) row ``row0``, quantize pixels to uint8 on device, and
    return source *y*-indices instead of full linear index maps — the
    host reconstructs ``idx = y*W + x`` exactly from these (x indices
    are shared by every row), halving the index-map pull bytes via
    int16 when ``H`` permits.  ``im*`` may be raw uint8 (4x cheaper to
    upload); ``scale*`` maps raw values to 8-bit output units
    (``255 / max`` for uint8 input, ``255.0`` for max-normalized
    float input)."""
    H, W, C = im0.shape
    extra = int(max(H, W * C) / 2.0)
    S = int(sampling_factor * W)
    # identical float values to rows = arange(-extra, H+extra)[row0:row0+Hq]
    rows = (jnp.arange(Hq, dtype=jnp.int32) + row0).astype(P0.dtype) - extra
    F = fundamental_from_cameras(P0, P1)
    xx = jnp.linspace(0.0, W - 1.0, S, dtype=P0.dtype)
    yy0, yy1 = _epipolar_yy(F, rows, xx)
    xi = jnp.trunc(xx).astype(jnp.int32)
    xvalid = (xi >= 0) & (xi < W)
    xc = jnp.clip(xi, 0, W - 1)
    ydtype = jnp.int16 if y16 else jnp.int32

    def sample(im, yy, scale):
        yi = jnp.trunc(yy).astype(jnp.int32)
        valid = xvalid[None, :] & (yi >= 0) & (yi < H)
        yc = jnp.clip(yi, 0, H - 1)
        vals = im[yc, jnp.broadcast_to(xc[None, :], yc.shape)]
        vals = vals.astype(jnp.float32) * scale
        vals = jnp.where(valid[..., None], vals, 0.0)
        vals_u8 = jnp.clip(vals, 0.0, 255.0).astype(jnp.uint8)
        ysrc = jnp.where(valid, yi, -1).astype(ydtype)
        return vals_u8, ysrc

    r0u, y0 = sample(im0, yy0, scale0)
    r1u, y1 = sample(im1, yy1, scale1)
    return r0u, r1u, y0, y1, jnp.where(xvalid, xi, -1)


def rectify_pair_quantized(P0, P1, im0, im1, sampling_factor=1.0):
    """Pipeline fast path (TPU): bbox from line geometry alone, then a
    gather over ONLY the valid rows, uint8 pixels + int16 y-indices
    pulled (idx maps rebuilt exactly on host as ``y*W + x``).

    Returns ``(r0_u8, r1_u8, idx0, idx1)`` cropped.  Versus the parity
    API: float32 line geometry (the trunc boundary can move a sample by
    one source pixel in rare rows) and 8-bit pixel values (the pipeline
    writes 8-bit jpgs regardless) — output products are visually
    identical.  Versus the previous fast path (gather + crop over the
    full padded canvas): ~5x less gather work on castle (5312 -> ~1150
    rows) and 15 MB pulled instead of 21 MB.  The row window is padded
    to a multiple of 128 so recompiles bucket by window height, with a
    dynamic ``row0`` start inside each bucket.

    ``im0, im1`` may be raw uint8 arrays — then the upload is 4x
    cheaper and output pixels are ``clip(raw * 255/max(raw))`` (exactly
    the raw values for full-range images), matching the float contract
    ``clip(maxnormalized * 255)`` up to 1-ulp scaling.
    """
    im0 = np.asarray(im0)
    im1 = np.asarray(im1)
    if im0.shape != im1.shape:
        raise TypeError("Input images must have same size.")
    if im0.ndim == 2:
        im0 = im0[..., None]
        im1 = im1[..., None]
    if im0.dtype == np.uint8:
        scales = tuple(
            np.float32(255.0) / np.float32(max(int(im.max()), 1))
            for im in (im0, im1)
        )
    else:
        im0 = im0.astype(np.float32, copy=False)
        im1 = im1.astype(np.float32, copy=False)
        scales = (np.float32(255.0), np.float32(255.0))
    H, W, C = im0.shape
    extra = int(max(H, W * C) / 2.0)
    R = H + 2 * extra
    P0f = jnp.asarray(P0, jnp.float32)
    P1f = jnp.asarray(P1, jnp.float32)
    bbox = _rectify_row_bbox(P0f, P1f, (H, W, C), float(sampling_factor))
    ly, hy, lx, hx = (int(v) for v in np.asarray(bbox))  # one tiny pull
    if hy < ly or hx < lx:
        e_im = np.zeros((0, 0, C), np.uint8)
        e_idx = np.zeros((0, 0), np.int32)
        return e_im, e_im.copy(), e_idx, e_idx.copy()
    height = hy - ly + 1
    Hq = min(R, -(-height // 128) * 128)
    row0 = max(0, min(ly, R - Hq))
    y16 = (H - 1) <= np.iinfo(np.int16).max
    r0u, r1u, y0, y1, xi = _rectify_window(
        P0f,
        P1f,
        jnp.asarray(im0),
        jnp.asarray(im1),
        np.int32(row0),
        scales[0],
        scales[1],
        Hq,
        float(sampling_factor),
        y16,
    )
    r0u, r1u, y0, y1, xi = (np.asarray(a) for a in (r0u, r1u, y0, y1, xi))
    rs = slice(ly - row0, ly - row0 + height)
    cs = slice(lx, hx + 1)
    xiw = xi[None, cs].astype(np.int32)
    idxs = []
    for y in (y0, y1):
        yw = y[rs, cs].astype(np.int32)
        idxs.append(np.where(yw < 0, -1, yw * W + xiw))
    return r0u[rs, cs], r1u[rs, cs], idxs[0], idxs[1]


def image_pair_rectification(P0, P1, im0, im1, sampling_factor=1.2, crop_invalid=True):
    """API parity with ``spectavi.mvg.image_pair_rectification``
    (reference ``spectavi/mvg.py:47-111``), including valid-region
    cropping via the ``idx != -1`` bounding box."""
    im0 = np.asarray(im0)
    im1 = np.asarray(im1)
    if im0.shape != im1.shape:
        raise TypeError("Input images must have same size.")
    squeeze = im0.ndim == 2
    if squeeze:
        im0 = im0[..., None]
        im1 = im1[..., None]
    r0, r1, ri0, ri1 = _rectify_pair_host(
        np.asarray(P0, dtype=np.float64),
        np.asarray(P1, dtype=np.float64),
        im0,
        im1,
        float(sampling_factor),
    )
    if squeeze:
        r0, r1 = r0[..., 0], r1[..., 0]
    if crop_invalid:
        idx = (ri0 != -1) | (ri1 != -1)
        y, x = np.where(idx)
        lowy, highy = y.min(), y.max()
        lowx, highx = x.min(), x.max()
        r0 = r0[lowy : highy + 1, lowx : highx + 1, ...]
        r1 = r1[lowy : highy + 1, lowx : highx + 1, ...]
        ri0 = ri0[lowy : highy + 1, lowx : highx + 1]
        ri1 = ri1[lowy : highy + 1, lowx : highx + 1]
    return r0, r1, ri0, ri1
