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

    # epipolar lines in im0 from origin points (0, r, 1) in im1
    ones = jnp.ones_like(rows)
    zeros = jnp.zeros_like(rows)
    origins = jnp.stack([zeros, rows, ones], axis=-1)  # (R, 3)
    lines0 = origins @ F  # == (F.T @ origin) rows

    xx = jnp.linspace(0.0, W - 1.0, S, dtype=P0.dtype)  # (S,)
    # l0*x + l1*y + l2 = 0  =>  y = (-l2 - l0*x) / l1  (no division by l2;
    # reference compute_line, src/Camera.h:100-110)
    yy0 = (-lines0[:, 2:3] - lines0[:, 0:1] * xx[None, :]) / lines0[:, 1:2]

    # seed point = first sample of the line in im0 -> epipolar line in im1
    seeds = jnp.stack([jnp.full_like(rows, xx[0]), yy0[:, 0], ones], axis=-1)
    lines1 = seeds @ F.T  # == (F @ seed) rows
    yy1 = (-lines1[:, 2:3] - lines1[:, 0:1] * xx[None, :]) / lines1[:, 1:2]

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


@partial(jax.jit, static_argnames=("sampling_factor",))
def _rectify_bbox(P0, P1, im0, im1, sampling_factor):
    """Device pass 1: rectify + valid-region bounding box (4 scalars)."""
    r0, r1, i0, i1 = rectify_pair(P0, P1, im0, im1, sampling_factor)
    valid = (i0 != -1) | (i1 != -1)
    R, S = valid.shape
    anyrow = valid.any(axis=1)
    anycol = valid.any(axis=0)
    rows = jnp.arange(R)
    cols = jnp.arange(S)
    lowy = jnp.min(jnp.where(anyrow, rows, R))
    highy = jnp.max(jnp.where(anyrow, rows, -1))
    lowx = jnp.min(jnp.where(anycol, cols, S))
    highx = jnp.max(jnp.where(anycol, cols, -1))
    return (r0, r1, i0, i1), jnp.stack([lowy, highy, lowx, highx])


@partial(jax.jit, static_argnames=("bbox", "quantize"))
def _rectify_crop(rect, bbox, quantize):
    """Device pass 2: slice to the bbox; optionally uint8-quantize the
    images (the pipeline writes them as 8-bit anyway) so the host pull
    moves 4x fewer bytes."""
    r0, r1, i0, i1 = rect
    ly, hy, lx, hx = bbox
    out = []
    for r in (r0, r1):
        c = r[ly : hy + 1, lx : hx + 1, :]
        if quantize:
            c = jnp.clip(c * 255.0, 0.0, 255.0).astype(jnp.uint8)
        out.append(c)
    for i in (i0, i1):
        out.append(i[ly : hy + 1, lx : hx + 1])
    return tuple(out)


def rectify_pair_quantized(P0, P1, im0, im1, sampling_factor=1.0):
    """Pipeline fast path (TPU): device-side rectification, device-side
    valid-region crop, uint8 image pull.

    Returns ``(r0_u8, r1_u8, idx0, idx1)`` cropped.  Versus the parity
    API: float32 line geometry (the trunc boundary can move a sample by
    one source pixel in rare rows) and 8-bit pixel values (the pipeline
    writes 8-bit jpgs regardless) — output products are visually
    identical while the host pull drops from ~240 MB of f64 to ~30 MB
    through this machine's ~7 MB/s device tunnel, and none of the math
    runs on this image's very slow host cores.
    """
    im0 = np.asarray(im0)
    im1 = np.asarray(im1)
    if im0.shape != im1.shape:
        raise TypeError("Input images must have same size.")
    if im0.ndim == 2:
        im0 = im0[..., None]
        im1 = im1[..., None]
    rect, bbox = _rectify_bbox(
        jnp.asarray(P0, jnp.float32),
        jnp.asarray(P1, jnp.float32),
        jnp.asarray(im0, jnp.float32),
        jnp.asarray(im1, jnp.float32),
        float(sampling_factor),
    )
    ly, hy, lx, hx = (int(v) for v in np.asarray(bbox))  # one tiny pull
    r0, r1, i0, i1 = _rectify_crop(rect, (ly, hy, lx, hx), True)
    return np.asarray(r0), np.asarray(r1), np.asarray(i0), np.asarray(i1)


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
