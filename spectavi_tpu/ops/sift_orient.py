"""Pallas TPU kernel: SIFT orientation histograms via patch DMA.

Companion to :mod:`spectavi_tpu.ops.sift_desc` — the orientation stage
was the other random-gather hotspot (windows of ~1.5k pixels per
candidate row at ~50M gathered pixels/s).  Per grid step one
candidate's gradient patch is DMA'd HBM -> VMEM and reduced to the
36-bin gradient-orientation histogram (Gaussian-windowed, vlfeat
semantics); the cheap per-candidate tail — 6x circular box smoothing,
peak picking, parabolic refinement — runs vectorized in XLA on the
``(K, 36)`` result (:func:`orientation_peaks`).

Invalid candidates are skipped entirely with ``pl.when`` (budget
arrays are mostly padding), so cost tracks the number of REAL
keypoints, not the static budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBINS = 36
TWO_PI = 2.0 * np.pi
MAX_ANGLES = 4

# aligned patch: row anchors 8-aligned (margins 28/27 >= max window
# radius ~19), col anchors 128-aligned (margins 19..146 / 109..236)
PATCH_R = 56
PATCH_C = 256
KB = 8
# rows per pallas_call: scalar-prefetch operands live in SMEM (~1 MB);
# 7 arrays x 4096 x 4 B = 112 KB per call keeps far under the cap even
# with double-buffered call scopes (castle octave 0 alone has ~50k
# candidates, which overflows SMEM if prefetched in one call)
CHUNK = 4096


def _orient_kernel(
    yi_ref, xi_ref, lvl_ref, ky_ref, kx_ref, sig_ref, val_ref,
    mod_hbm, ang_hbm, out_ref, pmod, pang, sem,
):
    g = pl.program_id(0)

    def start_dma(j, slot):
        k = g * KB + j
        yi = pl.multiple_of(yi_ref[k], 8)
        xi = pl.multiple_of(xi_ref[k], 128)
        lvl = lvl_ref[k]
        cp_mod = pltpu.make_async_copy(
            mod_hbm.at[lvl, pl.ds(yi, PATCH_R), pl.ds(xi, PATCH_C)],
            pmod.at[slot],
            sem.at[slot, 0],
        )
        cp_ang = pltpu.make_async_copy(
            ang_hbm.at[lvl, pl.ds(yi, PATCH_R), pl.ds(xi, PATCH_C)],
            pang.at[slot],
            sem.at[slot, 1],
        )
        cp_mod.start()
        cp_ang.start()
        return cp_mod, cp_ang

    pending = start_dma(0, 0)
    for j in range(KB):
        slot = j % 2
        cp_mod, cp_ang = pending
        if j + 1 < KB:
            pending = start_dma(j + 1, (j + 1) % 2)
        k = g * KB + j
        yi = yi_ref[k]
        xi = xi_ref[k]
        ky = ky_ref[k]
        kx = kx_ref[k]
        sigma = sig_ref[k]
        valid = val_ref[k]

        cp_mod.wait()
        cp_ang.wait()

        @pl.when(valid > 0)
        def _():
            iy = jax.lax.broadcasted_iota(
                jnp.int32, (PATCH_R, PATCH_C), 0
            ).astype(jnp.float32)
            ix = jax.lax.broadcasted_iota(
                jnp.int32, (PATCH_R, PATCH_C), 1
            ).astype(jnp.float32)
            dy = (yi.astype(jnp.float32) + iy) - ky
            dx = (xi.astype(jnp.float32) + ix) - kx
            m = pmod[slot, :, :]
            a = pang[slot, :, :]

            sigmaw = 1.5 * sigma
            Wr = jnp.maximum(jnp.floor(3.0 * sigmaw), 1.0)
            r2 = dx * dx + dy * dy
            wgt = jnp.exp(-r2 / (2.0 * sigmaw * sigmaw))
            sel = r2 < Wr * Wr + 0.6
            contrib = jnp.where(sel, m * wgt, 0.0)

            bins = jnp.floor(NBINS * a / TWO_PI).astype(jnp.int32) % NBINS
            hist = [
                jnp.sum(jnp.where(bins == b, contrib, 0.0))
                for b in range(NBINS)
            ]
            pad = [jnp.float32(0.0)] * (128 - NBINS)
            out_ref[j, :] = jnp.stack(hist + pad)

        @pl.when(valid <= 0)
        def _():
            out_ref[j, :] = jnp.zeros((128,), jnp.float32)


@jax.jit
def sift_orient_hist_pallas(mod, ang, yi, xi, lvl, ky, kx, sigma, valid):
    """36-bin orientation histograms for K candidate keypoints.

    ``mod, ang (L, H, W)`` stacked gradient canvas (8/128-aligned);
    anchors pre-aligned/clipped.  Returns ``(K, 36)`` float32.
    """
    K = yi.shape[0]
    chunk = min(CHUNK, K + ((-K) % KB) or KB)
    padk = (-K) % chunk
    padded = lambda a, fill: jnp.pad(a, (0, padk), constant_values=fill)
    Kp = K + padk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(chunk // KB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (KB, 128), lambda g, *_: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PATCH_R, PATCH_C), jnp.float32),
            pltpu.VMEM((2, PATCH_R, PATCH_C), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    call = pl.pallas_call(
        _orient_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chunk, 128), jnp.float32),
    )
    meta = (
        padded(yi.astype(jnp.int32), 0),
        padded(xi.astype(jnp.int32), 0),
        padded(lvl.astype(jnp.int32), 0),
        padded(ky.astype(jnp.float32), 0),
        padded(kx.astype(jnp.float32), 0),
        padded(sigma.astype(jnp.float32), 1.0),
        padded(valid.astype(jnp.int32), 0),
    )
    outs = [
        call(*(m[s : s + chunk] for m in meta), mod, ang)
        for s in range(0, Kp, chunk)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:K, :NBINS]


@jax.jit
def orientation_peaks(hist, kp_valid):
    """vlfeat orientation post-processing on raw 36-bin histograms:
    6x circular box smoothing, peaks >= 0.8*max with parabolic
    refinement, up to 4 angles in ascending-bin order.

    ``hist (K, 36)`` -> ``(angles (K, 4), avalid (K, 4))``.
    """
    for _ in range(6):
        hist = (
            jnp.roll(hist, 1, axis=1) + hist + jnp.roll(hist, -1, axis=1)
        ) / 3.0
    hmax = hist.max(axis=1, keepdims=True)
    hp = jnp.roll(hist, -1, axis=1)
    hm = jnp.roll(hist, 1, axis=1)
    is_peak = (hist > hm) & (hist > hp) & (hist >= 0.8 * hmax)
    binidx = jnp.arange(NBINS)[None, :].repeat(hist.shape[0], 0)
    order_key = jnp.where(is_peak, binidx, NBINS + 1)
    sel_bins = -jax.lax.top_k(-order_key, MAX_ANGLES)[0]
    avalid = sel_bins <= NBINS
    sel_bins = jnp.clip(sel_bins, 0, NBINS - 1)
    h0 = jnp.take_along_axis(hist, sel_bins, 1)
    hpk = jnp.take_along_axis(hp, sel_bins, 1)
    hmk = jnp.take_along_axis(hm, sel_bins, 1)
    denom = hpk + hmk - 2.0 * h0
    di = jnp.where(jnp.abs(denom) > 1e-20, -0.5 * (hpk - hmk) / denom, 0.0)
    th = jnp.mod(TWO_PI * (sel_bins + di + 0.5) / NBINS, TWO_PI)
    return th, avalid & kp_valid[:, None]
