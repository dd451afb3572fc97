"""Pallas TPU kernel: SIFT descriptors via patch DMA.

The XLA formulation of the descriptor stage gathers ~P window pixels
per (keypoint, angle) row with a flat random-access gather — measured
at only ~50M gathered elements/s on v5e, it dominates SIFT wall-clock
(~13 s of an 18 s castle pair).  A keypoint's support is CONTIGUOUS in
the gradient images though, so the TPU-native formulation is a DMA:

* gradient modulus/angle stay in HBM; per grid step one keypoint's
  ``PATCH x PATCH`` neighbourhood is copied HBM -> VMEM with a dynamic
  async copy (start indices come from scalar-prefetched keypoint
  metadata);
* the descriptor math runs on the 2D patch in VMEM: rotation into the
  keypoint frame, separable 4x4 spatial triangle weights, 8 circular
  orientation bins, Gaussian window — one masked multiply per
  orientation bin plus two tiny matmuls (``Wy^T C_o Wx``) replace the
  per-pixel scatter of the reference's vlfeat core (``vl/sift.c``);
* the patch is one size for every scale: weights vanish outside the
  true window radius, so smaller-sigma keypoints simply see zeros.

Octaves smaller than the patch fall back to the XLA path (they cost
nothing).  Outputs are raw (unnormalized) 128-d rows; the caller
applies vlfeat's normalize -> clamp(0.2) -> renormalize in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# descriptor constants (mirror features.sift)
NBP = 4
NBO = 8
WIN_FACTOR = NBP / 2.0
TWO_PI = 2.0 * np.pi

# Patch geometry: DMA start offsets must be tile-aligned (Mosaic can
# only prove divisibility for static-aligned dynamic indices), so row
# anchors are 8-aligned and column anchors 128-aligned, with enough
# slack that the worst-case alignment shift still covers the largest
# descriptor window radius (43.7 px): rows 104 = 48+55 margins, cols
# 256 = 44..171 margins.
PATCH_R = 104
PATCH_C = 256
OUT_LANES = 128  # descriptor width


KB = 8  # keypoints per grid step (output sublane tiling needs >= 8)
# rows per pallas_call: scalar-prefetch metadata lives in SMEM (~1 MB);
# 8 arrays x 4096 x 4 B = 128 KB per call stays far under the cap
# (castle-scale row counts overflow SMEM in a single call)
CHUNK = 4096


def _desc_kernel(
    yi_ref, xi_ref, lvl_ref, ky_ref, kx_ref, sig_ref, ang0_ref, val_ref,
    mod_hbm, ang_hbm, out_ref, pmod, pang, sem, *, magnif,
):
    g = pl.program_id(0)

    def start_dma(j, slot):
        k = g * KB + j
        yi = yi_ref[k]
        xi = xi_ref[k]
        lvl = lvl_ref[k]
        yi = pl.multiple_of(yi, 8)
        xi = pl.multiple_of(xi, 128)
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

    # double-buffered: patch DMA for keypoint j+1 overlaps compute on j
    pending = start_dma(0, 0)

    for j in range(KB):
        slot = j % 2
        cp_mod, cp_ang = pending
        if j + 1 < KB:
            pending = start_dma(j + 1, (j + 1) % 2)
        k = g * KB + j
        yi = yi_ref[k]
        xi = xi_ref[k]
        ky = ky_ref[k]  # keypoint coords in octave pixels (float)
        kx = kx_ref[k]
        sigma = sig_ref[k]
        theta0 = ang0_ref[k]
        valid = val_ref[k]

        iy = jax.lax.broadcasted_iota(jnp.int32, (PATCH_R, PATCH_C), 0).astype(
            jnp.float32
        )
        ix = jax.lax.broadcasted_iota(jnp.int32, (PATCH_R, PATCH_C), 1).astype(
            jnp.float32
        )
        dy = (yi.astype(jnp.float32) + iy) - ky
        dx = (xi.astype(jnp.float32) + ix) - kx

        SBP = magnif * sigma
        wsigma = WIN_FACTOR * SBP
        Wr = SBP * (NBP + 1) / 2.0 * np.sqrt(2.0) + 0.5

        ct = jnp.cos(theta0)
        st = jnp.sin(theta0)
        nx = (ct * dx + st * dy) / SBP
        ny = (-st * dx + ct * dy) / SBP

        cp_mod.wait()
        cp_ang.wait()
        m = pmod[slot, :, :]
        a = pang[slot, :, :]

        @pl.when(valid > 0)
        def _():
            theta = a - theta0
            theta = theta - jnp.floor(theta / TWO_PI) * TWO_PI  # mod 2pi
            nt = NBO * theta / TWO_PI

            win = jnp.exp(-(dx * dx + dy * dy) / (2.0 * wsigma * wsigma))
            sel = (jnp.abs(dx) <= Wr) & (jnp.abs(dy) <= Wr)
            contrib = jnp.where(sel, m * win, 0.0)

            # everything stays 2D (3D temporaries spill in Mosaic):
            # 16 spatial triangle-product planes (shared across the 8
            # orientation planes), then per bin a multiply + a
            # vector-register fold — scalar full-reductions and a
            # 128-scalar stack are Mosaic's weakest ops, so each bin is
            # folded to a (1, 128) partial ROW instead, the 128 rows
            # concatenated (sublane writes), and the final cross-lane
            # sum done once for all bins via an MXU transpose + a
            # sublane reduction.
            centers = [float(i) - (NBP - 1) / 2.0 for i in range(NBP)]
            wys = [jnp.maximum(0.0, 1.0 - jnp.abs(ny - c)) for c in centers]
            wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(nx - c)) for c in centers]
            exy = [wys[by] * wxs[bx] for by in range(NBP) for bx in range(NBP)]

            def fold_row(m2d):
                # (PATCH_R, PATCH_C) -> (1, OUT_LANES) partial sums
                acc = m2d[:, :OUT_LANES]
                for c0 in range(OUT_LANES, PATCH_C, OUT_LANES):
                    acc = acc + m2d[:, c0 : c0 + OUT_LANES]
                acc8 = acc[0:8, :]
                for r0 in range(8, PATCH_R, 8):
                    acc8 = acc8 + acc[r0 : r0 + 8, :]
                a4 = acc8[0:4, :] + acc8[4:8, :]
                a2 = a4[0:2, :] + a4[2:4, :]
                return a2[0:1, :] + a2[1:2, :]

            rows = [None] * (NBP * NBP * NBO)
            for o in range(NBO):
                dth = jnp.abs(nt - float(o))
                dth = jnp.minimum(dth, NBO - dth)
                c_o = contrib * jnp.maximum(0.0, 1.0 - dth)  # (PATCH, LANES)
                for b in range(NBP * NBP):
                    # vlfeat layout: desc[b * NBO + o]
                    rows[b * NBO + o] = fold_row(c_o * exy[b])
            P = jnp.concatenate(rows, axis=0)  # (128 bins, 128 partials)
            out_ref[j, :] = jnp.sum(P.T, axis=0)

        @pl.when(valid <= 0)
        def _():
            out_ref[j, :] = jnp.zeros((OUT_LANES,), jnp.float32)


def _pow2ceil(n):
    return 1 << max(int(n) - 1, 0).bit_length()


@jax.jit
def finish_descriptors(raw, valid):
    """vlfeat post-processing: normalize -> clamp 0.2 -> renormalize."""
    n = jnp.linalg.norm(raw, axis=1, keepdims=True)
    d = raw / jnp.maximum(n, 1e-12)
    d = jnp.minimum(d, 0.2)
    n = jnp.linalg.norm(d, axis=1, keepdims=True)
    d = d / jnp.maximum(n, 1e-12)
    return jnp.where(valid[:, None], d, 0.0)


@functools.partial(jax.jit, static_argnames=("magnif", "interpret"))
def sift_descriptors_pallas(
    mod, ang, yi, xi, lvl, ky, kx, sigma, theta0, valid, magnif=3.0,
    interpret=False,
):
    """Raw 4x4x8 descriptors for K (keypoint, angle) rows.

    ``mod, ang (S, H, W)`` float32 gradient images (H >= 104, W >= 256);
    per-row metadata: integer patch anchors ``yi, xi`` (top-left,
    8-/128-aligned and clipped to [0, H-104] x [0, W-256]), level ``lvl``,
    float keypoint centre/scale/orientation, ``valid``.
    Returns ``(K, 128)`` float32 unnormalized descriptor rows.
    """
    K = yi.shape[0]
    chunk = min(CHUNK, K + ((-K) % KB) or KB)
    padk = (-K) % chunk
    padded = lambda a, fill: jnp.pad(a, (0, padk), constant_values=fill)
    Kp = K + padk
    kernel = functools.partial(_desc_kernel, magnif=float(magnif))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(chunk // KB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (KB, OUT_LANES), lambda g, *_: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PATCH_R, PATCH_C), jnp.float32),
            pltpu.VMEM((2, PATCH_R, PATCH_C), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chunk, OUT_LANES), jnp.float32),
        interpret=interpret,
    )
    meta = (
        padded(yi.astype(jnp.int32), 0),
        padded(xi.astype(jnp.int32), 0),
        padded(lvl.astype(jnp.int32), 0),
        padded(ky.astype(jnp.float32), 0),
        padded(kx.astype(jnp.float32), 0),
        padded(sigma.astype(jnp.float32), 1.0),
        padded(theta0.astype(jnp.float32), 0),
        padded(valid.astype(jnp.int32), 0),
    )
    outs = [
        call(*(m[s : s + chunk] for m in meta), mod, ang)
        for s in range(0, Kp, chunk)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:K]
