"""SIFT tests: golden comparison against vlfeat's precomputed output
plus geometric property tests.

The reference's golden test (``test/test_feature.py:32-47``) asserts
exact ``np.allclose`` row-for-row equality with vlfeat's binary — a
C-implementation-identity check.  The TPU implementation reproduces the
same algorithm with different float orderings, so the golden check here
is a matching-based fidelity bound (per SURVEY.md §7.4): virtually
every golden keypoint must have a counterpart at the same position,
scale, and angle whose descriptor is near-identical.
"""

import numpy as np
import pytest

from spectavi_tpu.features.sift import sift_filter, sift_filter_striped

GOLD_IM = "/root/reference/data/sift-test/sur-ogre.npz"
GOLD_SIFT = "/root/reference/data/sift-test/sur-ogre.sift"


@pytest.fixture(scope="module")
def golden():
    im = np.load(GOLD_IM)["im"].astype("float32")
    gold = np.loadtxt(GOLD_SIFT)
    return im, gold


@pytest.fixture(scope="module")
def ours(golden):
    im, _ = golden
    return sift_filter(im)


def test_sift_golden_keypoints(golden, ours):
    """Scale-gated golden matching, with the residual gap quantified.

    Measured on this image (analysis in ``docs/PARITY.md`` §SIFT):
    1167/1168 golden keypoints (99.91%) have a counterpart within 1 px
    at the same scale; 1164/1168 (99.66%) additionally agree in angle to
    <0.2 rad.  The four residuals are each a known float-ordering
    convention, not an algorithmic gap: three are secondary-orientation
    peaks sitting ON vlfeat's 0.8*max peak threshold (the smoothed
    36-bin histogram differs in the last float ulps, flipping the peak
    in/out), one is a subpixel-refinement difference on a sigma=4.2
    keypoint that lands 1.3 px away.  Matched-descriptor cosine: median
    0.99977, p1 0.989, min 0.931.
    """
    im, gold = golden
    kp = ours
    # similar keypoint count (golden: 1168)
    assert 0.9 * len(gold) <= len(kp) <= 1.15 * len(gold)

    from scipy.spatial import cKDTree

    tree = cKDTree(kp[:, :2])
    pairs = tree.query_ball_point(gold[:, :2], r=1.0)
    pos_scale, matched, cos_all = 0, 0, []
    for gi, cand in enumerate(pairs):
        if not cand:
            continue
        cand = np.asarray(cand)
        # same-scale gate: a 0.9-px-away sibling from another octave is
        # a different keypoint, not this one's counterpart
        sig_ratio = kp[cand, 2] / gold[gi, 2]
        cand = cand[(sig_ratio > 0.8) & (sig_ratio < 1.25)]
        if len(cand) == 0:
            continue
        pos_scale += 1
        dang = np.abs((kp[cand, 3] - gold[gi, 3] + np.pi) % (2 * np.pi) - np.pi)
        best = cand[np.argmin(dang)]
        if dang.min() < 0.2:
            matched += 1
            a, b = kp[best, 4:], gold[gi, 4:]
            cos_all.append(
                (a * b).sum()
                / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
            )
    cos_all = np.asarray(cos_all)
    assert pos_scale / len(gold) >= 0.995   # measured 99.91%
    assert matched / len(gold) >= 0.99      # measured 99.66%
    assert np.median(cos_all) > 0.9995      # measured 0.99977
    assert (cos_all > 0.99).mean() >= 0.98  # measured 98.97%
    assert (cos_all > 0.95).mean() >= 0.995  # measured 99.83%
    assert cos_all.min() > 0.9              # measured 0.931


def test_sift_output_layout(ours):
    kp = ours
    assert kp.shape[1] == 132
    assert kp.dtype == np.float32
    # descriptors quantized to [0, 255]
    assert kp[:, 4:].min() >= 0 and kp[:, 4:].max() <= 255
    assert np.all(kp[:, 4:] == np.floor(kp[:, 4:]))
    # angles in [0, 2pi)
    assert kp[:, 3].min() >= 0 and kp[:, 3].max() < 2 * np.pi + 1e-6
    # sigmas positive
    assert kp[:, 2].min() > 0


def test_sift_translation_covariance(golden):
    """Cropping the image by a whole-pixel offset shifts keypoints."""
    im, _ = golden
    shift = 16
    kp0 = sift_filter(im)
    kp1 = sift_filter(im[shift:, shift:])
    from scipy.spatial import cKDTree

    # restrict to interior keypoints away from the crop boundary
    sel0 = (kp0[:, 0] > shift + 20) & (kp0[:, 1] > shift + 20)
    tree = cKDTree(kp1[:, :2] + shift)
    d, _ = tree.query(kp0[sel0, :2], k=1)
    assert (d < 1.0).mean() > 0.85


def test_sift_rejects_3d():
    with pytest.raises(TypeError):
        sift_filter(np.zeros((4, 4, 3)))


def test_sift_striped_similar(golden):
    im, _ = golden
    kp = sift_filter(im)
    kps = sift_filter_striped(im, nthread=3, buffer_size=24)
    # striped mode finds a very similar keypoint set (reference docs the
    # same caveat: results "should be very similar", feature.py:127-131)
    from scipy.spatial import cKDTree

    tree = cKDTree(kps[:, :2])
    d, _ = tree.query(kp[:, :2], k=1)
    assert (d < 1.0).mean() > 0.8


def test_desc_kernel_interpret_parity(rng):
    """The Pallas patch-DMA descriptor kernel (interpret mode) must
    agree with an independent numpy oracle of the vlfeat descriptor
    formula on random gradients and keypoints."""
    from spectavi_tpu.ops.sift_desc import (
        PATCH_C,
        PATCH_R,
        sift_descriptors_pallas,
    )
    import jax.numpy as jnp

    S, H, W = 2, 112, 384
    mod = rng.random((S, H, W)).astype(np.float32)
    ang = (rng.random((S, H, W)) * 2 * np.pi).astype(np.float32)
    K = 9
    ky = rng.uniform(40, H - 40, K).astype(np.float32)
    kx = rng.uniform(60, W - 60, K).astype(np.float32)
    sig = rng.uniform(1.5, 3.0, K).astype(np.float32)
    th0 = (rng.random(K) * 2 * np.pi).astype(np.float32)
    lvl = rng.integers(0, S, K).astype(np.int32)
    val = np.ones(K, np.int32)
    val[-1] = 0
    yi = np.clip((np.round(ky).astype(np.int32) - 48) & ~7, 0, H - PATCH_R)
    xi = np.clip((np.round(kx).astype(np.int32) - 44) & ~127, 0, W - PATCH_C)

    raw = np.asarray(
        sift_descriptors_pallas(
            jnp.asarray(mod), jnp.asarray(ang),
            jnp.asarray(yi), jnp.asarray(xi), jnp.asarray(lvl),
            jnp.asarray(ky), jnp.asarray(kx), jnp.asarray(sig),
            jnp.asarray(th0), jnp.asarray(val), interpret=True,
        )
    )

    # independent numpy oracle (float64)
    for k in range(K):
        m = mod[lvl[k], yi[k] : yi[k] + PATCH_R, xi[k] : xi[k] + PATCH_C]
        a = ang[lvl[k], yi[k] : yi[k] + PATCH_R, xi[k] : xi[k] + PATCH_C]
        ys = yi[k] + np.arange(PATCH_R, dtype=np.float64)[:, None]
        xs = xi[k] + np.arange(PATCH_C, dtype=np.float64)[None, :]
        dy = ys - ky[k]
        dx = xs - kx[k]
        SBP = 3.0 * sig[k]
        wsigma = 2.0 * SBP
        Wr = SBP * 2.5 * np.sqrt(2.0) + 0.5
        ct, st = np.cos(th0[k]), np.sin(th0[k])
        nx = (ct * dx + st * dy) / SBP
        ny = (-st * dx + ct * dy) / SBP
        nt = 8.0 * np.mod(a - th0[k], 2 * np.pi) / (2 * np.pi)
        win = np.exp(-(dx * dx + dy * dy) / (2 * wsigma * wsigma))
        contrib = np.where(
            (np.abs(dx) <= Wr) & (np.abs(dy) <= Wr), m * win, 0.0
        )
        want = np.zeros(128)
        for o in range(8):
            dth = np.minimum(np.abs(nt - o), 8 - np.abs(nt - o))
            c_o = contrib * np.maximum(0.0, 1.0 - dth)
            for by in range(4):
                wy = np.maximum(0.0, 1.0 - np.abs(ny - (by - 1.5)))
                for bx in range(4):
                    wx = np.maximum(0.0, 1.0 - np.abs(nx - (bx - 1.5)))
                    want[(by * 4 + bx) * 8 + o] = (c_o * wy * wx).sum()
        if val[k]:
            scale = max(np.abs(want).max(), 1e-6)
            np.testing.assert_allclose(
                raw[k] / scale, want / scale, atol=2e-5
            )
        else:
            assert np.all(raw[k] == 0.0)


def test_sift_blank_image_no_keypoints():
    """An all-constant image has no DoG extrema: (0, 132) out, no crash."""
    out = sift_filter(np.zeros((64, 64), np.float32))
    assert out.shape == (0, 132)


def test_sift_batch_mixed_shapes(rng):
    """sift_filter_batch groups same-shape images; mixed shapes must
    return each image's own result in order."""
    im_a = rng.random((48, 64)).astype(np.float32)
    im_b = rng.random((64, 48)).astype(np.float32)
    from spectavi_tpu.features.sift import sift_filter_batch

    batch = sift_filter_batch([im_a, im_b, im_a])
    solo_a = sift_filter(im_a)
    solo_b = sift_filter(im_b)
    np.testing.assert_allclose(batch[0], solo_a, atol=1e-5)
    np.testing.assert_allclose(batch[1], solo_b, atol=1e-5)
    np.testing.assert_allclose(batch[2], solo_a, atol=1e-5)


def test_sift_batch_rejects_unknown_kwargs():
    """Misspelled tuning kwargs must fail loudly, not silently leave
    the defaults in place (a caller 'setting' peak_tresh would
    otherwise believe the threshold changed)."""
    from spectavi_tpu.features.sift import sift_filter_batch

    with pytest.raises(TypeError):
        sift_filter_batch([np.zeros((32, 32), np.float32)], peak_tresh=5.0)


def test_orient_kernel_interpret_parity(rng):
    """The Pallas patch-DMA orientation-histogram kernel must agree
    with a float64 numpy oracle of the vlfeat windowed 36-bin
    histogram."""
    import jax
    import jax.numpy as jnp

    from spectavi_tpu.ops import sift_orient as so

    S, H, W = 2, 64, 384
    mod = rng.random((S, H, W)).astype(np.float32)
    ang = (rng.random((S, H, W)) * 2 * np.pi).astype(np.float32)
    K = 7
    ky = rng.uniform(25, H - 25, K).astype(np.float32)
    kx = rng.uniform(30, W - 30, K).astype(np.float32)
    sig = rng.uniform(1.5, 3.0, K).astype(np.float32)
    lvl = rng.integers(0, S, K).astype(np.int32)
    val = np.ones(K, np.int32)
    val[-1] = 0
    yi = np.clip(
        (np.round(ky).astype(np.int32) - so.PATCH_R // 2) & ~7,
        0, H - so.PATCH_R,
    )
    xi = np.clip(
        (np.round(kx).astype(np.int32) - 19) & ~127, 0, W - so.PATCH_C
    )

    # interpret-mode pallas_call (patch the module's call kwargs via a
    # direct invocation of the kernel wrapper is not exposed; rebuild
    # the call inline with interpret=True)
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Kp = K + ((-K) % so.KB)
    pad = lambda a, f: np.concatenate([a, np.full(Kp - K, f, a.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(Kp // so.KB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (so.KB, 128), lambda g, *_: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, so.PATCH_R, so.PATCH_C), jnp.float32),
            pltpu.VMEM((2, so.PATCH_R, so.PATCH_C), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    call = pl.pallas_call(
        so._orient_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kp, 128), jnp.float32),
        interpret=True,
    )

    hist = np.asarray(call(
        jnp.asarray(pad(yi, 0)), jnp.asarray(pad(xi, 0)),
        jnp.asarray(pad(lvl, 0)), jnp.asarray(pad(ky, 0)),
        jnp.asarray(pad(kx, 0)), jnp.asarray(pad(sig, 1.0)),
        jnp.asarray(pad(val, 0)), jnp.asarray(mod), jnp.asarray(ang),
    ))[:K, :36]

    for k in range(K):
        m = mod[lvl[k], yi[k]:yi[k] + so.PATCH_R, xi[k]:xi[k] + so.PATCH_C]
        a = ang[lvl[k], yi[k]:yi[k] + so.PATCH_R, xi[k]:xi[k] + so.PATCH_C]
        ys = yi[k] + np.arange(so.PATCH_R, dtype=np.float64)[:, None]
        xs = xi[k] + np.arange(so.PATCH_C, dtype=np.float64)[None, :]
        dy, dx = ys - ky[k], xs - kx[k]
        sigmaw = 1.5 * sig[k]
        Wr = max(np.floor(3.0 * sigmaw), 1.0)
        r2 = dx * dx + dy * dy
        contrib = np.where(
            r2 < Wr * Wr + 0.6, m * np.exp(-r2 / (2 * sigmaw * sigmaw)), 0.0
        )
        bins = np.floor(36 * a / (2 * np.pi)).astype(int) % 36
        want = np.zeros(36)
        np.add.at(want, bins.ravel(), contrib.ravel())
        if val[k]:
            scale = max(want.max(), 1e-9)
            np.testing.assert_allclose(
                hist[k] / scale, want / scale, atol=2e-5
            )
        else:
            assert np.all(hist[k] == 0.0)


def test_native_sift_baseline_fidelity():
    """The C++ CPU SIFT baseline (native/sift_baseline.cpp) must do the
    same work as vlfeat to be a legitimate throughput denominator:
    >=85% of the golden keypoints recovered with matching descriptors
    (measured 91% / median cosine 0.9997 at authoring time)."""
    import numpy as np

    from spectavi_tpu.utils.hostops import sift_cpu

    d = np.load("/root/reference/data/sift-test/sur-ogre.npz")
    im = d["im"].astype(np.float32)
    if im.max() > 1.5:
        im = im / im.max()
    kp = sift_cpu(im)
    gold = np.loadtxt("/root/reference/data/sift-test/sur-ogre.sift")

    pos_d = np.linalg.norm(gold[:, None, :2] - kp[None, :, :2], axis=2)
    sig_r = np.abs(np.log(gold[:, None, 2] / kp[None, :, 2]))
    da = np.abs(gold[:, None, 3] - kp[None, :, 3])
    da = np.minimum(da, 2 * np.pi - da)
    cand = (pos_d < 1.5) & (sig_r < 0.3) & (da < 0.3)
    matched = cand.any(1)
    assert matched.mean() >= 0.85, matched.mean()
    cos = []
    for g in np.nonzero(matched)[0]:
        js = np.nonzero(cand[g])[0]
        j = js[np.argmin(pos_d[g, js])]
        a, b = gold[g, 4:], kp[j, 4:]
        cos.append(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert np.median(cos) >= 0.995, np.median(cos)


def test_sift_filter_batch_device_matches_host(golden):
    """The device-resident descriptor path must be bit-identical to the
    host API: same meta columns, same vlfeat-quantized descriptors
    (it IS the same compute — only the pull is skipped)."""
    import numpy as np

    from spectavi_tpu.features.sift import (
        sift_filter_batch,
        sift_filter_batch_device,
    )

    im, _ = golden
    ims = [im, im[24:, 16:]]
    host = sift_filter_batch(ims)
    dev = sift_filter_batch_device(ims)
    for h, d in zip(host, dev):
        assert d["meta"].shape == (h.shape[0], 4)
        np.testing.assert_array_equal(d["meta"], h[:, :4])
        np.testing.assert_array_equal(
            np.asarray(d["desc"]).astype(np.float32), h[:, 4:]
        )


def test_fused_frontend_matches_host_step2(golden, tmp_path):
    """step12_fused_device must produce the same matches as
    step1 + step2(matching_method='l2-mxu') — identical quantization,
    matcher, and ratio semantics."""
    import numpy as np
    from PIL import Image

    from spectavi_tpu.pipeline.two_view import (
        step1_sift_detect,
        step2_match_keypoints,
        step12_fused_device,
    )

    im, _ = golden
    im0 = im / max(im.max(), 1e-9)
    im1 = im0[12:, 8:]
    p0 = str(tmp_path / "a.png")
    p1 = str(tmp_path / "b.png")
    Image.fromarray((im0 * 255).astype(np.uint8)).save(p0)
    Image.fromarray((im1 * 255).astype(np.uint8)).save(p1)

    kps = step1_sift_detect([p0, p1], quiet=True)
    xd_h, yd_h = step2_match_keypoints(
        kps, matching_method="l2-mxu", quiet=True
    )
    metas, (xd_d, yd_d) = step12_fused_device([p0, p1], quiet=True)
    assert metas[0].shape[1] == 4
    assert xd_d.shape[0] == xd_h.shape[0]
    np.testing.assert_allclose(xd_d[:, :2], xd_h[:, :2], atol=1e-5)
    np.testing.assert_allclose(yd_d[:, :2], yd_h[:, :2], atol=1e-5)
