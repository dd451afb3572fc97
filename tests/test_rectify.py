"""Rectification semantics tests against a small numpy oracle."""

import numpy as np

from spectavi_tpu import mvg


def _numpy_rectify(P0, P1, im0, im1, sf):
    """Independent per-scanline oracle implementing the documented
    semantics (epipolar line per output row, truncate-toward-zero
    nearest-neighbour sampling, -1/-0 sentinels)."""
    H, W = im0.shape
    F = np.asarray(mvg.fundamental_from_cameras(P0, P1))
    extra = int(max(H, W) / 2.0)
    S = int(sf * W)
    R = H + 2 * extra
    r0 = np.zeros((R, S))
    r1 = np.zeros((R, S))
    i0 = -np.ones((R, S), dtype=np.int32)
    i1 = -np.ones((R, S), dtype=np.int32)
    xx = np.linspace(0, W - 1, S)
    for k, row in enumerate(range(-extra, H + extra)):
        line0 = F.T @ np.array([0.0, row, 1.0])
        yy0 = (-line0[2] - line0[0] * xx) / line0[1]
        seed = np.array([xx[0], yy0[0], 1.0])
        line1 = F @ seed
        yy1 = (-line1[2] - line1[0] * xx) / line1[1]
        for (yy, rim, idx, im) in ((yy0, r0, i0, im0), (yy1, r1, i1, im1)):
            xi = np.trunc(xx).astype(int)
            yi = np.trunc(yy).astype(int)
            ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            rim[k, ok] = im[yi[ok], xi[ok]]
            idx[k, ok] = yi[ok] * W + xi[ok]
    return r0, r1, i0, i1


def test_rectify_matches_numpy_oracle(rng):
    H, W = 24, 32
    im0 = rng.random((H, W))
    im1 = rng.random((H, W))
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    a = 0.15
    Rm = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    P1 = np.hstack([Rm, np.array([[0.5], [0.1], [0.05]])])
    r0, r1, i0, i1 = mvg.image_pair_rectification(
        P0, P1, im0, im1, sampling_factor=1.2, crop_invalid=False
    )
    o0, o1, oi0, oi1 = _numpy_rectify(P0, P1, im0, im1, 1.2)
    assert r0.shape == o0.shape
    np.testing.assert_allclose(r0, o0, atol=1e-10)
    np.testing.assert_allclose(r1, o1, atol=1e-10)
    np.testing.assert_array_equal(i0, oi0)
    np.testing.assert_array_equal(i1, oi1)


def test_rectify_index_maps_point_back(rng):
    """Valid index-map entries must reproduce the rectified pixel."""
    H, W = 20, 28
    im0 = rng.random((H, W))
    im1 = rng.random((H, W))
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = np.hstack([np.eye(3), np.array([[0.3], [0.0], [0.1]])])
    r0, r1, i0, i1 = mvg.image_pair_rectification(
        P0, P1, im0, im1, crop_invalid=False
    )
    ok = i0 != -1
    flat = im0.reshape(-1)
    np.testing.assert_allclose(r0[ok], flat[i0[ok]], atol=1e-12)


def test_rectify_crop_bounding_box(rng):
    H, W = 16, 16
    im = rng.random((H, W))
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = np.hstack([np.eye(3), np.array([[0.2], [0.1], [0.0]])])
    rc0, rc1, ci0, ci1 = mvg.image_pair_rectification(P0, P1, im, im)
    # cropped output contains every valid pixel of the uncropped one
    r0, r1, i0, i1 = mvg.image_pair_rectification(P0, P1, im, im, crop_invalid=False)
    assert ((ci0 != -1) | (ci1 != -1)).sum() == ((i0 != -1) | (i1 != -1)).sum()
    assert rc0.shape[0] <= r0.shape[0] and rc0.shape[1] <= r0.shape[1]


def test_rectify_shape_mismatch():
    import pytest

    with pytest.raises(TypeError):
        mvg.image_pair_rectification(
            np.eye(3, 4), np.eye(3, 4), np.zeros((4, 4)), np.zeros((5, 5))
        )


def _numpy_rectify_color(P0, P1, im0, im1, sf):
    """Channel-aware oracle incl. the reference's ``extra = max(H,
    W*C)//2`` vertical-padding quirk (``src/Camera.h:263-267`` folds
    channels into its column count)."""
    H, W, C = im0.shape
    F = np.asarray(mvg.fundamental_from_cameras(P0, P1))
    extra = int(max(H, W * C) / 2.0)
    S = int(sf * W)
    R = H + 2 * extra
    r0 = np.zeros((R, S, C))
    r1 = np.zeros((R, S, C))
    i0 = -np.ones((R, S), dtype=np.int32)
    i1 = -np.ones((R, S), dtype=np.int32)
    xx = np.linspace(0, W - 1, S)
    for k, row in enumerate(range(-extra, H + extra)):
        line0 = F.T @ np.array([0.0, row, 1.0])
        yy0 = (-line0[2] - line0[0] * xx) / line0[1]
        seed = np.array([xx[0], yy0[0], 1.0])
        line1 = F @ seed
        yy1 = (-line1[2] - line1[0] * xx) / line1[1]
        for (yy, rim, idx, im) in ((yy0, r0, i0, im0), (yy1, r1, i1, im1)):
            xi = np.trunc(xx).astype(int)
            yi = np.trunc(yy).astype(int)
            ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            rim[k, ok, :] = im[yi[ok], xi[ok], :]
            idx[k, ok] = yi[ok] * W + xi[ok]
    return r0, r1, i0, i1


def test_rectify_color_matches_numpy_oracle(rng):
    """3-channel rectification against the channel-aware oracle (the
    round-1 suite only covered grayscale)."""
    H, W = 18, 22
    im0 = rng.random((H, W, 3))
    im1 = rng.random((H, W, 3))
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    a = -0.12
    Rm = np.array(
        [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
    )
    P1 = np.hstack([Rm, np.array([[0.4], [-0.15], [0.08]])])
    r0, r1, i0, i1 = mvg.image_pair_rectification(
        P0, P1, im0, im1, sampling_factor=1.0, crop_invalid=False
    )
    o0, o1, oi0, oi1 = _numpy_rectify_color(P0, P1, im0, im1, 1.0)
    assert r0.shape == o0.shape  # extra = max(H, W*C)//2 quirk honored
    np.testing.assert_allclose(r0, o0, atol=1e-10)
    np.testing.assert_allclose(r1, o1, atol=1e-10)
    np.testing.assert_array_equal(i0, oi0)
    np.testing.assert_array_equal(i1, oi1)


def test_rectify_strong_rotation_oracle(rng):
    """A harder geometry: combined yaw+roll with a long baseline."""
    H, W = 30, 26
    im0 = rng.random((H, W))
    im1 = rng.random((H, W))
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    ay, ar = 0.35, 0.2
    Ry = np.array(
        [[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]]
    )
    Rr = np.array(
        [[np.cos(ar), -np.sin(ar), 0], [np.sin(ar), np.cos(ar), 0], [0, 0, 1]]
    )
    P1 = np.hstack([Ry @ Rr, np.array([[1.2], [0.3], [-0.2]])])
    r0, r1, i0, i1 = mvg.image_pair_rectification(
        P0, P1, im0, im1, sampling_factor=1.5, crop_invalid=False
    )
    o0, o1, oi0, oi1 = _numpy_rectify(P0, P1, im0, im1, 1.5)
    np.testing.assert_allclose(r0, o0, atol=1e-10)
    np.testing.assert_allclose(r1, o1, atol=1e-10)
    np.testing.assert_array_equal(i0, oi0)
    np.testing.assert_array_equal(i1, oi1)


def test_rectify_device_path_matches_host(rng):
    """The jnp device path (``rectify_pair``) and the numpy host path
    behind the public API must agree exactly (f64 on CPU)."""
    import jax.numpy as jnp

    from spectavi_tpu.mvg.rectify import _rectify_pair_host, rectify_pair

    H, W = 20, 24
    im0 = rng.random((H, W, 1))
    im1 = rng.random((H, W, 1))
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = np.hstack([np.eye(3), np.array([[0.35], [0.12], [0.05]])])
    d = rectify_pair(
        jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(im0), jnp.asarray(im1), 1.2
    )
    h = _rectify_pair_host(P0, P1, im0, im1, 1.2)
    for a, b in zip(d, h):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-9)


def test_rectify_quantized_pipeline_path(rng):
    """The pipeline's device fast path (f32 geometry + on-device crop +
    uint8 quantization) must agree with the parity API up to the
    documented differences (8-bit pixels; rare one-pixel trunc shifts
    from f32 line math)."""
    from spectavi_tpu.mvg.rectify import rectify_pair_quantized

    H, W = 24, 30
    im0 = rng.random((H, W, 3))
    im1 = rng.random((H, W, 3))
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    a = 0.1
    Rm = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    )
    P1 = np.hstack([Rm, np.array([[0.45], [0.1], [0.02]])])
    q0, q1, qi0, qi1 = rectify_pair_quantized(P0, P1, im0, im1, 1.0)
    r0, r1, ri0, ri1 = mvg.image_pair_rectification(
        P0, P1, im0, im1, sampling_factor=1.0
    )
    assert q0.dtype == np.uint8 and qi0.dtype == np.int32
    assert q0.shape == r0.shape and qi1.shape == ri1.shape
    for qi, ri in ((qi0, ri0), (qi1, ri1)):
        assert (qi == ri).mean() > 0.98
    for q, r in ((q0, r0), (q1, r1)):
        same = np.abs(q.astype(int) - np.clip(r * 255, 0, 255).astype(int))
        assert (same <= 1).mean() > 0.98
