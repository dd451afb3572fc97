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
    im, gold = golden
    kp = ours
    # similar keypoint count (golden: 1168)
    assert 0.9 * len(gold) <= len(kp) <= 1.15 * len(gold)

    from scipy.spatial import cKDTree

    tree = cKDTree(kp[:, :2])
    pairs = tree.query_ball_point(gold[:, :2], r=1.0)
    matched, cos_all, sig_ratio = 0, [], []
    for gi, cand in enumerate(pairs):
        if not cand:
            continue
        cand = np.asarray(cand)
        dang = np.abs((kp[cand, 3] - gold[gi, 3] + np.pi) % (2 * np.pi) - np.pi)
        best = cand[np.argmin(dang)]
        if dang.min() < 0.2:
            matched += 1
            a, b = kp[best, 4:], gold[gi, 4:]
            cos_all.append(
                (a * b).sum()
                / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
            )
            sig_ratio.append(kp[best, 2] / gold[gi, 2])
    cos_all = np.asarray(cos_all)
    sig_ratio = np.asarray(sig_ratio)
    assert matched / len(gold) >= 0.99
    assert np.median(cos_all) > 0.999
    assert (cos_all > 0.95).mean() >= 0.99
    assert np.abs(np.median(sig_ratio) - 1.0) < 1e-3


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
