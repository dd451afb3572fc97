"""Castle reconstruction regression vs the stored round-1 baseline.

BASELINE.json's accuracy metric is "castle/steveston clouds within ATE
bound of reference".  The reference binary cannot be built in this
image (its submodules are stripped), so the committed round-1 sparse
cloud (``artifacts/round1/castle_sparse_inliers.ply``, produced by the
full ex01 CLI on the real castle pair and visually validated) is the
frozen baseline.  This test rebuilds the cloud from the committed
match fixture (RANSAC -> triangulation, the geometry half of the
pipeline) and asserts the new cloud stays within an ICP-aligned RMSE
bound of that baseline — so any regression in the 7-point solver,
RANSAC gates, cheirality logic, or triangulation shows up as a cloud
drift even though inlier sets legitimately differ run to run.

Fixture: ``artifacts/round2/castle_matches.npz`` holds the ratio-test
matches (xd, yd: (M, 132) SIFT rows) produced by the pipeline's SIFT +
matching steps on ``/root/reference/data/castle/{01,02}.jpg``.
"""

import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(ROOT, "artifacts", "round2", "castle_matches.npz")
BASELINE = os.path.join(
    ROOT, "artifacts", "round1", "castle_sparse_inliers.ply"
)
KFILE = "/root/reference/data/castle/K.txt"


@pytest.fixture(scope="module")
def castle_cloud():
    if not (os.path.exists(FIXTURE) and os.path.exists(BASELINE)):
        pytest.skip("castle fixture/baseline artifacts not present")
    import jax

    from spectavi_tpu.pipeline.io import read_txt_matrix
    from spectavi_tpu.pipeline.two_view import (
        step3_estimate_essential,
        step4_triangulate,
    )

    data = np.load(FIXTURE)
    K = read_txt_matrix(KFILE)
    step3 = step3_estimate_essential(
        data["xd"], data["yd"], K, key=jax.random.PRNGKey(0), quiet=True
    )
    RX, ransac = step4_triangulate(step3, quiet=True)
    return RX[:, :3], ransac


def test_castle_inlier_consensus(castle_cloud):
    """RANSAC must keep finding a strong essential-matrix consensus on
    the real castle matches (round-1 recorded ~57%)."""
    _, ransac = castle_cloud
    assert ransac["success"]
    assert ransac["inlier_percent"] > 0.45


def test_castle_ate_vs_round1_baseline(castle_cloud):
    """Rebuilt cloud within ICP-RMSE bound of the stored round-1 cloud.

    Bound: the castle scene spans ~5 units (camera-0 frame, baseline
    ~1); 0.05 trimmed-RMSE means the two reconstructions agree to ~1%
    of scene scale — loose enough for inlier-set churn, tight enough
    to catch geometry regressions (flipped cheirality, bad roots, sign
    errors all move points by O(1)).
    """
    from spectavi_tpu.pipeline.io import read_ply
    from spectavi_tpu.sfm.ate import align_clouds_icp

    cloud, _ = castle_cloud
    base = read_ply(BASELINE)[:, :3]
    span = np.ptp(base, axis=0).max()
    _, rmse = align_clouds_icp(cloud, base)
    assert rmse < 0.01 * span, (rmse, span)
