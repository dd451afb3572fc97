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
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(ROOT, "artifacts", "round2", "castle_matches.npz")
# primary baseline: the round-2 cloud (full-f32 geometry).  The round-1
# cloud is kept as a loose continuity check only — it was reconstructed
# while the TPU backend silently ran f32 matmuls as bf16 (diagnosed and
# fixed in round 2), which warps its geometry at the few-percent level.
BASELINE = os.path.join(
    ROOT, "artifacts", "round2", "castle_sparse_inliers.ply"
)
BASELINE_R1 = os.path.join(
    ROOT, "artifacts", "round1", "castle_sparse_inliers.ply"
)
KFILE = "/root/reference/data/castle/K.txt"


_REBUILD = """
import sys
sys.path.insert(0, {root!r})
import numpy as np, jax
from spectavi_tpu.pipeline.io import read_txt_matrix
from spectavi_tpu.pipeline.two_view import (
    step3_estimate_essential, step4_triangulate,
)
data = np.load({fixture!r})
K = read_txt_matrix({kfile!r})
step3 = step3_estimate_essential(
    data["xd"], data["yd"], K, key=jax.random.PRNGKey(0), quiet=True
)
RX, ransac = step4_triangulate(step3, quiet=True)
np.savez({out!r}, cloud=RX[:, :3],
         inlier_percent=ransac["inlier_percent"],
         essential=ransac["essential"],
         n_inliers=len(ransac["inlier_idx"]))
"""


@pytest.fixture(scope="module")
def castle_cloud(tmp_path_factory):
    if not (os.path.exists(FIXTURE) and os.path.exists(BASELINE)):
        pytest.skip("castle fixture/baseline artifacts not present")
    import subprocess

    # rebuild in a clean f32 CPU subprocess: this is a regression test
    # of the SHIPPED pipeline (f32), and the suite-wide x64 flag would
    # put RANSAC on a different numeric trajectory
    out = str(tmp_path_factory.mktemp("castle") / "rebuilt.npz")
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    code = _REBUILD.format(root=ROOT, fixture=FIXTURE, kfile=KFILE, out=out)
    subprocess.run(
        [sys.executable, "-c", code], env=env, check=True, timeout=1200
    )
    data = np.load(out)
    ransac = {
        "inlier_percent": float(data["inlier_percent"]),
        "essential": data["essential"],
        "n_inliers": int(data["n_inliers"]),
    }
    return data["cloud"], ransac


def test_castle_inlier_consensus(castle_cloud):
    """RANSAC must keep finding a strong essential-matrix consensus on
    the real castle matches (round-2 recorded 53.4% on 3867 matches;
    round 4's near-miss LO seeding reaches 0.66-0.70 across seeds on
    this fixture — the bar pins that level so a seeding/scoring
    regression shows up.  Still below the "ultra" preset's 80%
    requirement, so ``success`` is False by design and
    ``find_best_even_in_failure`` keeps the model, exactly the
    reference ex01's behaviour on castle)."""
    _, ransac = castle_cloud
    assert ransac["inlier_percent"] > 0.55
    assert np.isfinite(ransac["essential"]).all()
    assert ransac["n_inliers"] > 1500


def test_castle_ate_vs_baseline(castle_cloud):
    """Rebuilt cloud within ICP-RMSE bound of the frozen baseline.

    1% of scene span: loose enough for inlier-set churn, tight enough
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


def test_castle_continuity_vs_round1(castle_cloud):
    """Loose agreement with the round-1 cloud (reconstructed under the
    since-fixed bf16 matmul default, so a few percent of drift is
    expected; gross geometry must still line up)."""
    import pytest

    if not os.path.exists(BASELINE_R1):
        pytest.skip("round-1 artifact not present")
    from spectavi_tpu.pipeline.io import read_ply
    from spectavi_tpu.sfm.ate import align_clouds_icp

    cloud, _ = castle_cloud
    base = read_ply(BASELINE_R1)[:, :3]
    span = np.ptp(base, axis=0).max()
    _, rmse = align_clouds_icp(cloud, base)
    assert rmse < 0.06 * span, (rmse, span)
