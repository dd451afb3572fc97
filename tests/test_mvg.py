"""Property tests for the geometry core.

Same pillars as the reference suite (``/root/reference/test/test_mvg.py``):
simulate ground truth with a fixed seed, assert exact recovery within the
reference's tolerances (DLT reprojection < 1e-3, 7-point epipolar
constraint < 1e-10, F recovery std < 1e-8, RANSAC E recovery std < 1e-2).
"""

import numpy as np
import pytest

from spectavi_tpu import mvg

NTESTCASES = 100


def skew(s):
    m = np.zeros((3, 3))
    m[0, 1], m[0, 2] = -s[2], s[1]
    m[1, 0], m[1, 2] = s[2], -s[0]
    m[2, 0], m[2, 1] = -s[1], s[0]
    return m


def test_dlt_reprojection_error(rng):
    for _ in range(NTESTCASES):
        P0 = rng.standard_normal((3, 4))
        P1 = rng.standard_normal((3, 4))
        X0 = rng.standard_normal(4)
        x0 = P0 @ X0
        x1 = P1 @ X0
        err = mvg.dlt_reprojection_error(P0, P1, x0, x1)
        assert abs(err) < 1e-3


def test_dlt_post_conditions(rng):
    for _ in range(NTESTCASES):
        P0 = rng.standard_normal((3, 4))
        P1 = rng.standard_normal((3, 4))
        X0 = rng.standard_normal(4)
        x0 = P0 @ X0
        x1 = P1 @ X0
        X = mvg.dlt_triangulate(P0, P1, x0, x1).ravel()
        X = X / X[3]
        X0 = X0 / X0[3]
        assert np.allclose(X, X0)
        rx0 = P0 @ X
        rx1 = P1 @ X
        assert np.allclose(np.cross(rx0, x0), np.zeros(3))
        assert np.allclose(np.cross(rx1, x1), np.zeros(3))


def test_seven_point_algorithm_conditions(rng):
    for _ in range(NTESTCASES):
        x0 = rng.standard_normal((7, 3))
        x1 = rng.standard_normal((7, 3))
        FF = mvg.seven_point_algorithm(x0, x1)
        assert FF.shape[0] % 3 == 0
        nF = FF.shape[0] // 3
        assert nF >= 1
        for i in range(nF):
            F = FF[3 * i : 3 * (i + 1)]
            xpTFx = np.sum((x1 @ F) * x0, axis=1)
            assert np.max(np.abs(xpTFx)) < 1e-10


def test_seven_point_algorithm_reconstruction(rng):
    for _ in range(NTESTCASES):
        P0 = np.hstack((np.eye(3), np.zeros((3, 1))))
        P1 = rng.standard_normal((3, 4))
        e = P1.T[-1]
        invP0 = P0.T @ np.linalg.inv(P0 @ P0.T)
        F0 = skew(e) @ P1 @ invP0
        X = rng.standard_normal((7, 4))
        x0 = X @ P0.T
        x1 = X @ P1.T
        FF = mvg.seven_point_algorithm(x0, x1)
        assert FF.shape[0] % 3 == 0
        nF = FF.shape[0] // 3
        assert any(
            np.std(FF[3 * i : 3 * (i + 1)] / F0) < 1e-8 for i in range(nF)
        )


def _simulated_two_view(rng, npt=200):
    C0 = (rng.standard_normal(3) + 1.0) * 50.0
    C1 = (rng.standard_normal(3) - 1.0) * 50.0

    def rot(a, b):
        v = np.cross(a, b)
        sk = skew(v)
        return np.eye(3) + sk + sk @ sk * 1.0 / (1 + np.dot(a, b))

    def normalize(x):
        return x / np.linalg.norm(x)

    canon = np.asarray([1.0, 0.0, 0.0])
    R0 = rot(canon, normalize(-C0))
    R1 = rot(canon, normalize(-C1))
    P0 = np.hstack((R0, (R0 @ -C0).reshape(-1, 1)))
    P1 = np.hstack((R1, (R1 @ -C1).reshape(-1, 1)))
    X = np.hstack((rng.standard_normal((npt, 3)), np.ones((npt, 1))))
    x0 = X @ P0.T
    x1 = X @ P1.T
    e = P1 @ np.hstack((C0, (1.0,)))
    invP0 = P0.T @ np.linalg.inv(P0 @ P0.T)
    E = skew(e) @ P1 @ invP0
    return x0, x1, E


def test_ransac_essential_reconstruction(rng):
    x0, x1, E = _simulated_two_view(rng)
    options = {
        "required_percent_inliers": 0.9,
        "reprojection_error_allowed": 0.5,
        "maximum_tries": 200,
        "find_best_even_in_failure": False,
        "singular_value_ratio_allowed": 3e-2,
        "progressbar": False,
    }
    ransac = mvg.ransac_fitter(x0, x1, options=options)
    assert ransac["success"]
    rE = ransac["essential"]
    _, s, _ = np.linalg.svd(rE)
    rE = rE / s[0]
    _, s, _ = np.linalg.svd(E)
    E = E / s[0]
    # sign-insensitive comparison (E is defined up to scale)
    err = min(np.std(rE / E), np.std(-rE / E))
    assert err < 1e-2


def test_ransac_inlier_idx_consistency(rng):
    x0, x1, _ = _simulated_two_view(rng)
    ransac = mvg.ransac_fitter(x0, x1)
    assert ransac["inlier_percent"] >= 0.9
    idx = ransac["inlier_idx"]
    assert len(idx) == round(ransac["inlier_percent"] * x0.shape[0])
    P0 = np.hstack((np.eye(3), np.zeros((3, 1))))
    err = mvg.dlt_reprojection_error(P0, ransac["camera"], x0[idx], x1[idx])
    assert np.all(err <= 0.5)


def test_essential_to_cameras_shapes(rng):
    E = rng.standard_normal((5, 3, 3))
    P = np.asarray(mvg.essential_to_cameras(E))
    assert P.shape == (5, 4, 3, 4)
    # rotations are orthonormal with |det| == 1
    R = P[..., :3]
    RtR = np.einsum("...ij,...ik->...jk", R, R)
    assert np.allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-8)


def test_fundamental_epipolar_constraint(rng):
    P0 = np.hstack((np.eye(3), np.zeros((3, 1))))
    P1 = rng.standard_normal((3, 4))
    F = np.asarray(mvg.fundamental_from_cameras(P0, P1))
    X = np.hstack((rng.standard_normal((50, 3)), np.ones((50, 1))))
    x0 = X @ P0.T
    x1 = X @ P1.T
    resid = np.sum((x1 @ F) * x0, axis=1)
    assert np.max(np.abs(resid)) < 1e-8


def test_ransac_input_validation():
    with pytest.raises(ValueError):
        mvg.ransac_fitter(np.zeros((5, 3)), np.zeros((5, 3)))
    with pytest.raises(ValueError):
        mvg.ransac_fitter(np.zeros((12, 3)), np.zeros((11, 3)))


def test_sampson_prescreen_ranking_fidelity(rng):
    """The Sampson prescreen (`_sampson_counts`, round-4 38x scoring
    speedup) only RANKS hypotheses; `_score_hypotheses` remains the
    reference-criterion oracle.  On a simulated two-view problem the
    prescreen must (a) agree exactly on the SVR/validity gate and
    (b) place the oracle's best hypothesis inside the top-16 seed
    shortlist that the LO polish re-scores."""
    import jax
    import jax.numpy as jnp

    from spectavi_tpu.mvg.ransac import (
        _sample_subsets,
        _sampson_counts,
        _score_hypotheses,
    )
    from spectavi_tpu.mvg.sevenpoint import seven_point

    x0h, x1h, _ = _simulated_two_view(rng)
    x0 = jnp.asarray(x0h[:, :2] / x0h[:, 2:3], jnp.float32)
    x1 = jnp.asarray(x1h[:, :2] / x1h[:, 2:3], jnp.float32)
    N = x0.shape[0]
    pm = jnp.ones(N, bool)
    for seed in range(3):
        sample = _sample_subsets(jax.random.PRNGKey(seed), N, 512, pm)
        F, valid = seven_point(x0[sample], x1[sample], nullspace="mgs")
        cs, gate = _sampson_counts(F, valid, x0, x1, pm, 0.5, 3e-2)
        cf = np.asarray(
            _score_hypotheses(F, valid, x0, x1, pm, 0.5, 3e-2)
        ).reshape(-1)
        gated = np.asarray(jnp.where(gate, cs, -1)).reshape(-1)
        # (a) identical gates
        assert ((gated >= 0) == (cf >= 0)).all()
        # (b) oracle argmax inside the Sampson top-16
        best_full = int(np.argmax(cf))
        top16 = set(np.argsort(-gated)[:16].tolist())
        assert best_full in top16, (seed, best_full, cf[best_full])
