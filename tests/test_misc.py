"""Coverage for smaller branches: cubic solver, batch SIFT API,
homogeneous helpers, ann k>2, pipeline match cache."""

import os
import numpy as np
import jax.numpy as jnp

from spectavi_tpu import match, mvg
from spectavi_tpu.mvg.sevenpoint import solve_cubic


def _roots_of(a, b, c):
    roots, valid = solve_cubic(
        jnp.asarray([a]), jnp.asarray([b]), jnp.asarray([c])
    )
    return np.asarray(roots)[0], np.asarray(valid)[0]


def test_solve_cubic_three_real():
    # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
    roots, valid = _roots_of(-6.0, 11.0, -6.0)
    got = np.sort(roots[valid])
    assert valid.sum() == 3
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-10)


def test_solve_cubic_one_real():
    # x^3 + x + 1: one real root
    roots, valid = _roots_of(0.0, 1.0, 1.0)
    real = roots[valid]
    assert valid.sum() == 1
    x = real[0]
    assert abs(x**3 + x + 1) < 1e-10


def test_solve_cubic_double_root():
    # (x-1)^2 (x+2) = x^3 - 3x + 2 -> double root at 1, single at -2
    roots, valid = _roots_of(0.0, -3.0, 2.0)
    got = np.sort(np.unique(np.round(roots[valid], 8)))
    assert np.allclose(sorted(set(np.round(got, 6))), [-2.0, 1.0])
    for x in roots[valid]:
        assert abs(x**3 - 3 * x + 2) < 1e-8


def test_cubic_batched_matches_numpy(rng):
    coeffs = rng.standard_normal((50, 3))
    roots, valid = solve_cubic(
        jnp.asarray(coeffs[:, 0]), jnp.asarray(coeffs[:, 1]), jnp.asarray(coeffs[:, 2])
    )
    roots, valid = np.asarray(roots), np.asarray(valid)
    for i in range(50):
        np_roots = np.roots([1.0, *coeffs[i]])
        np_real = np.sort(np_roots[np.abs(np_roots.imag) < 1e-9].real)
        got = np.sort(roots[i][valid[i]])
        assert len(got) == len(np_real)
        np.testing.assert_allclose(got, np_real, atol=1e-7)


def test_homogeneous_roundtrip(rng):
    x = rng.standard_normal((10, 2))
    h = np.asarray(mvg.homogeneous(jnp.asarray(x)))
    assert h.shape == (10, 3)
    back = np.asarray(mvg.hnormalize(jnp.asarray(h)))
    np.testing.assert_allclose(back, x)


def test_ann_k_greater_2(rng):
    x = rng.standard_normal((300, 32)).astype("float32")
    y = rng.standard_normal((100, 32)).astype("float32")
    nni = match.ann(x, y, k=5, shard_size=100)
    d = ((x[None] - y[:, None]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :5]
    assert np.array_equal(nni.astype(np.int64), gt)


def test_sift_batch_returns_list():
    from spectavi_tpu.features import sift_filter_batch

    im = np.load("/root/reference/data/sift-test/sur-ogre.npz")["im"].astype(
        "float32"
    )
    out = sift_filter_batch([im[:128, :160], im[:128, :160]])
    assert isinstance(out, list) and len(out) == 2
    np.testing.assert_array_equal(out[0], out[1])  # deterministic


def test_two_view_match_cache(tmp_path, rng):
    """cache=True writes cache.npz and a second run resumes from it."""
    import os

    from spectavi_tpu.pipeline.two_view import run_two_view
    from PIL import Image

    # tiny synthetic image pair (shifted texture)
    base = (rng.random((96, 128)) * 255).astype(np.uint8)
    im0 = base
    im1 = np.roll(base, 3, axis=1)
    p0 = str(tmp_path / "a.png")
    p1 = str(tmp_path / "b.png")
    Image.fromarray(im0).save(p0)
    Image.fromarray(im1).save(p1)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    kp = str(tmp_path / "K.txt")
    np.savetxt(kp, K)
    outdir = str(tmp_path / "out")
    opts = dict(
        matching_method="l2-mxu",
        cache=True,
        quiet=True,
        ransac_options={
            "maximum_tries": 200,
            "required_percent_inliers": 0.2,
            "reprojection_error_allowed": 0.1,
            "find_best_even_in_failure": True,
        },
    )
    result = run_two_view([p0, p1], kp, outdir=outdir, **opts)
    assert result["points"].shape[1] == 4
    assert np.isfinite(result["ransac"]["essential"]).all()
    assert os.path.exists(os.path.join(outdir, "cache.npz"))
    data = np.load(os.path.join(outdir, "cache.npz"))
    assert "xd" in data and "yd" in data
    # second run resumes from the cache (no SIFT/matching) and agrees
    result2 = run_two_view([p0, p1], kp, outdir=outdir, **opts)
    np.testing.assert_allclose(
        result2["ransac"]["essential"], result["ransac"]["essential"]
    )


def test_step4_ba_polish(rng):
    """Two-view BA polish reduces reprojection error of the cloud."""
    from spectavi_tpu.pipeline.two_view import step4_triangulate

    # simulated calibrated two-view scene with small observation noise
    a = 0.2
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    C = np.array([1.0, 0.1, -0.3])
    P1 = np.hstack([R, (-R @ C)[:, None]])
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    X = rng.standard_normal((100, 3)) * np.array([1, 1, 0.4]) + np.array([0, 0, 6.0])
    Xh = np.hstack([X, np.ones((100, 1))])
    x0 = Xh @ P0.T
    x1 = Xh @ P1.T
    x0[:, :2] += rng.normal(0, 2e-3, (100, 2)) * x0[:, 2:3]
    x1[:, :2] += rng.normal(0, 2e-3, (100, 2)) * x1[:, 2:3]
    ransac = {
        "inlier_idx": np.arange(100, dtype=np.int32),
        "camera": P1,
        "success": True,
        "inlier_percent": 1.0,
        "essential": np.eye(3),
    }
    step3_out = (ransac, x0, x1, None, None)
    RX_plain, _ = step4_triangulate(step3_out, quiet=True)
    RX_ba, ransac_ba = step4_triangulate(step3_out, quiet=True, ba=True)

    def total_reproj(P1x, RXx):
        err = mvg.dlt_reprojection_error(
            np.hstack([np.eye(3), np.zeros((3, 1))]), P1x, x0, x1
        )
        # measure against the returned cloud directly instead
        rp0 = RXx @ np.hstack([np.eye(3), np.zeros((3, 1))]).T
        rp1 = RXx @ P1x.T
        e0 = np.linalg.norm(rp0[:, :2] / rp0[:, 2:3] - x0[:, :2] / x0[:, 2:3], axis=1)
        e1 = np.linalg.norm(rp1[:, :2] / rp1[:, 2:3] - x1[:, :2] / x1[:, 2:3], axis=1)
        return (e0 + e1).sum()

    plain = total_reproj(P1, RX_plain)
    polished = total_reproj(ransac_ba["camera"], RX_ba)
    assert polished <= plain * 1.0001
    assert np.isfinite(RX_ba).all()


def test_profiler_trace_writes_profile(tmp_path):
    """The observability harness (utils/profiling.trace) must produce a
    TensorBoard-readable profile for a traced device computation."""
    import glob

    import jax.numpy as jnp

    from spectavi_tpu.utils.profiling import annotate, trace

    logdir = str(tmp_path / "prof")
    with trace(logdir):
        with annotate("tiny-matmul"):
            x = jnp.ones((64, 64))
            float((x @ x).sum())
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no profile written under {logdir}"
