"""End-to-end multi-view SfM driver test on tiny rendered views.

Exercises ``pipeline/sfm.py::run_sfm`` (SIFT -> pairwise RANSAC ->
tracks -> pose chaining -> N-view triangulation -> BA -> outputs ->
checkpoint/resume) on a 3-view rendered heightfield with known
ground-truth cameras — the same renderer as
``benchmarks/bench_multiview_synthetic.py`` at test scale.
"""

import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))


def _tiny_dataset(tmp_path, rng, nviews=3, H=120, W=160):
    from PIL import Image

    import bench_multiview_synthetic as mv

    # corner-rich smoothed-noise texture (no external data dependency)
    tex = rng.random((160, 220))
    for _ in range(2):
        tex = (
            tex
            + np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
            + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
        ) / 5.0
    tex = (tex - tex.min()) / max(float(np.ptp(tex)), 1e-9)
    Ht, Wt = tex.shape
    aspect = Wt / Ht

    centers = rng.uniform(-0.6, 0.6, size=(5, 2)) * [aspect, 1.0]
    amps = rng.uniform(0.3, 0.5, size=5) * rng.choice([-1, 1], 5)
    widths = rng.uniform(0.35, 0.7, size=5)

    def height(x, y):
        h = 0.1 * (x * x + y * y)
        for (cx, cy), a, w in zip(centers, amps, widths):
            h = h + a * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * w * w))
        return h

    def texture_at(x, y):
        u = np.clip((x / aspect * 0.5 + 0.5) * (Wt - 1), 0, Wt - 1.001)
        v = np.clip((y * 0.5 + 0.5) * (Ht - 1), 0, Ht - 1.001)
        u0, v0 = u.astype(int), v.astype(int)
        fu, fv = u - u0, v - v0
        return (
            tex[v0, u0] * (1 - fu) * (1 - fv)
            + tex[v0, u0 + 1] * fu * (1 - fv)
            + tex[v0 + 1, u0] * (1 - fu) * fv
            + tex[v0 + 1, u0 + 1] * fu * fv
        )

    f = 1.1 * W
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    np.savetxt(tmp_path / "K.txt", K)
    target = np.array([0.0, 0.0, 4.0])
    paths, gt_C = [], []
    for i in range(nviews):
        s = i / (nviews - 1) - 0.5
        C = np.array([1.4 * s, 0.2 * s, 0.3 * abs(s)])
        R, t = mv.look_at(C, target)
        im = mv.render(height, texture_at, K, R, t, H, W)
        p = str(tmp_path / f"v{i}.png")
        Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(p)
        paths.append(p)
        gt_C.append(C)
    return paths, str(tmp_path / "K.txt"), np.asarray(gt_C)


def test_run_sfm_end_to_end_with_checkpoint(tmp_path, rng):
    import jax

    from spectavi_tpu.pipeline.sfm import run_sfm
    from spectavi_tpu.sfm.ate import ate_rmse, camera_centers

    paths, kfile, gt_C = _tiny_dataset(tmp_path, rng)
    ckpt = str(tmp_path / "state.npz")
    out = str(tmp_path / "out")
    res = run_sfm(
        paths,
        kfile,
        outdir=out,
        key=jax.random.PRNGKey(0),
        quiet=True,
        checkpoint=ckpt,
        ransac_options={"reprojection_error_allowed": 3e-3},
    )
    assert res["cams"].shape[0] == 3
    assert res["points"].shape[0] > 30
    assert np.isfinite(res["points"]).all()
    assert os.path.exists(os.path.join(out, "sparse_cloud.ply"))
    assert os.path.exists(os.path.join(out, "poses.txt"))
    assert os.path.exists(ckpt)

    # machine-readable per-run metrics (round-2 verdict §5.5): every
    # run must record what stdout used to merely print
    import json

    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["n_views"] == 3
    assert len(m["keypoints_per_view"]) == 3
    assert all(k > 0 for k in m["keypoints_per_view"])
    assert m["n_tracks"] == res["points"].shape[0]
    assert m["ba_iters_per_second"] > 0
    assert m["ba_cost_final"] <= m["ba_cost_initial"]
    assert all(p["matches"] >= 10 for p in m["pairs"])
    assert m["init_used"] in ("pnp", "chain-fallback")
    for sec in ("sift_seconds", "pairs_seconds", "graph_seconds", "ba_seconds"):
        assert m[sec] > 0

    # recovered trajectory within 10% of span of the ground truth
    est_C = camera_centers(res["cams"])
    span = np.ptp(gt_C, axis=0).max()
    assert ate_rmse(est_C, gt_C) < 0.10 * span

    # resume from the checkpoint: BA warm-start, consistent outputs
    res2 = run_sfm(
        paths,
        kfile,
        key=jax.random.PRNGKey(0),
        quiet=True,
        checkpoint=ckpt,
        ransac_options={"reprojection_error_allowed": 3e-3},
    )
    assert res2["points"].shape == res["points"].shape
    est_C2 = camera_centers(res2["cams"])
    assert ate_rmse(est_C2, est_C) < 0.02 * span


def test_run_sfm_batched_pair_backend(tmp_path, rng):
    """pair_backend='batched' routes ALL pairs through the masked
    multi-chip two-view step in one dispatch (round-2 verdict item 7)
    and must reconstruct the same scene the loop backend does."""
    import jax

    from spectavi_tpu.pipeline.sfm import run_sfm
    from spectavi_tpu.sfm.ate import ate_rmse, camera_centers

    paths, kfile, gt_C = _tiny_dataset(tmp_path, rng)
    res = run_sfm(
        paths,
        kfile,
        key=jax.random.PRNGKey(0),
        quiet=True,
        pair_backend="batched",
        ransac_options={"reprojection_error_allowed": 3e-3},
    )
    assert res["metrics"]["pair_backend"] == "batched"
    assert res["points"].shape[0] > 30
    assert np.isfinite(res["points"]).all()
    assert all(p["matches"] >= 10 for p in res["metrics"]["pairs"])
    est_C = camera_centers(res["cams"])
    span = np.ptp(gt_C, axis=0).max()
    assert ate_rmse(est_C, gt_C) < 0.10 * span


def test_pair_backends_success_semantics_agree(tmp_path, rng):
    """Both pair backends must report the reference's statistical
    ``success`` semantics (``src/RansacFitter.h:75-76``): success iff
    the pair's inlier fraction clears ``required_percent_inliers``.
    Round 3 shipped a degenerate batched flag (``count >= 0`` — true
    for any non-gated model); this pins the repaired agreement."""
    import jax

    from spectavi_tpu.pipeline.sfm import run_sfm

    paths, kfile, _ = _tiny_dataset(tmp_path, rng)
    # note 1.01: the rendered scene is clean enough for 100% consensus,
    # so only an unreachable threshold forces the failure branch
    for required, expect in ((0.05, True), (1.01, False)):
        recs = {}
        for backend in ("loop", "batched"):
            res = run_sfm(
                paths,
                kfile,
                key=jax.random.PRNGKey(0),
                quiet=True,
                pair_backend=backend,
                ransac_options={
                    "reprojection_error_allowed": 3e-3,
                    "required_percent_inliers": required,
                },
            )
            recs[backend] = res["metrics"]["pairs"]
            for p in res["metrics"]["pairs"]:
                if p.get("skipped"):
                    continue
                # the flag must BE the statistical rule, per pair
                assert p["success"] == (
                    p["inlier_percent"] >= required
                ), (backend, required, p)
                # and at these extreme thresholds the outcome is forced
                assert p["success"] == expect, (backend, required, p)


def test_run_two_view_writes_metrics(tmp_path, rng):
    """The two-view pipeline must drop a machine-readable metrics.json
    next to its outputs (round-2 verdict §5.5)."""
    import json

    import jax

    from spectavi_tpu.pipeline.two_view import run_two_view

    paths, kfile, _ = _tiny_dataset(tmp_path, rng, nviews=2)
    out = str(tmp_path / "tv_out")
    res = run_two_view(
        paths,
        kfile,
        outdir=out,
        matching_method="l2-mxu",
        ransac_quality="low",
        ransac_options={"reprojection_error_allowed": 3e-3},
        rsf=0.5,
        key=jax.random.PRNGKey(0),
        quiet=True,
    )
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["keypoints"][0] > 0 and m["keypoints"][1] > 0
    assert m["n_matches"] == res["matches"][0].shape[0]
    assert 0.0 <= m["consensus"] <= 1.0
    assert m["n_points"] == res["points"].shape[0]
    for s in ("step1", "step2", "step3", "step4", "step5"):
        assert m[f"{s}_seconds"] > 0
    assert m["total_seconds"] >= m["step3_seconds"]
