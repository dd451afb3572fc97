"""Pose-graph + end-to-end synthetic multi-view SfM tests."""

import numpy as np
import jax
import jax.numpy as jnp

from spectavi_tpu import mvg
from spectavi_tpu.sfm import (
    ate_rmse,
    build_tracks,
    bundle_adjust,
    camera_centers,
    chain_poses,
    rodrigues,
    rotation_to_rvec,
    tracks_to_observations,
    triangulate_nview,
)


def _ring_scene(rng, V=4, M=120):
    """V cameras on an arc, M points around the origin; returns poses,
    points, and per-view keypoints (all points visible everywhere)."""
    cams = []
    for i in range(V):
        ang = 0.3 * i
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        C = np.array([4.0 * np.sin(ang), 0.2 * i, -10.0 + 0.4 * i])
        t = -R @ C
        cams.append(np.concatenate([rotation_to_rvec(R), t]))
    cams = np.asarray(cams)
    pts = rng.standard_normal((M, 3))
    kps = []
    for i in range(V):
        R = np.asarray(rodrigues(jnp.asarray(cams[i, :3])))
        t = cams[i, 3:]
        Xc = (R @ pts.T).T + t
        kps.append(Xc[:, :2] / Xc[:, 2:3])
    return cams, pts, kps


def test_build_tracks_merges_chains():
    pm = {
        (0, 1): (np.array([0, 1, 2]), np.array([5, 6, 7])),
        (1, 2): (np.array([5, 6]), np.array([9, 10])),
    }
    tracks = build_tracks(pm, 3)
    assert tracks.shape[0] == 3
    full = tracks[(tracks != -1).sum(1) == 3]
    assert len(full) == 2  # chains 0-5-9 and 1-6-10


def test_build_tracks_drops_conflicts():
    pm = {
        (0, 1): (np.array([0, 0]), np.array([5, 6])),  # kp 0 matches two
    }
    tracks = build_tracks(pm, 2)
    assert tracks.shape[0] == 0


def test_triangulate_nview_masked(rng):
    cams, pts, kps = _ring_scene(rng, V=4, M=30)
    from spectavi_tpu.sfm.bundle_adjust import rodrigues as rod

    P = np.concatenate(
        [np.asarray(rod(jnp.asarray(cams[:, :3]))), cams[:, 3:, None]], axis=2
    )
    uv = np.stack(kps, axis=1)  # (M, V, 2)
    mask = np.ones((30, 4), dtype=bool)
    mask[:, 3] = False  # drop one view entirely
    X = np.asarray(triangulate_nview(jnp.asarray(P), jnp.asarray(uv), jnp.asarray(mask)))
    X = X[:, :3] / X[:, 3:]
    assert np.allclose(X, pts, atol=1e-8)


def test_chain_poses_and_ba_full_pipeline(rng):
    """Synthetic multi-view SfM: pairwise RANSAC -> pose chaining ->
    tracks -> N-view triangulation -> BA; camera centres and cloud must
    match ground truth after similarity alignment."""
    V, M = 4, 150
    cams_gt, pts_gt, kps = _ring_scene(rng, V, M)

    # pairwise essential estimation on consecutive pairs
    edges = {}
    pair_matches = {}
    key = jax.random.PRNGKey(11)
    for i in range(V - 1):
        x0 = np.hstack([kps[i], np.ones((M, 1))])
        x1 = np.hstack([kps[i + 1], np.ones((M, 1))])
        key, sub = jax.random.split(key)
        res = mvg.ransac_fitter(
            x0,
            x1,
            options={
                "maximum_tries": 200,
                "reprojection_error_allowed": 1e-6,
                "required_percent_inliers": 0.9,
            },
            key=sub,
        )
        assert res["success"]
        P1 = res["camera"]
        idx = res["inlier_idx"]
        edges[(i, i + 1)] = {
            "R": P1[:, :3],
            "t": P1[:, 3],
            "idx_i": idx,
            "idx_j": idx,
        }
        pair_matches[(i, i + 1)] = (idx, idx)

    cams0 = chain_poses(edges, V, kps)
    tracks = build_tracks(pair_matches, V)
    assert tracks.shape[0] > 0.9 * M

    ci, pi, uv = tracks_to_observations(tracks, kps)
    # initial points: N-view triangulation with chained poses
    P = np.concatenate(
        [
            np.asarray(rodrigues(jnp.asarray(cams0[:, :3]))),
            cams0[:, 3:, None],
        ],
        axis=2,
    )
    uv_tab = np.zeros((tracks.shape[0], V, 2))
    mask = tracks != -1
    for t in range(tracks.shape[0]):
        for v in range(V):
            if tracks[t, v] != -1:
                uv_tab[t, v] = kps[v][tracks[t, v]]
    X0 = np.asarray(
        triangulate_nview(jnp.asarray(P), jnp.asarray(uv_tab), jnp.asarray(mask))
    )
    X0 = X0[:, :3] / X0[:, 3:]

    cams_ba, pts_ba, hist = bundle_adjust(
        cams0, X0, ci, pi, uv, fixed_cameras=(0,), max_iters=20
    )
    assert hist[-1] < 1e-12

    # similarity-aligned errors vs ground truth
    ate_cams = ate_rmse(camera_centers(cams_ba), camera_centers(cams_gt))
    scene_scale = np.linalg.norm(
        camera_centers(cams_gt) - camera_centers(cams_gt).mean(0), axis=1
    ).mean()
    assert ate_cams < 1e-3 * scene_scale
    # point cloud ATE (tracks map 1:1 to gt points via keypoint index)
    gt_pts = pts_gt[tracks[np.arange(len(tracks)), np.argmax(mask, 1)]]
    assert ate_rmse(pts_ba, gt_pts) < 1e-3 * scene_scale


def test_umeyama_recovers_similarity(rng):
    src = rng.standard_normal((50, 3))
    R, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    s, t = 2.7, rng.standard_normal(3)
    dst = (s * (R @ src.T)).T + t
    assert ate_rmse(src, dst) < 1e-10


def test_sfm_checkpoint_roundtrip(tmp_path, rng):
    from spectavi_tpu.sfm import load_sfm_state, save_sfm_state

    cams = rng.standard_normal((4, 6))
    pts = rng.standard_normal((50, 3))
    tracks = rng.integers(-1, 30, size=(50, 4)).astype(np.int32)
    p = str(tmp_path / "state.npz")
    save_sfm_state(p, cams, pts, tracks, extra={"lam": np.asarray(1e-3)})
    out = load_sfm_state(p)
    assert out is not None
    c2, p2, t2, extra = out
    np.testing.assert_array_equal(c2, cams)
    np.testing.assert_array_equal(p2, pts)
    np.testing.assert_array_equal(t2, tracks)
    assert float(extra["lam"]) == 1e-3
    assert load_sfm_state(str(tmp_path / "missing.npz")) is None
