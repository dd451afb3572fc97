"""Multi-view incremental SfM pipeline.

The "full incremental SfM" configuration (BASELINE.json configs[3..4]):
SIFT on every image, pairwise matching (sequential or exhaustive),
per-pair RANSAC relative poses, track building, pose chaining, N-view
triangulation, and distributed-ready bundle adjustment — ending in a
refined sparse cloud + camera trajectory.

The reference stops at a single two-view reconstruction; this module is
the multi-view extension the north star asks for.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from spectavi_tpu import mvg
from spectavi_tpu.features import (
    normalize_to_ubyte_and_multiple_16_dim,
    sift_filter_batch,
)
from spectavi_tpu.pipeline.io import Timer, imread, write_ply
from spectavi_tpu.sfm import (
    build_tracks,
    bundle_adjust,
    chain_poses,
    rodrigues,
    tracks_to_observations,
    triangulate_nview,
)


def match_pair(kp_a, kp_b, min_ratio=1.75):
    """Ratio-test matching between two keypoint tables (n, 132)."""
    from spectavi_tpu.match import nn_l2k2

    a = normalize_to_ubyte_and_multiple_16_dim(kp_a[:, 4:])
    b = normalize_to_ubyte_and_multiple_16_dim(kp_b[:, 4:])
    idx, dist = nn_l2k2((a + 128).astype("uint8"), (b + 128).astype("uint8"))
    ratio = np.sqrt(dist[:, 1].astype("float64")) / np.maximum(
        np.sqrt(dist[:, 0].astype("float64")), 1e-12
    )
    keep = ratio >= min_ratio
    return idx[keep, 0].astype(np.int64), np.where(keep)[0].astype(np.int64)


def run_sfm(
    image_paths,
    K_path,
    outdir=None,
    pairs="sequential",
    min_ratio=1.75,
    ransac_options=None,
    ba_iters=15,
    key=None,
    quiet=False,
    checkpoint=None,
    init="pnp",
    loss="huber",
):
    """Run incremental SfM over a list of images.

    ``init`` selects the pose initializer: ``"pnp"`` (default)
    registers each view by RANSAC-PnP against triangulated tracks with
    periodic local BA (:func:`spectavi_tpu.sfm.incremental_poses` —
    bounded drift on long chains), ``"chain"`` keeps the BFS
    depth-ratio chaining.  ``loss`` is forwarded to the final bundle
    adjustment (default Huber: one bad surviving track must not poison
    the solution).

    Returns dict with ``cams (V, 6)``, ``points (T, 3)``, ``tracks``,
    ``keypoints``, ``metrics`` and writes ``sparse_cloud.ply`` +
    ``poses.txt`` + ``metrics.json`` when ``outdir`` is given.
    """
    V = len(image_paths)
    K = np.loadtxt(K_path)
    iK = np.linalg.inv(K)
    if key is None:
        key = jax.random.PRNGKey(0)
    metrics = {"n_views": V, "pairs_mode": str(pairs), "init": init,
               "loss": loss}

    with Timer("sfm-sift", quiet) as t_sift:
        ims = [imread(p, dtype="float32", force_grayscale=True) for p in image_paths]
        kps = sift_filter_batch(ims)
    metrics["sift_seconds"] = t_sift.elapsed
    metrics["keypoints_per_view"] = [int(kp.shape[0]) for kp in kps]
    if not quiet:
        for i, kp in enumerate(kps):
            print(f"  view {i}: {kp.shape[0]} keypoints")

    # calibrated euclidean keypoint coordinates per view
    pts_cal = []
    for kp in kps:
        h = np.hstack([kp[:, :2], np.ones((kp.shape[0], 1))]) @ iK.T
        pts_cal.append(h[:, :2] / h[:, 2:3])

    if pairs == "sequential":
        pair_list = [(i, i + 1) for i in range(V - 1)]
    elif pairs == "exhaustive":
        pair_list = [(i, j) for i in range(V) for j in range(i + 1, V)]
    else:
        pair_list = list(pairs)

    ropts = {
        "required_percent_inliers": 0.5,
        "reprojection_error_allowed": 3.35e-4,
        "maximum_tries": 100000,
        "find_best_even_in_failure": True,
        "singular_value_ratio_allowed": 1e-3,
    }
    if ransac_options:
        ropts.update(ransac_options)

    edges = {}
    pair_matches = {}
    metrics["pairs"] = []
    with Timer("sfm-pairs", quiet) as t_pairs:
        for (i, j) in pair_list:
            mi, mj = match_pair(kps[i], kps[j], min_ratio)
            if len(mi) < 10:
                if not quiet:
                    print(f"  pair ({i},{j}): only {len(mi)} matches, skipped")
                metrics["pairs"].append(
                    {"pair": [i, j], "matches": int(len(mi)), "skipped": True}
                )
                continue
            key, sub = jax.random.split(key)
            x0 = np.hstack([pts_cal[i][mi], np.ones((len(mi), 1))])
            x1 = np.hstack([pts_cal[j][mj], np.ones((len(mj), 1))])
            res = mvg.ransac_fitter(x0, x1, options=ropts, key=sub)
            inl = res["inlier_idx"]
            metrics["pairs"].append(
                {
                    "pair": [i, j],
                    "matches": int(len(mi)),
                    "inlier_percent": float(res["inlier_percent"]),
                    "n_inliers": int(len(inl)),
                    "success": bool(res["success"]),
                }
            )
            if not quiet:
                print(
                    f"  pair ({i},{j}): {len(mi)} matches, "
                    f"{res['inlier_percent']:.2f} inliers, success={res['success']}"
                )
            if len(inl) < 8:
                continue
            edges[(i, j)] = {
                "R": res["camera"][:, :3],
                "t": res["camera"][:, 3],
                "idx_i": mi[inl],
                "idx_j": mj[inl],
            }
            pair_matches[(i, j)] = (mi[inl], mj[inl])

    if not edges:
        raise RuntimeError("no usable image pairs")
    metrics["pairs_seconds"] = t_pairs.elapsed
    metrics["pairs_per_second"] = (
        len(pair_list) / t_pairs.elapsed if t_pairs.elapsed else None
    )

    with Timer("sfm-graph", quiet) as t_graph:
        tracks = build_tracks(pair_matches, V)
        init_used = init
        if init == "pnp":
            from spectavi_tpu.sfm import incremental_poses

            try:
                cams0, _ = incremental_poses(
                    edges, V, pts_cal, tracks,
                    reproj_thresh=3.0 * ropts["reprojection_error_allowed"],
                    key=key,
                )
            except (RuntimeError, ValueError) as e:
                if not quiet:
                    print(f"  pnp init failed ({e}); falling back to chaining")
                cams0 = chain_poses(edges, V, pts_cal)
                init_used = "chain-fallback"
        else:
            cams0 = chain_poses(edges, V, pts_cal)
        metrics["init_used"] = init_used
        ci, pi, uv = tracks_to_observations(tracks, pts_cal)
        P = np.concatenate(
            [
                np.asarray(rodrigues(jnp.asarray(cams0[:, :3]))),
                cams0[:, 3:, None],
            ],
            axis=2,
        )
        mask = tracks != -1
        T = tracks.shape[0]
        uv_tab = np.zeros((T, V, 2))
        for t in range(T):
            for v in range(V):
                if tracks[t, v] != -1:
                    uv_tab[t, v] = pts_cal[v][tracks[t, v]]
        X0 = np.asarray(
            triangulate_nview(jnp.asarray(P), jnp.asarray(uv_tab), jnp.asarray(mask))
        )
        X0 = X0[:, :3] / np.where(np.abs(X0[:, 3:]) > 1e-12, X0[:, 3:], 1e-12)

    if checkpoint is not None:
        from spectavi_tpu.sfm.checkpoint import load_sfm_state

        state = load_sfm_state(checkpoint)
        if state is not None:
            c_ck, p_ck, t_ck, _ = state
            if t_ck.shape == tracks.shape and np.array_equal(t_ck, tracks):
                if not quiet:
                    print(f"  resuming BA from checkpoint {checkpoint}")
                cams0, X0 = c_ck, p_ck

    metrics["graph_seconds"] = t_graph.elapsed
    metrics["n_tracks"] = int(tracks.shape[0])
    metrics["n_observations"] = int(len(ci))

    with Timer("sfm-ba", quiet) as t_ba:
        cams_ba, pts_ba, hist = bundle_adjust(
            cams0, X0, ci, pi, uv, fixed_cameras=(0,), max_iters=ba_iters,
            loss=loss,
        )
    metrics["ba_seconds"] = t_ba.elapsed
    metrics["ba_accepted_iters"] = len(hist) - 1
    metrics["ba_iters_per_second"] = (
        (len(hist) - 1) / t_ba.elapsed if t_ba.elapsed else None
    )
    metrics["ba_cost_initial"] = float(hist[0])
    metrics["ba_cost_final"] = float(hist[-1])
    if checkpoint is not None:
        from spectavi_tpu.sfm.checkpoint import save_sfm_state

        save_sfm_state(checkpoint, cams_ba, pts_ba, tracks)
    if not quiet:
        print(f"  tracks: {T}, BA cost {hist[0]:.3e} -> {hist[-1]:.3e}")

    if outdir is not None:
        from spectavi_tpu.pipeline.io import write_metrics

        os.makedirs(outdir, exist_ok=True)
        write_ply(os.path.join(outdir, "sparse_cloud.ply"), pts_ba)
        np.savetxt(os.path.join(outdir, "poses.txt"), cams_ba)
        write_metrics(os.path.join(outdir, "metrics.json"), metrics)
    return {
        "cams": cams_ba,
        "points": pts_ba,
        "tracks": tracks,
        "keypoints": kps,
        "ba_history": hist,
        "metrics": metrics,
    }
