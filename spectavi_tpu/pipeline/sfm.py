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


def _match_pair_loop(kps, pts_cal, i, j, key, ropts, min_ratio, quiet):
    """One pair through the host-side path: ratio-test matching +
    confidence-looped RANSAC (``mvg.ransac_fitter``).  Returns
    ``(record, edge_or_None)``."""
    mi, mj = match_pair(kps[i], kps[j], min_ratio)
    if len(mi) < 10:
        if not quiet:
            print(f"  pair ({i},{j}): only {len(mi)} matches, skipped")
        return {"pair": [i, j], "matches": int(len(mi)), "skipped": True}, None
    x0 = np.hstack([pts_cal[i][mi], np.ones((len(mi), 1))])
    x1 = np.hstack([pts_cal[j][mj], np.ones((len(mj), 1))])
    res = mvg.ransac_fitter(x0, x1, options=ropts, key=key)
    inl = res["inlier_idx"]
    rec = {
        "pair": [i, j],
        "matches": int(len(mi)),
        "inlier_percent": float(res["inlier_percent"]),
        "n_inliers": int(len(inl)),
        "success": bool(res["success"]),
    }
    if not quiet:
        print(
            f"  pair ({i},{j}): {len(mi)} matches, "
            f"{res['inlier_percent']:.2f} inliers, success={res['success']}"
        )
    if len(inl) < 8:
        return rec, None
    edge = {
        "R": res["camera"][:, :3],
        "t": res["camera"][:, 3],
        "idx_i": mi[inl],
        "idx_j": mj[inl],
    }
    return rec, edge


def _match_pairs_batched(descs, pts_cal, pair_list, key, ropts, min_ratio,
                         trials=8192, pad_to=256, compact_to=4096):
    """Run ALL pairs' matching + RANSAC in one device dispatch.

    Routes the pair batch through
    :func:`spectavi_tpu.parallel.two_view.make_two_view_step`
    (``masked`` variant) on a single-device ``(1, 1)`` mesh: per-pair
    keypoint tables are padded to a common static shape (database rows
    replicate the pair's own row 0, so a padding hit can only
    conservatively fail the ratio test, never fabricate a match) and
    the whole batch executes as one jitted program — amortizing the
    per-call dispatch/pull overhead that dominates the host-side loop
    on a high-latency link.

    ``descs``: per-view quantized uint8 descriptor tables — numpy
    (host path) or DEVICE arrays (device-resident SIFT: the padded
    batch is then assembled on device and the multi-megabyte
    descriptor upload disappears).

    Returns the same per-pair result dicts the loop path produces.
    """
    from spectavi_tpu.parallel.mesh import make_mesh
    from spectavi_tpu.parallel.two_view import make_two_view_step

    B = len(pair_list)
    on_device = isinstance(descs[0], jnp.ndarray) and not isinstance(
        descs[0], np.ndarray
    )
    coords = [pc.astype(np.float32) for pc in pts_cal]

    # a view with zero keypoints cannot seed the replicate-row padding
    # (descs[i][0] would raise); such pairs are unreconstructable — skip
    # them up front, mirroring the loop path's <10-matches skip
    empty = [
        (i, j) for (i, j) in pair_list
        if descs[i].shape[0] == 0 or descs[j].shape[0] == 0
    ]
    if empty:
        skipped = [
            {"pair": (i, j), "n_matches": 0, "skipped": True}
            for (i, j) in empty
        ]
        pair_list = [p for p in pair_list if p not in set(empty)]
        if not pair_list:
            return skipped
        B = len(pair_list)
    else:
        skipped = []

    def ceil_to(n, m):
        return ((n + m - 1) // m) * m

    X = max(ceil_to(max(descs[i].shape[0] for i, _ in pair_list), pad_to), pad_to)
    Y = max(ceil_to(max(descs[j].shape[0] for _, j in pair_list), pad_to), pad_to)
    D = descs[0].shape[1]
    p0 = np.zeros((B, X, 2), np.float32)
    p1 = np.zeros((B, Y, 2), np.float32)
    nx = np.zeros(B, np.int32)
    ny = np.zeros(B, np.int32)
    for b, (i, j) in enumerate(pair_list):
        nx[b], ny[b] = descs[i].shape[0], descs[j].shape[0]
        p0[b, : nx[b]] = coords[i]
        p1[b, : ny[b]] = coords[j]

    def pad_rows(d, rows, replicate):
        n = d.shape[0]
        if on_device:
            fill = (
                jnp.broadcast_to(d[0], (rows - n, D))
                if replicate
                else jnp.zeros((rows - n, D), d.dtype)
            )
            return jnp.concatenate([d, fill], axis=0)
        out = np.zeros((rows, D), np.uint8)
        out[:n] = d
        if replicate:
            out[n:] = d[0]
        return out

    stack = jnp.stack if on_device else np.stack
    # database rows replicate, never zero-pad (see doc); query padding
    # rows are masked by ny
    d0 = stack([pad_rows(descs[i], X, True) for i, _ in pair_list])
    d1 = stack([pad_rows(descs[j], Y, False) for _, j in pair_list])

    mesh = make_mesh(n_pairs=1, n_blocks=1, devices=jax.devices()[:1])
    step = make_two_view_step(
        mesh,
        trials=trials,
        reproj_allowed=ropts["reprojection_error_allowed"],
        svr_allowed=ropts["singular_value_ratio_allowed"],
        min_ratio=min_ratio,
        masked=True,
        compact_to=compact_to,
    )
    keys = jax.random.split(key, B)
    E, P1, count, inl_mask, midx0, ratio_ok = step(
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(p0), jnp.asarray(p1),
        keys, jnp.asarray(nx), jnp.asarray(ny),
    )
    # one staged pull for all six outputs (serial np.asarray paid a
    # tunnel round trip each)
    E, P1, count, inl_mask, midx0, ratio_ok = jax.device_get(
        (E, P1, count, inl_mask, midx0, ratio_ok)
    )

    results = []
    for b, (i, j) in enumerate(pair_list):
        n_match = int(ratio_ok[b, : ny[b]].sum())
        # survivors beyond the on-device compaction bucket never
        # competed in RANSAC and can't appear in the mask — the
        # consensus denominator is the competitor count, matching the
        # loop path exactly whenever no cap engaged
        n_competed = min(n_match, compact_to)
        inl_j = np.where(inl_mask[b, : ny[b]])[0].astype(np.int64)
        inl_i = midx0[b, inl_j].astype(np.int64)
        results.append({
            "pair": (i, j),
            "n_matches": n_match,
            "camera": P1[b],
            "essential": E[b],
            "count": int(count[b]),
            "idx_i": inl_i,
            "idx_j": inl_j,
            "inlier_percent": (len(inl_j) / n_competed) if n_competed else 0.0,
        })
    return skipped + results


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
    pair_backend="auto",
):
    """Run incremental SfM over a list of images.

    ``pair_backend`` selects how pairwise matching + RANSAC runs:
    ``"loop"`` dispatches one device program per pair from the host;
    ``"batched"`` pads all pairs to a static shape and runs them as ONE
    jitted program (:func:`_match_pairs_batched`).  ``"auto"``
    (default) picks ``"batched"`` on accelerator backends with 3+
    pairs and ``"loop"`` otherwise: with on-device survivor compaction
    and the memoized step program, the batched path wins warm on chip
    (10-view scene: 0.8-0.9 s vs the loop's 1.9 s, 2.4x — round-5
    measurement) because it pays one dispatch+pull instead of one per
    pair; on CPU (tests, small jobs) the loop path's smaller programs
    compile faster.

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

    if pairs == "sequential":
        pair_list = [(i, i + 1) for i in range(V - 1)]
    elif pairs == "exhaustive":
        pair_list = [(i, j) for i in range(V) for j in range(i + 1, V)]
    else:
        pair_list = list(pairs)

    if pair_backend == "auto":
        pair_backend = (
            "batched"
            if jax.default_backend() != "cpu" and len(pair_list) >= 3
            else "loop"
        )

    # the batched backend matches on device, so SIFT can leave the
    # descriptors there (no 128 B/keypoint pull + re-upload through
    # the link); the loop backend needs host rows
    device_sift = (
        pair_backend == "batched" and jax.default_backend() != "cpu"
    )
    with Timer("sfm-sift", quiet) as t_sift:
        ims = [imread(p, dtype="float32", force_grayscale=True) for p in image_paths]
        if device_sift:
            from spectavi_tpu.features.normalize import (
                normalize_to_ubyte_device,
            )
            from spectavi_tpu.features.sift import sift_filter_batch_device

            outs = sift_filter_batch_device(ims)
            kps_meta = [o["meta"] for o in outs]
            # descriptor-only quantization: run_sfm's matchers (loop
            # and batched alike) match kp[:, 4:], unlike ex01's
            # full-row convention
            descs_u8 = [
                normalize_to_ubyte_device(o["desc"].astype(jnp.float32))
                if o["meta"].shape[0]
                else jnp.zeros((0, 128), jnp.uint8)
                for o in outs
            ]
            kps = None  # host 132-col rows materialized on demand
        else:
            kps = sift_filter_batch(ims)
            kps_meta = [kp[:, :4] for kp in kps]
            descs_u8 = None
    metrics["sift_seconds"] = t_sift.elapsed
    metrics["keypoints_per_view"] = [int(m.shape[0]) for m in kps_meta]
    if not quiet:
        for i, m in enumerate(kps_meta):
            print(f"  view {i}: {m.shape[0]} keypoints")

    def host_rows():
        """Full 132-col host keypoint rows (lazy: only the batched
        backend's rare per-pair retry needs them under device SIFT)."""
        nonlocal kps
        if kps is None:
            kps = [
                np.concatenate(
                    [o["meta"], np.asarray(o["desc"]).astype(np.float32)],
                    axis=1,
                )
                for o in outs
            ]
        return kps

    # calibrated euclidean keypoint coordinates per view
    pts_cal = []
    for m in kps_meta:
        h = np.hstack([m[:, :2], np.ones((m.shape[0], 1))]) @ iK.T
        pts_cal.append(h[:, :2] / h[:, 2:3])

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
    metrics["pair_backend"] = pair_backend
    with Timer("sfm-pairs", quiet) as t_pairs:
        if pair_backend == "batched":
            if descs_u8 is None:
                from spectavi_tpu.features import (
                    normalize_to_ubyte_and_multiple_16_dim,
                )

                descs_u8 = [
                    (
                        normalize_to_ubyte_and_multiple_16_dim(kp[:, 4:])
                        + 128
                    ).astype(np.uint8)
                    for kp in host_rows()
                ]
            key, sub = jax.random.split(key)
            batch = _match_pairs_batched(
                descs_u8, pts_cal, pair_list, sub, ropts, min_ratio
            )
            for res in batch:
                i, j = res["pair"]
                if res.get("skipped"):
                    metrics["pairs"].append(
                        {"pair": [i, j], "matches": 0, "skipped": True}
                    )
                    if not quiet:
                        print(f"  pair ({i},{j}): empty view, skipped")
                    continue
                if res["n_matches"] >= 10 and len(res["idx_j"]) < 8:
                    # rare single-shot batch-RANSAC failure (the gated
                    # trial batch found no valid hypothesis); retry this
                    # pair through the confidence-looped host path
                    key, sub = jax.random.split(key)
                    rec, edge = _match_pair_loop(
                        host_rows(), pts_cal, i, j, sub, ropts, min_ratio,
                        quiet,
                    )
                    rec["batched_retry"] = True
                    metrics["pairs"].append(rec)
                    if edge is not None:
                        edges[(i, j)] = edge
                        pair_matches[(i, j)] = (edge["idx_i"], edge["idx_j"])
                    continue
                rec = {
                    "pair": [i, j],
                    "matches": res["n_matches"],
                    "inlier_percent": float(res["inlier_percent"]),
                    "n_inliers": int(len(res["idx_j"])),
                    # same statistical semantics as the loop path
                    # (reference src/RansacFitter.h:75-76): success iff
                    # the inlier fraction clears the required threshold
                    "success": bool(
                        res["count"] >= 0
                        and res["inlier_percent"]
                        >= ropts["required_percent_inliers"]
                    ),
                }
                metrics["pairs"].append(rec)
                if not quiet:
                    print(
                        f"  pair ({i},{j}): {res['n_matches']} matches, "
                        f"{res['inlier_percent']:.2f} inliers"
                    )
                if res["n_matches"] < 10 or len(res["idx_j"]) < 8:
                    continue
                edges[(i, j)] = {
                    "R": res["camera"][:, :3],
                    "t": res["camera"][:, 3],
                    "idx_i": res["idx_i"],
                    "idx_j": res["idx_j"],
                }
                pair_matches[(i, j)] = (res["idx_i"], res["idx_j"])
        else:
            for (i, j) in pair_list:
                key, sub = jax.random.split(key)
                rec, edge = _match_pair_loop(
                    host_rows(), pts_cal, i, j, sub, ropts, min_ratio, quiet
                )
                metrics["pairs"].append(rec)
                if edge is not None:
                    edges[(i, j)] = edge
                    pair_matches[(i, j)] = (edge["idx_i"], edge["idx_j"])

    if not edges:
        raise RuntimeError("no usable image pairs")
    pairs_elapsed = t_pairs.elapsed
    metrics["pairs_seconds"] = pairs_elapsed
    metrics["pairs_per_second"] = (
        len(pair_list) / pairs_elapsed if pairs_elapsed else None
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
        for v in range(V):  # vectorized per view (tracks is (T, V))
            sel = mask[:, v]
            uv_tab[sel, v] = pts_cal[v][tracks[sel, v]]
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
        if jax.default_backend() != "cpu":
            # in-device LM loop: the host loop's per-iteration
            # accept/reject pull (~60 ms each through the tunnel) was
            # most of the BA wall; here all ba_iters run as one
            # dispatch (fixed robust scale, no early break)
            from spectavi_tpu.sfm.bundle_adjust import bundle_adjust_device

            cams_ba, pts_ba, hist = bundle_adjust_device(
                cams0, X0, ci, pi, uv, fixed_cameras=(0,),
                max_iters=ba_iters, loss=loss,
            )
            ba_iter_count = ba_iters  # attempted (accept/reject in-device)
        else:
            cams_ba, pts_ba, hist = bundle_adjust(
                cams0, X0, ci, pi, uv, fixed_cameras=(0,),
                max_iters=ba_iters, loss=loss,
            )
            ba_iter_count = len(hist) - 1
    metrics["ba_seconds"] = t_ba.elapsed
    metrics["ba_accepted_iters"] = ba_iter_count
    metrics["ba_iters_per_second"] = (
        ba_iter_count / t_ba.elapsed if t_ba.elapsed else None
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
        # under device-resident SIFT only the 4-col meta is on host;
        # full 132-col rows were never pulled
        "keypoints": kps if kps is not None else kps_meta,
        "ba_history": hist,
        "metrics": metrics,
    }
