"""CLI for the two-view pipeline — ex01 equivalent.

Usage (mirrors ``example/ex01_essential_estimation.py:264-294``):

    python -m spectavi_tpu.pipeline.ex01 IM0 IM1 K.txt [--outdir DIR]
        [--matching_method {bruteforce,cascading-hash}]
        [--ransac_quality {low,medium,high,ultra,uber}]
        [--min_ratio R] [--rsf F] [--cache] [--seed N]
"""

from __future__ import annotations

import argparse

from spectavi_tpu.pipeline.two_view import run_two_view


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Estimate the essential matrix of an image pair, "
        "triangulate a sparse cloud, and rectify the pair (TPU-native)."
    )
    parser.add_argument("images", metavar="IM", type=str, nargs=2)
    parser.add_argument("K", metavar="K", type=str)
    parser.add_argument("--min_ratio", default=1.75, type=float)
    parser.add_argument(
        "--ransac_quality",
        default="ultra",
        choices=["low", "medium", "high", "ultra", "uber"],
    )
    parser.add_argument(
        "--matching_method",
        default="auto",
        choices=["auto", "bruteforce", "cascading-hash", "l2-mxu"],
        help="'auto' = exact MXU L2 top-2 on accelerators, the "
        "reference example's cascading-hash on CPU",
    )
    parser.add_argument("--outdir", default="ex01_out", type=str)
    parser.add_argument("--rsf", default=1.0, type=float)
    parser.add_argument("--cache", action="store_true")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--reproj", default=None, type=float,
                        help="override RANSAC reprojection threshold (normalized coords)")
    parser.add_argument("--ba", action="store_true",
                        help="two-view bundle-adjustment polish after triangulation")
    parser.add_argument("--distortion", action="store_true",
                        help="estimate a shared radial (k1,k2) lens model during --ba")
    parser.add_argument("--plots", action="store_true",
                        help="save keypoint/match visualizations to outdir")
    parser.add_argument("--view", action="store_true",
                        help="open the sparse cloud interactively with "
                        "open3d (reference ex01's final viz step; falls "
                        "back to a message when open3d is unavailable)")
    parser.add_argument("--trace", default=None, metavar="DIR",
                        help="capture a jax.profiler device trace of the "
                        "run to DIR (view with tensorboard)")
    args = parser.parse_args(argv)

    import jax

    ransac_options = None
    if args.reproj is not None:
        ransac_options = {"reprojection_error_allowed": args.reproj,
                          "find_best_even_in_failure": True}
    import contextlib

    trace_ctx = contextlib.nullcontext()
    if args.trace:
        from spectavi_tpu.utils.profiling import trace

        trace_ctx = trace(args.trace)
    with trace_ctx:
        run_two_view(
            args.images,
            args.K,
            outdir=args.outdir,
            matching_method=args.matching_method,
            min_ratio=args.min_ratio,
            ransac_quality=args.ransac_quality,
            rsf=args.rsf,
            cache=args.cache,
            key=jax.random.PRNGKey(args.seed),
            ransac_options=ransac_options,
            ba=args.ba,
            distortion=args.distortion,
            plots=args.plots,
        )
    if args.view:
        import os

        from spectavi_tpu.pipeline.viz import try_open3d_viz

        try_open3d_viz(os.path.join(args.outdir, "sparse_inliers.ply"))


if __name__ == "__main__":
    main()
