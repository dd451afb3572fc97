"""Example: multi-view incremental SfM.

Runs the full multi-view pipeline (SIFT -> pairwise RANSAC -> tracks ->
pose chaining -> N-view triangulation -> bundle adjustment) over a list
of images sharing one intrinsics matrix, producing a refined sparse
cloud + camera trajectory.

    python examples/ex02_multiview_sfm.py IM0 IM1 [IM2 ...] K.txt \
        --outdir sfm_out [--pairs exhaustive] [--checkpoint state.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+", help="image files followed by K.txt")
    ap.add_argument("--outdir", default="sfm_out")
    ap.add_argument("--pairs", default="sequential", choices=["sequential", "exhaustive"])
    ap.add_argument("--min_ratio", default=1.75, type=float)
    ap.add_argument("--ba_iters", default=15, type=int)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--seed", default=0, type=int)
    args = ap.parse_args(argv)

    images, K_path = args.inputs[:-1], args.inputs[-1]
    if len(images) < 2:
        ap.error("need at least two images plus K.txt")

    import jax

    from spectavi_tpu.pipeline.sfm import run_sfm

    res = run_sfm(
        images,
        K_path,
        outdir=args.outdir,
        pairs=args.pairs,
        min_ratio=args.min_ratio,
        ba_iters=args.ba_iters,
        key=jax.random.PRNGKey(args.seed),
        checkpoint=args.checkpoint,
    )
    print(
        f"done: {res['points'].shape[0]} points, "
        f"BA cost {res['ba_history'][0]:.3e} -> {res['ba_history'][-1]:.3e}; "
        f"outputs in {args.outdir}"
    )


if __name__ == "__main__":
    main()
