"""Multi-view SfM accuracy benchmark on a rendered synthetic scene.

The reference's steveston multi-image config (BASELINE configs[3-4])
cannot be reproduced here — its jpgs are stripped from the snapshot —
so this benchmark substitutes a scene with *known ground truth*: a
gently height-mapped surface textured with the real castle image,
rendered from N pinhole cameras by exact ray/heightfield intersection
(fixed-point iteration, bilinear texture lookup — no holes, no
splatting artifacts).  The full pipeline (SIFT -> pairwise matching ->
RANSAC -> pose chaining -> N-view triangulation -> BA) then rebuilds
the scene, and the recovered camera trajectory is Umeyama-aligned to
the ground-truth centers for an ATE-RMSE score; the cloud is scored
against the analytic surface.

Usage: python benchmarks/bench_multiview_synthetic.py [--nviews 4]
           [--size 480 640] [--outdir /tmp/synth_mv]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEXTURE = "/root/reference/data/castle/01.jpg"


def make_scene(rng):
    """Heightfield z(x, y) = depth - bumps, textured by the castle jpg."""
    from spectavi_tpu.pipeline.io import imread

    tex = imread(TEXTURE, force_grayscale=True)  # (Ht, Wt) in [0, 1]
    Ht, Wt = tex.shape
    # world extent of the textured plane: x,y in [-1, 1] * aspect
    aspect = Wt / Ht
    # strong relief: a near-planar surface is DEGENERATE for
    # essential-matrix estimation (the 7-point problem loses rank), so
    # the bumps must carry real depth variation relative to the scene
    centers = rng.uniform(-0.7, 0.7, size=(8, 2)) * [aspect, 1.0]
    amps = rng.uniform(0.35, 0.7, size=8) * rng.choice([-1, 1], 8)
    widths = rng.uniform(0.3, 0.7, size=8)

    def height(x, y):
        h = 0.15 * (x * x + y * y)  # gentle bowl breaks global planarity
        for (cx, cy), a, w in zip(centers, amps, widths):
            h = h + a * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * w * w))
        return h

    def texture_at(x, y):
        u = (x / aspect * 0.5 + 0.5) * (Wt - 1)
        v = (y * 0.5 + 0.5) * (Ht - 1)
        u = np.clip(u, 0, Wt - 1.001)
        v = np.clip(v, 0, Ht - 1.001)
        u0, v0 = u.astype(int), v.astype(int)
        fu, fv = u - u0, v - v0
        t = (
            tex[v0, u0] * (1 - fu) * (1 - fv)
            + tex[v0, u0 + 1] * fu * (1 - fv)
            + tex[v0 + 1, u0] * (1 - fu) * fv
            + tex[v0 + 1, u0 + 1] * fu * fv
        )
        return t

    return height, texture_at, aspect


def look_at(C, target, up=(0.0, -1.0, 0.0)):
    z = target - C
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])  # world -> cam rows
    t = -R @ C
    return R, t


def render(height, texture_at, K, R, t, H, W, depth=4.0, iters=8, ss=2):
    """Exact inverse render: per pixel, intersect the camera ray with
    the heightfield surface z_world = depth - h(x, y) by fixed-point
    iteration.  Rendered at ``ss``x supersampling and box-downsampled
    (the texture is minified at this geometry; aliasing would corrupt
    SIFT descriptors)."""
    Kss = np.array(
        [
            [K[0, 0] * ss, 0, K[0, 2] * ss],
            [0, K[1, 1] * ss, K[1, 2] * ss],
            [0, 0, 1.0],
        ]
    )
    H, W = H * ss, W * ss
    Kinv = np.linalg.inv(Kss)
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    rays = np.stack([us.ravel(), vs.ravel(), np.ones(H * W)])  # (3, HW)
    d_cam = Kinv @ rays
    d_world = R.T @ d_cam  # (3, HW)
    C = -R.T @ t  # camera centre
    lam = (depth - C[2]) / d_world[2]
    for _ in range(iters):
        x = C[0] + lam * d_world[0]
        y = C[1] + lam * d_world[1]
        z_surf = depth - height(x, y)
        lam = (z_surf - C[2]) / d_world[2]
    x = C[0] + lam * d_world[0]
    y = C[1] + lam * d_world[1]
    im = texture_at(x, y).reshape(H, W)
    if ss > 1:
        im = im.reshape(H // ss, ss, W // ss, ss).mean(axis=(1, 3))
    return im


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nviews", default=4, type=int)
    ap.add_argument("--size", nargs=2, default=[480, 640], type=int)
    ap.add_argument("--outdir", default="/tmp/synth_mv")
    ap.add_argument("--seed", default=3, type=int)
    ap.add_argument(
        "--pair_backend", default="auto", choices=["auto", "loop", "batched"],
        help="pairwise match+RANSAC execution: one dispatch per pair "
        "('loop') or all pairs as one jitted program ('batched')",
    )
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    H, W = args.size
    os.makedirs(args.outdir, exist_ok=True)
    height, texture_at, aspect = make_scene(rng)

    f = 1.1 * W
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    np.savetxt(os.path.join(args.outdir, "K.txt"), K)

    # cameras on a lateral arc looking at the surface centre
    target = np.array([0.0, 0.0, 4.0])
    gt_R, gt_t, paths = [], [], []
    from PIL import Image

    for i in range(args.nviews):
        s = (i / max(args.nviews - 1, 1) - 0.5)
        C = np.array([1.6 * s, 0.25 * s, 0.35 * abs(s)])
        R, t = look_at(C, target)
        im = render(height, texture_at, K, R, t, H, W)
        p = os.path.join(args.outdir, f"view{i:02d}.png")
        Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(p)
        gt_R.append(R)
        gt_t.append(t)
        paths.append(p)
    gt_R, gt_t = np.asarray(gt_R), np.asarray(gt_t)
    gt_C = np.einsum("vji,vj->vi", gt_R, -gt_t)
    np.savez(os.path.join(args.outdir, "gt_cams.npz"), R=gt_R, t=gt_t, C=gt_C)
    print(f"rendered {args.nviews} views {H}x{W} to {args.outdir}", flush=True)

    import time

    import jax

    from spectavi_tpu.pipeline.sfm import run_sfm
    from spectavi_tpu.sfm.ate import ate_rmse, camera_centers

    t0 = time.time()
    res = run_sfm(
        paths,
        os.path.join(args.outdir, "K.txt"),
        outdir=os.path.join(args.outdir, "sfm_out"),
        pairs="sequential",
        key=jax.random.PRNGKey(0),
        # rendered keypoints are ~pixel-accurate (supersampled bilinear
        # texture), not the sub-pixel photographs the castle threshold
        # assumes: 1 px at f=1.1*W is ~1.4e-3 in normalized coordinates
        ransac_options={"reprojection_error_allowed": 2e-3},
        pair_backend=args.pair_backend,
    )
    wall = time.time() - t0
    m = res["metrics"]
    print(
        f"pair_backend={args.pair_backend}: "
        f"sift {m['sift_seconds']:.2f}s, "
        f"pairs {m['pairs_seconds']:.2f}s ({m['pairs_per_second']:.2f} pairs/s), "
        f"graph {m['graph_seconds']:.2f}s, "
        f"ba {m['ba_seconds']:.2f}s ({m['ba_iters_per_second']:.2f} iters/s)",
        flush=True,
    )
    est_C = camera_centers(res["cams"])
    ate = ate_rmse(est_C, gt_C)
    traj_span = np.ptp(gt_C, axis=0).max()

    # cloud accuracy: aligned points vs the analytic surface
    from spectavi_tpu.sfm.ate import umeyama

    s, Ra, ta = umeyama(est_C, gt_C)
    pts = (s * (Ra @ res["points"][:, :3].T)).T + ta
    z_err = np.abs((4.0 - height(pts[:, 0], pts[:, 1])) - pts[:, 2])
    print(
        f"multi-view SfM: {len(paths)} views, {res['points'].shape[0]} points, "
        f"{wall:.1f}s wall",
        flush=True,
    )
    print(
        f"camera ATE-RMSE {ate:.4f} ({100 * ate / traj_span:.2f}% of "
        f"trajectory span {traj_span:.2f}); cloud |z-err| median "
        f"{np.median(z_err):.4f} p90 {np.quantile(z_err, 0.9):.4f}",
        flush=True,
    )
    ok = ate < 0.02 * traj_span
    print("ATE OK" if ok else "ATE FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
