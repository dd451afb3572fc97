"""Bundle-adjustment throughput: LM steps/s on a synthetic mid-size scene.

Secondary benchmark (BASELINE.json metric: "BA iters/s").  The driver's
headline bench is ``bench.py`` at the repo root; this harness measures
the BA kernel on the current default backend.

Usage: python benchmarks/bench_ba.py [--cams 50] [--pts 5000] [--obs-per-pt 4]
"""

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=50)
    ap.add_argument("--pts", type=int, default=5000)
    ap.add_argument("--obs-per-pt", type=int, default=4)
    ap.add_argument("--cg-iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spectavi_tpu.sfm.bundle_adjust import ba_step, rodrigues, rotation_to_rvec

    rng = np.random.default_rng(0)
    C, M = args.cams, args.pts
    cams = []
    for i in range(C):
        a = 0.1 * i
        R = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
        )
        Cc = np.array([6 * np.sin(a), 0.1 * i, -15 + 0.2 * i])
        cams.append(np.concatenate([rotation_to_rvec(R), -R @ Cc]))
    cams = np.asarray(cams, dtype=np.float32)
    pts = rng.standard_normal((M, 3)).astype(np.float32) * 2

    O = M * args.obs_per_pt
    pt_idx = np.repeat(np.arange(M), args.obs_per_pt).astype(np.int32)
    cam_idx = rng.integers(0, C, size=O).astype(np.int32)
    R = np.asarray(rodrigues(jnp.asarray(cams[:, :3])))
    Xc = np.einsum("oij,oj->oi", R[cam_idx], pts[pt_idx]) + cams[cam_idx, 3:]
    uv = (Xc[:, :2] / np.abs(Xc[:, 2:3]).clip(1e-3)).astype(np.float32)
    w = np.ones(O, np.float32)
    fixed = np.zeros(C, bool)
    fixed[0] = True

    jcams, jpts, jci, jpi, juv, jw = (
        jnp.asarray(a) for a in (cams, pts, cam_idx, pt_idx, uv, w)
    )
    lam = jnp.asarray(1e-3, jnp.float32)
    fx = jnp.asarray(fixed)

    # honest timing on this machine: block_until_ready returns before
    # execution through the tunnel, so the rep loop runs ON DEVICE
    # (scan whose carry chains step into step) and throughput is the
    # SLOPE between two rep counts (cancels the constant pull latency)
    from functools import partial

    @partial(jax.jit, static_argnames=("reps",))
    def loop(cams0, pts0, reps):
        def body(carry, _):
            c, p = carry
            c2, p2, cost = ba_step(
                c, p, jci, jpi, juv, jw, lam, fx, cg_iters=args.cg_iters
            )
            return (c2, p2), cost

        (c, p), costs = jax.lax.scan(
            body, (cams0, pts0), None, length=reps
        )
        return jnp.sum(c) + jnp.sum(p) + jnp.sum(costs)

    r1, r2 = args.reps, 3 * args.reps
    _ = float(loop(jcams, jpts, r1))  # compile + warm
    _ = float(loop(jcams, jpts, r2))
    walls = {}
    for r in (r1, r2):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(loop(jcams, jpts, r))  # value pull forces completion
            best = min(best, time.perf_counter() - t0)
        walls[r] = best
    dt = (walls[r2] - walls[r1]) / (r2 - r1)
    print(
        f"BA step ({C} cams, {M} pts, {O} obs, cg={args.cg_iters}) on "
        f"{jax.default_backend()}: {dt*1e3:.1f} ms/step -> {1/dt:.1f} iters/s"
    )


if __name__ == "__main__":
    main()
