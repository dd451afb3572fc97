"""Stage-level wall-clock breakdown of the batched SIFT flow on the
current backend — diagnosis tool for the round-4 step-1 push.

Mirrors ``features/sift.py::_sift_batched_same_shape`` with timers
around each dispatch/pull so the tunnel-latency vs compute split is
visible.  Not a test; run manually:

    python benchmarks/profile_sift_stages.py [--reps 3] [--batch 2]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CASTLE = "/root/reference/data/castle/01.jpg"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spectavi_tpu.pipeline.io import imread
    from spectavi_tpu.features import sift

    im = imread(CASTLE, dtype="float32", force_grayscale=True)
    ims = [im] * args.batch
    B = len(ims)
    H0, W0 = im.shape
    o_min = -1
    n_octaves = sift.num_octaves(H0, W0, o_min)
    budgets = sift._octave_budgets(H0, W0, o_min, n_octaves, 32768)
    print(f"octaves={n_octaves} budgets={budgets} total={sum(budgets)}")

    def once(tag):
        t = {}
        t0 = time.perf_counter()
        first = sift._base_first(jnp.asarray(np.stack(ims)), o_min)
        det_metas, grads = [], []
        for budget in budgets:
            first, mod, ang, det = sift._octave_detect(first, 0.0, 10.0, budget)
            det_metas.append(det)
            grads.append((mod, ang))
        t["1-dispatch-detect"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        det_all = np.asarray(jnp.concatenate(det_metas, axis=2))
        t["2-pull-det"] = time.perf_counter() - t0
        print(f"   det pull bytes={det_all.nbytes}")

        t0 = time.perf_counter()
        det_jobs = []
        for bi in range(B):
            off = 0
            for oi, budget in enumerate(budgets):
                det = det_all[bi, :, off : off + budget]
                off += budget
                sel = np.where(det[4] > 0)[0]
                n_kp = len(sel)
                if n_kp == 0:
                    continue
                bucket = sift._bucket_pad(n_kp)
                sel_pad = np.concatenate(
                    [sel, np.zeros(bucket - n_kp, dtype=sel.dtype)]
                )
                det_jobs.append((bi, oi, det[:, sel_pad], n_kp, bucket))
        t["3-host-compact"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        angles, canvas = sift._orient_jobs(det_jobs, grads)
        t["4-orient(dispatch+pull)"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        jobs = []
        for (bi, oi, det_sel, n_kp, bucket) in det_jobs:
            th, av = angles[(bi, oi)]
            av = av & (np.arange(bucket) < n_kp)[:, None]
            meta6 = np.stack(
                [
                    th.reshape(-1),
                    av.reshape(-1).astype(th.dtype),
                    np.repeat(det_sel[0], sift.MAX_ANGLES),
                    np.repeat(det_sel[1], sift.MAX_ANGLES),
                    np.repeat(det_sel[2], sift.MAX_ANGLES),
                    np.repeat(det_sel[3], sift.MAX_ANGLES),
                ]
            )
            sel2 = np.where(meta6[1] > 0)[0]
            n_ang = len(sel2)
            if n_ang == 0:
                continue
            bucket2 = sift._bucket_pad(n_ang)
            sel2_pad = np.concatenate(
                [sel2, np.zeros(bucket2 - n_ang, dtype=sel2.dtype)]
            )
            jobs.append((bi, oi, meta6[:, sel2_pad], n_ang, bucket2))
        t["5-host-expand"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        desc_all = sift._describe_jobs(jobs, grads, 3.0, canvas)
        t["6-describe(dispatch+pull)"] = time.perf_counter() - t0

        total = sum(t.values())
        print(f" {tag}: total={total:.3f}s")
        for k, v in t.items():
            print(f"   {k:28s} {v:.3f}")
        return total

    once("warmup/compile")
    best = min(once(f"rep{i}") for i in range(args.reps))
    mpix = B * H0 * W0 / 1e6
    print(f"best={best:.3f}s  {mpix / best:.3f} Mpix/s")


if __name__ == "__main__":
    main()
