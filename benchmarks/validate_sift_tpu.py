"""TPU-vs-CPU SIFT parity validation.

Runs the full SIFT extractor on one image and compares keypoints +
descriptors between the TPU path (Pallas patch-DMA orientation and
descriptor kernels) and the pure-XLA CPU path (the formulation the
golden sur-ogre test certifies against vlfeat).

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/validate_sift_tpu.py ref out.npz
  python benchmarks/validate_sift_tpu.py cmp out.npz        # on TPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def extract(path):
    from spectavi_tpu.features.sift import sift_filter

    if path.endswith(".npz"):
        im = np.load(path)["im"].astype("float32")
    else:
        from spectavi_tpu.pipeline.io import imread

        im = imread(path, force_grayscale=True)
    return sift_filter(im)


def compare(a, b):
    """Match rows of a and b by (x, y, sigma, angle) and compare descs."""
    from scipy.spatial import cKDTree

    ta = cKDTree(a[:, :4])
    d, j = ta.query(b[:, :4], k=1)
    matched = d < 1e-2
    print(f"rows: ref {len(a)} vs tpu {len(b)}; "
          f"keypoint-matched {matched.mean() * 100:.2f}%")
    cos = np.einsum("ij,ij->i", a[j[matched], 4:], b[matched, 4:]) / (
        np.linalg.norm(a[j[matched], 4:], axis=1)
        * np.linalg.norm(b[matched, 4:], axis=1)
        + 1e-12
    )
    print(f"desc cosine: median {np.median(cos):.6f}  "
          f"min {cos.min():.6f}  frac>0.999 {(cos > 0.999).mean():.4f}")
    ok = matched.mean() > 0.995 and np.median(cos) > 0.999
    print("PARITY OK" if ok else "PARITY FAIL")
    return ok


if __name__ == "__main__":
    mode, npz = sys.argv[1], sys.argv[2]
    img = sys.argv[3] if len(sys.argv) > 3 else "/root/reference/data/sift-test/sur-ogre.npz"
    if mode == "ref":
        kp = extract(img)
        np.savez(npz, kp=kp)
        print(f"saved {kp.shape} reference rows to {npz}")
    else:
        ref = np.load(npz)["kp"]
        kp = extract(img)
        sys.exit(0 if compare(ref, kp) else 1)
