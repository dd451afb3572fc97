"""spectavi_tpu — a TPU-native multi-view-geometry / SfM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``vvhitedog/spectavi`` (reference: /root/reference): SIFT feature
detection/description, fast nearest-neighbour descriptor matching,
7-point essential-matrix estimation under massively-parallel RANSAC,
DLT triangulation, epipolar rectification, and a distributed
pose-graph / bundle-adjustment layer that the reference does not have.

Everything on the compute path is a pure-functional batched array
program: per-item C++ loops in the reference become ``vmap``-batched or
Pallas-tiled kernels here, OpenMP becomes XLA scheduling + mesh
sharding, and the ctypes FFI layer disappears into device arrays.

Layout
------
``spectavi_tpu.mvg``      geometry core: cameras, 7-point, DLT, RANSAC, rectification
``spectavi_tpu.features`` SIFT detection/description (scale-space on TPU)
``spectavi_tpu.match``    NN matching: brute-force Lp / L1-K2 / cascade-hash / kmedians / sharded ANN
``spectavi_tpu.ops``      Pallas TPU kernels for the hot paths
``spectavi_tpu.parallel`` device meshes, shard_map'd matching, distributed helpers
``spectavi_tpu.pipeline`` end-to-end two-view pipeline (ex01 equivalent)
``spectavi_tpu.sfm``      pose graph + bundle adjustment (new capability)
"""

__version__ = "0.1.0"

from spectavi_tpu import mvg, features, match, pipeline, sfm  # noqa: F401
