"""Descriptor normalization for byte-quantized matching.

Parity with ``spectavi.feature.normalize_to_ubyte_and_multiple_16_dim``
(reference ``spectavi/feature.py:384-407``): de-mean per column, scale
into ``[-128, 127]``, round/clamp, and zero-pad the feature dimension to
a multiple of 16 (the reference needs 16 for SSE alignment; here the pad
keeps byte-matching layouts uniform, and TPU kernels pad further to
lane width internally).
"""

from __future__ import annotations

import numpy as np


def normalize_to_ubyte_and_multiple_16_dim(x, dtype="float32"):
    x0 = np.asarray(x, dtype=np.float64)
    x0 = x0 - np.mean(x0, axis=0, keepdims=True)
    max_per_col = np.max(x0, axis=0, keepdims=True)
    min_per_col = np.min(x0, axis=0, keepdims=True)
    norm = np.max(np.stack([max_per_col, -min_per_col]), axis=0)
    x0 = x0 / norm * 128
    x0 = np.round(x0)
    x0[x0 > 127] = 127
    x0[x0 < -128] = -128
    xrows, dim = x0.shape
    new_dim = int(np.ceil(dim / 16.0) * 16)
    xx = np.zeros([xrows, new_dim])
    xx[:, :dim] = x0
    return xx.astype(dtype)
