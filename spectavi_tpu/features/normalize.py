"""Descriptor quantization for byte matching.

Capability parity with the reference's
``normalize_to_ubyte_and_multiple_16_dim`` (``spectavi/feature.py:
384-407``): center each column, scale symmetrically into the int8
range, and pad the feature dimension up to a multiple of 16.  The
reference needs the 16-alignment for SSE loads; here it simply keeps
byte-descriptor layouts uniform (TPU kernels pad further to lane width
internally).
"""

from __future__ import annotations

import numpy as np


def normalize_to_ubyte_and_multiple_16_dim(x, dtype="float32"):
    """Center, scale to [-128, 127], round, and 16-pad columns.

    The symmetric scale is ``128 / max(|column extrema|)`` so the full
    negative byte range is used without asymmetric clipping (a single
    +127 clamp handles the positive edge case after rounding).
    """
    # f32 math with an f64 column mean: descriptor values are small
    # integers so f32 is exact through the centering/scaling, and this
    # host rounds f32 ~5x faster than f64 at castle-size inputs
    xf = np.asarray(x, np.float32)
    centered = xf - xf.mean(0, dtype=np.float64).astype(np.float32)
    span = np.abs(
        np.stack([centered.max(0), centered.min(0)])
    ).max(0)
    span = np.maximum(span, np.finfo(np.float32).tiny)  # constant columns
    quant = np.clip(np.rint(centered * (128.0 / span)), -128, 127)
    rows, dim = quant.shape
    out = np.zeros((rows, -(-dim // 16) * 16), dtype=dtype)
    out[:, :dim] = quant
    return out


def normalize_to_ubyte_device(x):
    """Device twin of :func:`normalize_to_ubyte_and_multiple_16_dim`
    with the matcher's ``+128`` offset fused in: jnp ``(n, d)`` float
    in, ``(n, 16-padded d)`` DEVICE uint8 out (padding columns hold
    128, the byte value a zero-padded column takes after the offset).
    Lets a device-resident pipeline quantize + match without a host
    round trip."""
    import jax.numpy as jnp

    xf = jnp.asarray(x, jnp.float32)
    # f64-accumulated column mean like the host quantizer (when x64 is
    # enabled — CPU parity paths/tests; without x64 this is a no-op
    # cast and the mean accumulates in f32, whose last-ulp differences
    # can flip ~1e-5 of quantized bytes on non-integer columns)
    mean = xf.astype(jnp.float64).mean(0).astype(jnp.float32)
    centered = xf - mean
    span = jnp.maximum(
        jnp.maximum(centered.max(0), -centered.min(0)),
        jnp.finfo(jnp.float32).tiny,
    )
    quant = jnp.clip(jnp.round(centered * (128.0 / span)), -128, 127)
    dim = quant.shape[1]
    pad = (-dim) % 16
    out = jnp.pad(quant + 128.0, ((0, 0), (0, pad)), constant_values=128.0)
    return out.astype(jnp.uint8)
