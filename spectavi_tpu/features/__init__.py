"""``spectavi_tpu.features`` — keypoint detection & description.

Public API mirrors the feature half of the reference's
``spectavi.feature``: ``sift_filter``, ``sift_filter_batch``,
``sift_filter_striped``, ``normalize_to_ubyte_and_multiple_16_dim``.
"""
from spectavi_tpu.features.normalize import normalize_to_ubyte_and_multiple_16_dim  # noqa: F401
from spectavi_tpu.features.sift import (  # noqa: F401
    sift_filter,
    sift_filter_batch,
    sift_filter_batch_device,
    sift_filter_striped,
)
