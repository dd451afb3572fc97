"""``spectavi_tpu.features`` — keypoint detection & description (SIFT)."""
from spectavi_tpu.features.normalize import normalize_to_ubyte_and_multiple_16_dim  # noqa: F401
