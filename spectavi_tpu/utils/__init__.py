"""``spectavi_tpu.utils`` — IO, timing, logging helpers."""
from spectavi_tpu.utils.profiling import annotate, trace  # noqa: F401
