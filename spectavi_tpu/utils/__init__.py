"""``spectavi_tpu.utils`` — IO, timing, logging helpers."""
