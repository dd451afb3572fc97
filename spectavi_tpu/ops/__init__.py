"""``spectavi_tpu.ops`` — Pallas TPU kernels for hot paths."""
