"""``spectavi_tpu.sfm`` — pose graph + bundle adjustment (beyond the reference)."""
