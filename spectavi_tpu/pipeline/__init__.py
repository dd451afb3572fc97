"""``spectavi_tpu.pipeline`` — end-to-end reconstruction pipelines."""
