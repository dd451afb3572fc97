"""``spectavi_tpu.parallel`` — meshes, sharding, distributed execution."""
