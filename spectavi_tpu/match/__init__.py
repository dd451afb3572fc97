"""``spectavi_tpu.match`` — nearest-neighbour descriptor matching."""
