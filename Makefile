# Convenience targets for spectavi_tpu.
.PHONY: test bench native clean-cache

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

clean-cache:
	rm -rf ~/.cache/spectavi_tpu_xla
