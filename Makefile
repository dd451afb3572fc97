# Convenience targets for spectavi_tpu.
.PHONY: test check bench native clean-cache

test:
	python -m pytest tests/ -q

# Pre-snapshot gate (round-4 verdict item 2: never snapshot red).
# Runs the full hermetic suite and records the result against the
# exact tree state in CHECKRUN.txt; commit only after this is green.
check:
	@sha=$$(git rev-parse --short HEAD); \
	dirty=$$(git status --porcelain | wc -l); \
	start=$$(date -u +%Y-%m-%dT%H:%M:%SZ); \
	if python -m pytest tests/ -q > /tmp/checkrun.$$$$ 2>&1; then \
	  status=GREEN; else status=RED; fi; \
	tail -3 /tmp/checkrun.$$$$; \
	echo "$$start sha=$$sha dirty_files=$$dirty status=$$status $$(grep -oE '[0-9]+ (passed|failed)[^=]*' /tmp/checkrun.$$$$ | head -1)" >> CHECKRUN.txt; \
	rm -f /tmp/checkrun.$$$$; \
	tail -1 CHECKRUN.txt; \
	[ "$$status" = GREEN ]

bench:
	python bench.py

native:
	$(MAKE) -C native

clean-cache:
	rm -rf ~/.cache/spectavi_tpu_xla
