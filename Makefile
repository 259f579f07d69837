# smolvision_tpu — convenience targets (mirrors the reference Makefile UX)

PY ?= python

.PHONY: test test-fast native bench tiny-model clean

test: native
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

native:
	$(MAKE) -C native

bench:
	$(PY) bench.py

tiny-model:
	$(PY) tools/make_tiny_model.py --preset tiny --out /tmp/smolvision-tiny

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
