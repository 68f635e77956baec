# Developer entry points (role parity with the reference Makefile:20-52,
# minus the Postgres container lifecycle — there is no container to boot).

.PHONY: test test-tpu bench native lint clean

test:
	python -m pytest tests/ -x -q

test-tpu:
	RUN_ON_TPU=1 python -m pytest tests/test_tpu_hardware.py -m tpu -q

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
