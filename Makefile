# Developer entry points (role parity with the reference Makefile:20-52,
# minus the Postgres container lifecycle — there is no container to boot).

.PHONY: test test-tpu bench bench-kernels parity native lint clean

test:
	python -m pytest tests/ -x -q

test-tpu:
	RUN_ON_TPU=1 python -m pytest tests/test_tpu_hardware.py -m tpu -q

bench:
	python bench.py

# per-kernel measurement suite (real TPU; see CLAUDE.md for recorded numbers)
bench-kernels:
	python scripts/bench_bm25.py
	python scripts/bench_maxsim.py
	python scripts/bench_dense_big.py
	python scripts/bench_serving.py

# offline BEIR-recipe end-to-end (ingest -> pipelines -> metrics -> leaderboard)
parity:
	python scripts/parity_run.py --ingestor local --extra data_dir=$(DATA) \
		--workspace $(WS)

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
