# Parity with the reference Makefile's `quality` target (ruff check/format).

.PHONY: quality test bench

quality:
	-python -m ruff check finetrainers_tpu/ tests/ train.py bench.py 2>/dev/null || \
	  python -m pyflakes finetrainers_tpu/ 2>/dev/null || \
	  echo "no linter available (ruff/pyflakes not installed)"

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/trainer --ignore=tests/models/test_model_zoo.py

bench:
	python bench.py

native:
	python -c "from finetrainers_tpu.native import build; print('built' if build() else 'failed')"
