# Developer entry points.  The test suite runs on CPU (tests/conftest.py
# forces an 8-device virtual mesh); training/bench use the real TPU.

.PHONY: test-fast test-heavy test warm-cache bench

# Fast tier: everything except the interpret-mode Pallas parity suites and
# the 2-process cluster tests.  -n 4 compiles test programs on all four
# cores — this is what makes a COLD run (fresh clone, empty
# .jax_cache_tests/) practical; warm runs are faster still.
test-fast:
	python -m pytest tests/ -m "not heavy" -q -n 4

# Heavy tier (interpret-mode Pallas parity, warm-start trajectory checks,
# 2-process jax.distributed cluster): nightly cadence.
test-heavy:
	python -m pytest tests/ -m heavy -q

test:
	python -m pytest tests/ -q -n 4

# One-time compile-cache bootstrap for a fresh clone or CI box: populates
# .jax_cache_tests/ by running the fast tier once in parallel.  Subsequent
# `make test-fast` runs hit the persistent cache.
warm-cache: test-fast

bench:
	python bench.py
