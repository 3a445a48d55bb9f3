# Test tiers (SURVEY §4). On the 1-core CI host the full suite exceeds a
# single timeout window; use `make test` (chunked) there.
.PHONY: test test-fast test-golden test-e2e

test:
	bash scripts/run_test_chunks.sh

test-fast:
	python -m pytest tests/ -q -m "not golden and not e2e"

test-golden:
	python -m pytest tests/ -q -m golden

test-e2e:
	python -m pytest tests/ -q -m e2e
