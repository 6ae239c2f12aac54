.PHONY: test slowtests bench

test:
	python -m pytest tests/ -q -m "not slow"

# the 11 heavy statistical/optimization tests (boundary-gradient FD,
# lens-design loop, guided integration) — run on a cadence; results are
# noted in PROGRESS.jsonl each round
slowtests:
	python -m pytest tests/ -q -m slow

bench:
	python bench.py
