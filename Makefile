# Development workflow (mirrors the reference Makefile's targets in spirit).

.PHONY: test bench native clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean 2>/dev/null || true
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
