# Developer workflow (reference parity: Makefile `test` target)
.PHONY: test test-all format bench clean

test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf .pytest_cache **/__pycache__ native/libusedsp.so
