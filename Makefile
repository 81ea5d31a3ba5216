.PHONY: all native test test-fast bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -k "not oracle and not parity and not demo"

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache __pycache__ nomad_tpu/__pycache__
