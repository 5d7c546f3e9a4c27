# PALLAS_AXON_POOL_IPS= disables the axon TPU plugin registration that
# sitecustomize performs in every python process — required for fast
# CPU-only test runs (the 8-device virtual mesh). bench.py runs on the real
# TPU and keeps the default environment.
test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q -m "not slow"

test-slow:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q -m slow

test-all:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q

bench:
	python bench.py
