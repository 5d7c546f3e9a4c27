# PALLAS_AXON_POOL_IPS= disables the axon TPU plugin registration that
# sitecustomize performs in every python process — required for fast
# CPU-only test runs (the 8-device virtual mesh). bench.py runs on the real
# TPU and keeps the default environment.
#
# Tiers (single-core box, cold cache):
#   test-fast  — goldens + op/unit tests, ~3 min; the in-round safety net
#   test       — adds the tiny-model e2e compiles (~15+ min cold)
#   test-slow  — full-train-step compile budgets (dryrun guard etc.)
test-fast:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q -m "not slow and not e2e"

test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q -m "not slow"

test-slow:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q -m slow

test-all:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q

bench:
	python bench.py
