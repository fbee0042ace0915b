# tpuslam developer targets

.PHONY: test verify-tpu bench

# CPU suite (8-device virtual mesh, deterministic — see tests/conftest.py)
test:
	python -m pytest tests/ -x -q

# On-hardware Mosaic parity suite: executes every Pallas kernel through
# the real Mosaic compiler at every production operating size and
# bit-checks against the XLA response paths.  Run on the bench chip
# BEFORE capturing any BENCH numbers (see tests_tpu/conftest.py).
verify-tpu:
	python verify_tpu.py
	python -m pytest tests_tpu/ -q

bench:
	python bench.py
