# Developer entry points (the reference ships complete generated makefiles;
# SURVEY.md §2.18).  `make test` and `make bench` are the two paths the
# round driver and CI use.

PY ?= python

.PHONY: install test bench selftest soak soak-quick sanitize native clean tpu-check

install:
	$(PY) -m pip install -e . --no-build-isolation

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

selftest:
	$(PY) -m mjpeg423_tpu.cli selftest

# Randomized cross-path equivalence + corruption soaks (CPU virtual mesh).
soak:
	$(PY) scripts/parity_soak.py 30
	$(PY) scripts/fuzz_native.py 30
	$(PY) scripts/bench_multihost.py --hosts 2 --out MULTIHOST_BENCH.json

# Bounded (~2 min) seeded soak for CI: the seed is printed first so any
# failure reproduces with `make soak-quick SOAK_SEED=<seed>`.
soak-quick:
	@SEED=$${SOAK_SEED:-$$(date +%s)}; echo "soak-quick seed=$$SEED"; \
	$(PY) scripts/parity_soak.py 5 $$SEED && \
	$(PY) scripts/fuzz_native.py 10 $$SEED && \
	$(PY) scripts/lanes_sweep.py 300 $$SEED

# ASan/UBSan soak of the native codec's SIMD paths (valid + corrupted
# streams; ctypes cannot load a sanitized .so, hence the C harness).
sanitize:
	gcc -O1 -g -std=c11 -fwrapv -march=native -fopenmp \
	    -fsanitize=address,undefined -fno-sanitize-recover=all \
	    -o /tmp/mj_san_native scripts/sanitize_native.c
	/tmp/mj_san_native

# Force a rebuild of the native entropy codec (normally on-demand at import).
native:
	rm -rf mjpeg423_tpu/native/_build
	$(PY) -c "from mjpeg423_tpu.native import centropy; print('native codec:', centropy.native_available())"

clean:
	rm -rf build dist *.egg-info .oracle_build .jax_cache
	rm -rf mjpeg423_tpu/native/_build
	find . -name __pycache__ -type d -prune -exec rm -rf {} \;

# On-hardware validation (the pytest suite runs on the CPU virtual mesh).
tpu-check:
	$(PY) scripts/tpu_check.py
