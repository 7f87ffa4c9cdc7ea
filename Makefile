# Developer entry points for pls-tpu.
#
# Mirrors the intent of the reference's Makefile (/root/reference/Makefile)
# but for a Python/JAX project: build native bits, test, bench, regenerate
# golden parity fixtures.

.PHONY: native predictor test test-fast nan-check bench golden clean prewarm tpu-test ingest-bench

native:
	python setup.py build_ext --inplace

predictor:
	g++ -std=c++17 -O2 -o pls_predict native/pls_predict_main.cpp

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

# NaN-sanitizer pass: the whole fast suite under jax_debug_nans — every
# jitted program re-checked for silent NaN production (utils/debug.py
# provides the scoped context manager for library use).
nan-check:
	JAX_DEBUG_NANS=1 python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

# Populate the persistent XLA compilation cache (tools/prewarm.py) so
# benches/tests on relay-attached TPUs skip the cold-compile tax.
prewarm:
	python tools/prewarm.py --profile all

# Hardware parity gate: kernel exactness + fit parity + auto-dispatch on
# the real TPU (tests marked `tpu`; skipped in the CPU-forced suite).
tpu-test:
	PLS_TPU_HW=1 python -m pytest tests/test_tpu_hw.py -v -m tpu

# Disk-fed north-star measurement (benchmarks/ingest_bench.py), phased
# so each process's relay host-memory footprint stays bounded; the 40 GB
# dataset generates once into $(NS_DATA) and is reused.
NS_DATA ?= /root/ns_data
NS_ART ?= benchmarks/results/ingest_northstar.json
ingest-bench:
	python benchmarks/ingest_bench.py --datadir $(NS_DATA) --phase probe --out $(NS_ART)
	python benchmarks/ingest_bench.py --datadir $(NS_DATA) --phase stats --out $(NS_ART)
	python benchmarks/ingest_bench.py --datadir $(NS_DATA) --phase cv --out $(NS_ART)
	python benchmarks/ingest_bench.py --datadir $(NS_DATA) --phase kfold --kfold 10 --out $(NS_ART)

golden:
	tools/gen_golden.sh

clean:
	rm -rf build pls_predict pls_tpu/_native*.so pls_tpu/__pycache__ */__pycache__
