# Developer entry points for pls-tpu.
#
# Mirrors the intent of the reference's Makefile (/root/reference/Makefile)
# but for a Python/JAX project: build native bits, test, bench, regenerate
# golden parity fixtures.

.PHONY: native predictor test test-fast bench golden clean

native:
	python setup.py build_ext --inplace

predictor:
	g++ -std=c++17 -O2 -o pls_predict native/pls_predict_main.cpp

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

golden:
	tools/gen_golden.sh

clean:
	rm -rf build pls_predict pls_tpu/_native*.so pls_tpu/__pycache__ */__pycache__
