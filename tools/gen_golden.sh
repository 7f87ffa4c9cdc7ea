#!/usr/bin/env bash
# Regenerate the golden parity fixtures in tests/golden/ by compiling the
# reference library (read-only at /root/reference) together with the
# fixture-dumper tools/golden_gen.cpp and running it on the vendored datasets.
# Also captures the reference CLI's exact stderr output for format parity.
set -euo pipefail
cd "$(dirname "$0")/.."

EIGEN=${EIGEN:-/opt/venv/lib/python3.12/site-packages/tensorflow/include}
REF=${REF:-/root/reference}
OUT=tests/golden
mkdir -p build "$OUT"

g++ -std=c++17 -O2 -I"$EIGEN" -I"$REF/include" \
    tools/golden_gen.cpp "$REF/src/pls.cpp" -o build/golden_gen
g++ -std=c++17 -O2 -I"$EIGEN" -I"$REF/include" \
    "$REF/src/main.cpp" "$REF/src/pls.cpp" -o build/ref_pls

# toy: 10x15 X, 10x2 Y, A=2, CLI uses 10*N = 100 LSO trials
./build/golden_gen "$REF/toyX.csv" "$REF/toyY.csv" 2 100 "$OUT" toy
# nir: 60x401 X, octane 60x1 Y, A=10, CLI uses 600 LSO trials
./build/golden_gen "$REF/nir.csv" "$REF/octane.csv" 10 600 "$OUT" nir

# reference CLI stderr (the de-facto numerical output of the reference)
./build/ref_pls "$REF/toyX.csv" "$REF/toyY.csv" 2 2>"$OUT/toy_cli_stderr.txt" || true
./build/ref_pls "$REF/nir.csv" "$REF/octane.csv" 10 2>"$OUT/nir_cli_stderr.txt" || true

echo "done; fixtures in $OUT"
