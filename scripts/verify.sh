#!/usr/bin/env bash
# End-to-end verification orchestrator — the analogue of the reference's
# test/main.sh:3-23 (build, run every implementation on the golden WAV with
# DFTSIZE/HOPSIZE/WINDOW/LATENCY, then cross-compare).  Here the
# implementations are (a) the JAX/Pallas framework via the 7-arg CLI driver
# protocol and (b) the native C++ oracle engine; scripts/crosscheck.py runs
# both, asserts the reference tolerances, and checks against the FFT STFT.
set -euo pipefail
cd "$(dirname "$0")/.."

DFTSIZE="${DFTSIZE:-1000}"
HOPSIZE="${HOPSIZE:-100}"
WINDOW="${WINDOW:-hann}"
LATENCY="${LATENCY:-1}"
WAV="${WAV:-/root/reference/test/test.wav}"
PLOT="${PLOT:-}"

echo "== build native oracle =="
make -C sdft_tpu/native

echo "== unit + parity tests =="
python -m pytest tests/ -x -q

echo "== cross-implementation check ($DFTSIZE $HOPSIZE $WINDOW $LATENCY) =="
python scripts/crosscheck.py "$DFTSIZE" "$HOPSIZE" "$WINDOW" "$LATENCY" "$WAV" $PLOT

echo "== examples =="
python examples/latency.py
python examples/stft_window_test.py

echo "verify OK"
