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

# On-hardware tier: when a TPU is attached, run the f32 parity gates and the
# accelerator crosscheck on the actual chip (never concurrently with another
# TPU process).  Skip with SKIP_TPU=1.
if [ "${SKIP_TPU:-0}" != "1" ] && python - <<'EOF'
import sys
try:
    import jax
    sys.exit(0 if jax.default_backend() == "tpu" else 1)
except Exception:
    sys.exit(1)
EOF
then
  echo "== on-TPU parity gates =="
  SDFT_TEST_TPU=1 python -m pytest tests -m tpu -q
  echo "== on-TPU crosscheck ($DFTSIZE $HOPSIZE $WINDOW $LATENCY, f32) =="
  SDFT_CROSSCHECK_BACKEND=tpu python scripts/crosscheck.py \
      "$DFTSIZE" "$HOPSIZE" "$WINDOW" "$LATENCY" "$WAV"
  # f32 error-model gates across the dftsize range (model + measurements
  # documented in scripts/crosscheck.py); the canonical m=1000 ran above
  for M in 512 4096; do
    echo "== on-TPU crosscheck ($M $HOPSIZE $WINDOW $LATENCY, f32) =="
    SDFT_CROSSCHECK_BACKEND=tpu python scripts/crosscheck.py \
        "$M" "$HOPSIZE" "$WINDOW" "$LATENCY" "$WAV"
  done
else
  echo "== no TPU attached; skipping on-hardware tier =="
fi

echo "== examples =="
python examples/latency.py
python examples/stft_window_test.py
python examples/transform.py
python examples/streaming.py
python examples/precision.py

echo "verify OK"
