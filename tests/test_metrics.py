"""Quality-metric utilities (reference formula: python/examples/latency.py:50-57)."""

import numpy as np
import pytest

from sdft_tpu import Plan, init_state, isdft, sdft
from sdft_tpu.metrics import align_roundtrip, roundtrip_snr_db, snr_db


def test_snr_db_known_values():
    x = np.ones(1000)
    assert snr_db(x, x) == float("inf")
    # noise at exactly -20 dB relative power
    y = x + np.full(1000, 0.1)
    assert snr_db(x, y) == pytest.approx(20.0, abs=1e-9)
    with pytest.raises(ValueError):
        snr_db(x, x[:10])


def test_align_roundtrip_matches_reference_slicing():
    x = np.arange(10.0)
    y = np.arange(10.0) + 100
    xa, ya = align_roundtrip(x, y, 3)
    np.testing.assert_array_equal(xa, x[:7])
    np.testing.assert_array_equal(ya, y[3:])
    with pytest.raises(ValueError):
        align_roundtrip(x, y, 10)


@pytest.mark.parametrize("latency", [1.0, 0.5])
def test_roundtrip_snr_gate(latency):
    """The SNR trend of the reference latency example: the windowed round
    trip is not perfect reconstruction, but full latency beats reduced
    latency and both stay meaningful (python/examples/latency.py:24-70)."""
    m = 256
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal(8 * m), -2, 2) / 2
    plan = Plan(m, window="hann", latency=latency)
    state = init_state(plan)
    _, dfts = sdft(plan, state, x)
    y = np.asarray(isdft(plan, dfts), dtype=np.float64)
    snr = roundtrip_snr_db(x, y, plan)
    assert snr > (20.0 if latency == 1.0 else 12.0), snr
    # delay= keyword is equivalent to passing the plan
    assert snr == pytest.approx(
        roundtrip_snr_db(x, y, delay=plan.synthesis_delay))
