"""Native C++ oracle: build, parity vs reference Python and vs the JAX path.

Completes the differential-testing triangle (reference strategy,
test/main.py:67-79): reference-python <-> native-oracle <-> JAX path.
"""

import sys

import numpy as np
import pytest

from sdft_tpu import Plan, Precision, init_state, isdft, sdft, to_complex
from sdft_tpu.oracle import NativeSDFT

REF_SRC = "/root/reference/python/src"
F64 = Precision(td="float64", fd="float64")


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.3).clip(-1, 1)


@pytest.mark.parametrize("window", ["boxcar", "hann", "hamming", "blackman"])
def test_oracle_matches_jax(window):
    m = 48
    x = _signal(6 * m)

    oracle = NativeSDFT(m, window, td_bits=64)
    d_native = oracle.sdft(x)

    plan = Plan(m, window=window, precision=F64)
    _, d_jax = sdft(plan, init_state(plan), x)

    np.testing.assert_allclose(to_complex(d_jax), d_native, atol=1e-12)


@pytest.mark.parametrize("latency", [1.0, 0.5])
def test_oracle_isdft_matches_jax(latency):
    m = 48
    rng = np.random.default_rng(3)
    dfts = (rng.standard_normal((20, m)) + 1j * rng.standard_normal((20, m))) / m

    oracle = NativeSDFT(m, "hann", latency, td_bits=64)
    y_native = oracle.isdft(dfts)

    plan = Plan(m, window="hann", latency=latency, precision=F64)
    y_jax = np.asarray(isdft(plan, dfts))

    np.testing.assert_allclose(y_jax, y_native, atol=1e-12)


def test_oracle_matches_reference_python():
    sys.path.insert(0, REF_SRC)
    try:
        import sdft as ref_mod
    except ImportError:
        pytest.skip("reference python package not importable")
    finally:
        sys.path.remove(REF_SRC)

    m = 100
    x = _signal(5 * m, seed=7)

    theirs = ref_mod.SDFT(m, "hann", 1)
    d_ref = theirs.sdft(x)
    y_ref = theirs.isdft(d_ref)

    ours = NativeSDFT(m, "hann", 1.0, td_bits=64)
    d = ours.sdft(x)
    y = ours.isdft(d)

    np.testing.assert_allclose(d, d_ref, atol=1e-9)
    np.testing.assert_allclose(y, y_ref, atol=1e-9)


def test_oracle_reset_and_streaming():
    m = 32
    x = _signal(4 * m, seed=9)
    oracle = NativeSDFT(m, "hann", td_bits=64)

    whole = oracle.sdft(x)
    oracle.reset()
    chunked = np.concatenate([oracle.sdft(x[:50]), oracle.sdft(x[50:])])
    np.testing.assert_array_equal(whole, chunked)


def test_oracle_td_float32_quantization():
    """td_bits=32 quantizes the comb stage like reference C's float TD."""
    m = 32
    x = _signal(3 * m, seed=11)
    d32 = NativeSDFT(m, "hann", td_bits=32).sdft(x)
    d64 = NativeSDFT(m, "hann", td_bits=64).sdft(x)
    # close but not identical
    np.testing.assert_allclose(d32, d64, atol=1e-6)
    assert np.abs(d32 - d64).max() > 0
