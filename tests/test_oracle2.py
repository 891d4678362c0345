"""Differential triangle with the second native engine.

The reference proves correctness by cross-checking three independently
written implementations (test/main.py:67-79).  Engine #2
(sdft_tpu/native/sdft_native2.c: C99, bin-major phasor recurrence) closes
this framework's triangle: JAX <-> engine #1 (integer-exponent table)
<-> engine #2.  Agreement between the two native engines is the strongest
check — they share no code, no loop order, and no phase machinery.
"""

import numpy as np
import pytest

from sdft_tpu import Plan, Precision, init_state, sdft, to_complex
from sdft_tpu.oracle import NativeSDFT, NativeSDFT2

F64 = Precision(td="float64", fd="float64")


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.3).clip(-1, 1)


@pytest.mark.parametrize("window", ["boxcar", "hann", "hamming", "blackman"])
def test_engines_agree(window):
    """Engine #1 vs engine #2 across several 2m periods, all windows."""
    m = 48
    x = _signal(7 * m)
    d1 = NativeSDFT(m, window, td_bits=64).sdft(x)
    d2 = NativeSDFT2(m, window, td_bits=64).sdft(x)
    np.testing.assert_allclose(d2, d1, atol=1e-12)


@pytest.mark.parametrize("latency", [1.0, 0.5])
def test_engines_roundtrip_agree(latency):
    m = 48
    x = _signal(5 * m, seed=3)
    e1 = NativeSDFT(m, "hann", latency=latency, td_bits=64)
    e2 = NativeSDFT2(m, "hann", latency=latency, td_bits=64)
    d1, d2 = e1.sdft(x), e2.sdft(x)
    np.testing.assert_allclose(e2.isdft(d2), e1.isdft(d1), atol=1e-12)


def test_engine2_matches_jax():
    m = 48
    x = _signal(6 * m, seed=1)
    d2 = NativeSDFT2(m, "hann", td_bits=64).sdft(x)
    plan = Plan(m, window="hann", precision=F64)
    _, d_jax = sdft(plan, init_state(plan), x)
    np.testing.assert_allclose(to_complex(d_jax), d2, atol=1e-12)


def test_engine2_chunking_invariance():
    """Feeding the stream in uneven chunks is equivalent up to phasor
    re-anchor rounding (the plan-state streaming contract, test/test.c:69-83).

    Engine #2 re-derives the column phasor from cexp at each call instead of
    carrying it, so chunk boundaries differ from the continuous recurrence by
    a few ulps — never more, because both are re-anchored exactly at every
    2m-sample period."""
    m = 32
    x = _signal(4 * m + 7, seed=2)
    whole = NativeSDFT2(m, "blackman", td_bits=64).sdft(x)
    eng = NativeSDFT2(m, "blackman", td_bits=64)
    parts = [eng.sdft(c) for c in np.split(x, [5, 5 + 2 * m, 3 * m + 1])]
    np.testing.assert_allclose(np.concatenate(parts, axis=0), whole,
                               atol=1e-14)


def test_engine2_td_float32_quantization():
    """td_bits=32 quantizes the comb stage identically in both engines."""
    m = 24
    x = _signal(3 * m, seed=4)
    d1 = NativeSDFT(m, "hann", td_bits=32).sdft(x)
    d2 = NativeSDFT2(m, "hann", td_bits=32).sdft(x)
    np.testing.assert_allclose(d2, d1, atol=1e-12)


def test_engine2_reset():
    m = 16
    x = _signal(2 * m, seed=5)
    eng = NativeSDFT2(m, "hann", td_bits=64)
    first = eng.sdft(x)
    eng.reset()
    np.testing.assert_array_equal(eng.sdft(x), first)
