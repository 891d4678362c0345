"""Compat layer tests: sdft_tpu.SDFT / sdft_tpu.STFT vs the reference API."""

import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/python/src"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_SRC)
    try:
        import sdft as ref_mod
    except ImportError:
        pytest.skip("reference python package not importable")
    finally:
        sys.path.remove(REF_SRC)
    return ref_mod


def test_sdft_class_matches_reference(ref):
    from sdft_tpu.compat import SDFT
    from sdft_tpu import Precision

    rng = np.random.default_rng(0)
    x = rng.standard_normal(700).clip(-1, 1)

    theirs = ref.SDFT(100, "hamming", 0.5)
    ours = SDFT(100, "hamming", 0.5, precision=Precision("float64", "float64"))
    assert ours.size == 100 and ours.window == "hamming" and ours.latency == 0.5

    d_ref = theirs.sdft(x)
    d_ours = ours.sdft(x)
    np.testing.assert_allclose(d_ours, d_ref, atol=1e-7)

    y_ref = theirs.isdft(d_ref)
    y_ours = ours.isdft(d_ours)
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-7)

    # reset + replay reproduces the identical matrix
    ours.reset()
    np.testing.assert_array_equal(ours.sdft(x), d_ours)


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("dftsize", [None, 600])
def test_stft_matches_reference(ref, shift, dftsize):
    from sdft_tpu.compat import STFT

    rng = np.random.default_rng(1)
    x = rng.standard_normal(4096).clip(-1, 1)

    theirs = ref.STFT(framesize=512, hopsize=128, dftsize=dftsize,
                      window="hann", shift=shift)
    ours = STFT(framesize=512, hopsize=128, dftsize=dftsize,
                window="hann", shift=shift)

    d_ref = theirs.stft(x)
    d_ours = ours.stft(x)
    np.testing.assert_allclose(d_ours, d_ref, atol=1e-12)

    y_ref = theirs.istft(d_ref)
    y_ours = ours.istft(d_ours)
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-12)


def test_stft_wola_unity_gain():
    """WOLA round trip reconstructs the interior to near-unity gain
    (python/examples/stft_window_test.py:21-32)."""
    from sdft_tpu.compat import STFT

    rng = np.random.default_rng(2)
    x = rng.standard_normal(8192).clip(-1, 1)
    st = STFT(framesize=1024, hopsize=256, window="hann")
    y = st.istft(st.stft(x))
    core = slice(2048, 6144)
    np.testing.assert_allclose(y[core], x[core], atol=1e-10)
