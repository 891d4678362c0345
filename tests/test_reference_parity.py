"""Differential tests against the actual reference implementation.

Imports the reference NumPy implementation from /root/reference (read-only)
and asserts our JAX path reproduces its DFT matrices and round-trip samples
on the real test.wav fixture, at the reference's own cross-implementation
tolerance (test/main.py:79: C vs Python dft atol=1e-7).
"""

import sys

import numpy as np
import pytest

from sdft_tpu import Plan, Precision, init_state, isdft, sdft, to_complex

F64 = Precision(td="float64", fd="float64")

REF_SRC = "/root/reference/python/src"


@pytest.fixture(scope="module")
def ref_sdft_module():
    sys.path.insert(0, REF_SRC)
    try:
        import sdft as ref
    except ImportError:
        pytest.skip("reference python package not importable")
    finally:
        sys.path.remove(REF_SRC)
    return ref


@pytest.mark.parametrize("window,m,latency", [
    ("boxcar", 512, 1.0),      # BASELINE.json config 1
    ("hann", 1024, 1.0),       # BASELINE.json config 2
    ("hamming", 256, 0.5),     # BASELINE.json config 4
    ("blackman", 256, 0.25),   # BASELINE.json config 4
])
def test_dft_matrix_parity_on_test_wav(ref_sdft_module, test_wav, window, m, latency):
    x, _ = test_wav
    x = x[:4 * m + 500]  # past the 2m boundary, keep runtime sane

    ref = ref_sdft_module.SDFT(m, window, latency)
    want = ref.sdft(x)

    plan = Plan(m, window=window, latency=latency, precision=F64)
    state = init_state(plan)
    _, got = sdft(plan, state, x)

    np.testing.assert_allclose(to_complex(got), want, atol=1e-7)


def test_roundtrip_parity_on_test_wav(ref_sdft_module, test_wav):
    x, _ = test_wav
    m, hop = 250, 100
    n = 40 * hop
    x = x[:n]

    ref = ref_sdft_module.SDFT(m, "hann", 1)
    ys_ref = []
    for i in range(0, n, hop):
        d = ref.sdft(x[i:i + hop])
        ys_ref.append(ref.isdft(d))
    y_ref = np.concatenate(ys_ref)

    plan = Plan(m, window="hann", precision=F64)
    state = init_state(plan)
    ys = []
    for i in range(0, n, hop):
        state, d = sdft(plan, state, x[i:i + hop])
        ys.append(np.asarray(isdft(plan, d)))
    y = np.concatenate(ys)

    np.testing.assert_allclose(y, y_ref, atol=1e-7)


def test_multichannel_endless_streaming_m4096():
    """BASELINE.json config 5: multi-channel endless streaming at m=4096
    with chunked block processing and carry state — chunking invariance
    (any hop partition yields the same output, the plan-state contract of
    test/test.c:69-83) at the flagship dftsize, multi-channel."""
    from sdft_tpu import Plan, Precision, init_state, roundtrip
    from sdft_tpu.stream import Streamer, iter_blocks

    plan = Plan(4096, window="hann",
                precision=Precision("float64", "float64"))
    C, n = 2, 3 * 4096
    rng = np.random.default_rng(12)
    x = np.clip(rng.standard_normal((C, n)), -3, 3) / 2

    # one-shot
    st = init_state(plan, channels=C)
    _, y_once = roundtrip(plan, st, x)

    # chunked with carried state, two different partitions
    for block in (1024, 4096):
        s = Streamer(plan, channels=C)
        y_parts = [np.asarray(s.roundtrip(b)) for b in iter_blocks(x, block)]
        y_chunked = np.concatenate(y_parts, axis=-1)
        np.testing.assert_allclose(y_chunked, np.asarray(y_once), atol=1e-12)
        assert s.samples_processed == n
