"""Accumulator refresh: exact rebuild of the carry from the delayline.

The comb stage telescopes, so in exact arithmetic the accumulator equals a
windowed DFT of the last 2m samples (see ops.analysis.refresh_state).  These
tests pin that identity in f64, show it heals accumulated f32 drift on long
streams, and exercise the Streamer wiring.
"""

import numpy as np
import pytest

from sdft_tpu import (
    Plan,
    Precision,
    Streamer,
    init_state,
    iter_blocks,
    refresh,
    sdft,
)

F32 = Precision(td="float32", fd="float32")
F64 = Precision(td="float64", fd="float64")


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).clip(-1, 1)


def test_refresh_is_identity_in_f64():
    """In double precision the rebuilt accumulator must match the running sum
    to roundoff — the telescoping identity itself."""
    m = 64
    plan = Plan(m, window="hann", precision=F64)
    state = init_state(plan)
    # stream long enough to wrap the 2m period several times, odd block size
    # so block boundaries don't align with the period
    for blk in iter_blocks(_signal(7 * 2 * m), 56):
        state, _ = sdft(plan, state, blk)
    fresh = refresh(plan, state)
    assert int(fresh.offset) == int(state.offset)
    np.testing.assert_array_equal(np.asarray(fresh.delayline),
                                  np.asarray(state.delayline))
    np.testing.assert_allclose(np.asarray(fresh.accumulator),
                               np.asarray(state.accumulator),
                               atol=1e-12, rtol=1e-10)


def test_refresh_heals_f32_drift():
    """After a long f32 stream the running accumulator drifts away from the
    exact (f64) value; refresh must land closer than the drifted carry."""
    m = 64
    n_blocks = 400
    blk_len = 96
    x = _signal(n_blocks * blk_len, seed=1)

    plan32 = Plan(m, precision=F32)
    plan64 = Plan(m, precision=F64)
    s32, s64 = init_state(plan32), init_state(plan64)
    for blk in iter_blocks(x, blk_len):
        s32, _ = sdft(plan32, s32, blk.astype(np.float32))
        s64, _ = sdft(plan64, s64, blk)

    exact = np.asarray(s64.accumulator)
    drifted = np.abs(np.asarray(s32.accumulator) - exact).max()
    healed = np.abs(np.asarray(refresh(plan32, s32).accumulator) - exact).max()
    # the rebuilt value is one windowed sum of 2m f32 terms; the running sum
    # carries n_blocks * blk_len adds worth of cancelled history
    assert healed < drifted
    assert healed < 5e-5


def test_refreshed_state_is_drop_in_continuation():
    """Spectra after a refresh match spectra without one (f64: exactly up to
    roundoff) — the refreshed carry continues the same stream."""
    m = 64
    plan = Plan(m, window="blackman", precision=F64)
    x = _signal(6 * m, seed=2)
    head, tail = x[: 4 * m], x[4 * m:]

    state, _ = sdft(plan, init_state(plan), head)
    _, want = sdft(plan, state, tail)
    _, got = sdft(plan, refresh(plan, state), tail)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-12, rtol=1e-9)


def test_refresh_batched_and_roi():
    m = 64
    plan = Plan(m, precision=F64, roi=(8, 40))
    xs = np.stack([_signal(3 * m, seed=3), _signal(3 * m, seed=4)])
    states = init_state(plan, channels=2)
    states, _ = sdft(plan, states, xs)
    fresh = refresh(plan, states)
    np.testing.assert_allclose(np.asarray(fresh.accumulator),
                               np.asarray(states.accumulator),
                               atol=1e-12, rtol=1e-10)
    # ROI bins carry signal; outside-ROI bins stay exactly zero
    acc = np.asarray(fresh.accumulator)
    assert acc[:, 8:40].any()
    assert np.all(acc[:, :8] == 0) and np.all(acc[:, 40:] == 0)


@pytest.mark.parametrize("channels", [None, 2])
def test_streamer_refresh_every(channels):
    """refresh_every must not change the synthesized output beyond roundoff."""
    m = 64
    plan = Plan(m, precision=F64)
    n = 8 * m
    if channels:
        x = np.stack([_signal(n, seed=5), _signal(n, seed=6)])
    else:
        x = _signal(n, seed=5)

    plain = Streamer(plan, channels=channels)
    healed = Streamer(plan, channels=channels, refresh_every=2)
    want = np.concatenate(list(plain.run(iter_blocks(x, m))), axis=-1)
    got = np.concatenate(list(healed.run(iter_blocks(x, m))), axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-12, rtol=1e-9)
    assert healed._blocks_since_refresh < 2
