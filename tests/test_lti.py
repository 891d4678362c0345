"""Collapsed LTI round trip (sdft_tpu.ops.lti) vs the scan path.

The LTI formulation must be algebraically identical to
isdft_block(sdft_block(.)) — same output up to rounding, bit-compatible
carry semantics — for every window, latency, precision, ROI, block length
and batching (reference behavior: c/src/sdft/sdft.h:562-657 composed).
"""

import numpy as np
import pytest

from sdft_tpu import Plan, Precision, init_state, roundtrip
from sdft_tpu.state import State
from sdft_tpu.ops.analysis import sdft_block
from sdft_tpu.ops.lti import roundtrip_block_lti
from sdft_tpu.ops.synthesis import isdft_block

F64 = Precision("float64", "float64")
F32 = Precision("float32", "float32")


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(rng.standard_normal(n), -3, 3) / 2


def _scan_roundtrip(plan, state, x):
    state, d = sdft_block(plan, state, x)
    return state, np.asarray(isdft_block(plan, d))


@pytest.mark.parametrize("window", ["boxcar", "hann", "hamming", "blackman"])
@pytest.mark.parametrize("latency", [1.0, 0.5])
def test_lti_matches_scan_path(window, latency):
    m, M = 128, 512
    plan = Plan(m, window=window, latency=latency, precision=F64)
    x = _signal(3 * M)

    s_ref = init_state(plan)
    s_lti = init_state(plan)
    for b in range(3):
        blk = x[b * M:(b + 1) * M]
        s_ref, y_ref = _scan_roundtrip(plan, s_ref, blk)
        s_lti, y_lti = roundtrip_block_lti(plan, s_lti, blk)
        np.testing.assert_allclose(np.asarray(y_lti), y_ref, atol=1e-12)
    # carry state stays interchangeable between the two forms
    np.testing.assert_allclose(np.asarray(s_lti.accumulator),
                               np.asarray(s_ref.accumulator), atol=1e-11)
    np.testing.assert_array_equal(np.asarray(s_lti.offset),
                                  np.asarray(s_ref.offset))


def test_lti_non_multiple_block_and_f32():
    """Arbitrary block lengths are zero-padded internally without perturbing
    the carry; f32 stays in the f32-rounding class of the scan path."""
    m = 64
    plan = Plan(m, precision=F32)
    x = _signal(1000).astype(np.float32)

    s_ref = init_state(plan)
    s_lti = init_state(plan)
    y_ref = []
    y_lti = []
    for lo, hi in [(0, 100), (100, 477), (477, 1000)]:  # ragged chunking
        s_ref, y = _scan_roundtrip(plan, s_ref, x[lo:hi])
        y_ref.append(y)
        s_lti, y = roundtrip_block_lti(plan, s_lti, x[lo:hi])
        y_lti.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(y_lti), np.concatenate(y_ref),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(s_lti.accumulator),
                               np.asarray(s_ref.accumulator), atol=5e-5)


def test_lti_roi_plan():
    plan = Plan(128, window="hann", roi=(10, 100), precision=F64)
    x = _signal(512)
    s_ref, y_ref = _scan_roundtrip(plan, init_state(plan), x)
    s_lti, y_lti = roundtrip_block_lti(plan, init_state(plan), x)
    np.testing.assert_allclose(np.asarray(y_lti), y_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_lti.accumulator),
                               np.asarray(s_ref.accumulator), atol=1e-12)


def test_lti_state_interchangeable_with_sdft():
    """A stream can alternate between roundtrip() and sdft()/isdft() calls:
    the carry means the same thing in both forms."""
    m, M = 64, 256
    plan = Plan(m, precision=F64)
    x = _signal(3 * M)

    s_ref = init_state(plan)
    out_ref = []
    for b in range(3):
        s_ref, y = _scan_roundtrip(plan, s_ref, x[b * M:(b + 1) * M])
        out_ref.append(y)

    s = init_state(plan)
    out = []
    s, y = roundtrip_block_lti(plan, s, x[:M])          # LTI block
    out.append(np.asarray(y))
    s, y = _scan_roundtrip(plan, s, x[M:2 * M])          # scan block
    out.append(y)
    s, y = roundtrip_block_lti(plan, s, x[2 * M:])       # LTI again
    out.append(np.asarray(y))

    np.testing.assert_allclose(np.concatenate(out), np.concatenate(out_ref),
                               atol=1e-12)


def test_public_roundtrip_batched():
    plan = Plan(64, precision=F64)
    x = _signal(4 * 256).reshape(4, 256)
    state = init_state(plan, channels=4)
    state, y = roundtrip(plan, state, x)
    assert np.asarray(y).shape == (4, 256)
    for ch in range(4):
        _, y_ref = _scan_roundtrip(plan, init_state(plan), x[ch])
        np.testing.assert_allclose(np.asarray(y)[ch], y_ref, atol=1e-12)


def test_batched_lti_matches_per_channel_streaming():
    """The channel-folded GEMM form equals C independent 1-channel streams,
    including desynchronized per-channel offsets carried across blocks."""
    plan = Plan(128, window="blackman", latency=0.5, precision=F64)
    C, M = 3, 512
    x = _signal(C * 2 * M, seed=7).reshape(C, 2 * M)

    # desynchronize offsets: feed channel c a prefix of c*37 samples first
    states = []
    for c in range(C):
        s = init_state(plan)
        if c:
            s, _ = roundtrip_block_lti(plan, s, np.zeros(37 * c))
        states.append(s)
    sb = State(
        offset=np.stack([np.asarray(s.offset) for s in states]),
        delayline=np.stack([np.asarray(s.delayline) for s in states]),
        accumulator=np.stack([np.asarray(s.accumulator) for s in states]),
    )

    for b in range(2):
        blk = x[:, b * M:(b + 1) * M]
        sb, yb = roundtrip_block_lti(plan, sb, blk)
        for c in range(C):
            states[c], y1 = roundtrip_block_lti(plan, states[c], blk[c])
            np.testing.assert_allclose(np.asarray(yb)[c], np.asarray(y1),
                                       atol=1e-13)
    for c in range(C):
        np.testing.assert_allclose(np.asarray(sb.accumulator)[c],
                                   np.asarray(states[c].accumulator),
                                   atol=1e-13)
        assert int(sb.offset[c]) == int(states[c].offset)


def test_streamer_uses_fused_roundtrip():
    from sdft_tpu import Streamer, iter_blocks

    plan = Plan(64, precision=F64)
    x = _signal(1024)
    s = Streamer(plan)
    assert s._fused_roundtrip
    got = np.concatenate(list(s.run(iter_blocks(x, 256))))
    _, want = _scan_roundtrip(plan, init_state(plan), x)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sdft_hopped_matches_sliced_full():
    """Hopped analysis equals slicing the full spectra at hop starts,
    chained across blocks (the reference driver protocol, test/test.c:82)."""
    from sdft_tpu import sdft, sdft_hopped

    m, M, hop = 128, 512, 100
    plan = Plan(m, window="hamming", precision=F64)
    x = _signal(3 * M, seed=11)

    s_full = init_state(plan)
    s_hop = init_state(plan)
    for b in range(3):
        blk = x[b * M:(b + 1) * M]
        s_full, d_full = sdft(plan, s_full, blk)
        s_hop, d_hop = sdft_hopped(plan, s_hop, blk, hop)
        np.testing.assert_allclose(np.asarray(d_hop),
                                   np.asarray(d_full)[::hop], atol=1e-14)
    np.testing.assert_allclose(np.asarray(s_hop.accumulator),
                               np.asarray(s_full.accumulator), atol=1e-12)


@pytest.mark.parametrize("hop", [1, 2, 3, 5, 7])
def test_sdft_hopped_degenerate_matches_sliced_full(hop):
    """hop < 8 rides the stepped multi-hop tiles; must equal slicing the
    full spectra at hop starts, chained across blocks (independent of the
    fused-driver machinery that shares the stepped identity)."""
    from sdft_tpu import sdft, sdft_hopped

    m = 96
    plan = Plan(m, window="blackman", precision=F64, roi=(4, 90))
    B = hop * 24 + hop - 1          # partial last hop: spectrum still due
    x = _signal(2 * B, seed=13)

    s_full = init_state(plan)
    s_hop = init_state(plan)
    for b in range(2):
        blk = x[b * B:(b + 1) * B]
        s_full, d_full = sdft(plan, s_full, blk)
        s_hop, d_hop = sdft_hopped(plan, s_hop, blk, hop)
        assert np.asarray(d_hop).shape == (-(-B // hop), m, 2)
        np.testing.assert_allclose(np.asarray(d_hop),
                                   np.asarray(d_full)[::hop], atol=1e-13)
    np.testing.assert_allclose(np.asarray(s_hop.accumulator),
                               np.asarray(s_full.accumulator), atol=1e-12)


def test_sdft_hopped_batched():
    from sdft_tpu import sdft, sdft_hopped

    plan = Plan(64, precision=F64)
    x = _signal(3 * 256, seed=12).reshape(3, 256)
    state = init_state(plan, channels=3)
    state, d = sdft_hopped(plan, state, x, 32)
    assert np.asarray(d).shape == (3, 8, 64, 2)
    _, d_full = sdft(plan, init_state(plan, channels=3), x)
    np.testing.assert_allclose(np.asarray(d),
                               np.asarray(d_full)[:, ::32], atol=1e-14)


def test_roundtrip_hopped_chain_matches_blockwise():
    """The chained driver-protocol program equals the per-block composition
    of sdft_hopped + roundtrip (the reference's hop loop, test/test.c:69-83),
    for every refresh cadence."""
    from sdft_tpu import roundtrip_hopped, sdft_hopped
    from sdft_tpu.ops.analysis import refresh_state

    plan = Plan(96, window="hann", precision=F64)
    hop, B, nb = 16, 128, 5
    x = _signal(nb * B, seed=3)
    xs = x.reshape(nb, B)

    for refresh_every in (None, 1, 2):
        st_chain = init_state(plan)
        st_chain, hd, ys = roundtrip_hopped(plan, st_chain, xs, hop,
                                            refresh_every=refresh_every)
        assert hd.shape == (nb, B // hop, 96, 2)
        assert ys.shape == (nb, B)

        st_ref = init_state(plan)
        since = 0
        for b in range(nb):
            _, hd_b = sdft_hopped(plan, st_ref, xs[b], hop)
            st_ref, y_b = roundtrip(plan, st_ref, xs[b])
            if refresh_every is not None:
                since += 1
                if since >= refresh_every:
                    st_ref = refresh_state(plan, st_ref)
                    since = 0
            np.testing.assert_allclose(np.asarray(hd[b]), np.asarray(hd_b),
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(ys[b]), np.asarray(y_b),
                                       atol=1e-12)
        np.testing.assert_allclose(np.asarray(st_chain.accumulator),
                                   np.asarray(st_ref.accumulator), atol=1e-12)
        np.testing.assert_allclose(np.asarray(st_chain.delayline),
                                   np.asarray(st_ref.delayline), atol=0)


@pytest.mark.parametrize("hop", [1, 2, 3, 5, 7])
def test_roundtrip_hopped_chain_degenerate_hops(hop):
    """hop < 8 routes through the multi-hop-tile fused body (the stepped
    partial-totals GEMM) and must equal the per-block composition of
    sdft_hopped + roundtrip — the reference's founding claim is efficiency
    at 1-sample hops (/root/reference/README.md:18)."""
    from sdft_tpu import roundtrip_hopped, sdft_hopped
    from sdft_tpu.ops.analysis import refresh_state

    plan = Plan(96, window="hann", precision=F64)
    B, nb = hop * 16, 3
    x = _signal(nb * B, seed=9)
    xs = x.reshape(nb, B)

    st_chain = init_state(plan)
    st_chain, hd, ys = roundtrip_hopped(plan, st_chain, xs, hop)
    assert hd.shape == (nb, B // hop, 96, 2)
    assert ys.shape == (nb, B)

    st_ref = init_state(plan)
    for b in range(nb):
        _, hd_b = sdft_hopped(plan, st_ref, xs[b], hop)
        st_ref, y_b = roundtrip(plan, st_ref, xs[b])
        st_ref = refresh_state(plan, st_ref)
        np.testing.assert_allclose(np.asarray(hd[b]), np.asarray(hd_b),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(ys[b]), np.asarray(y_b),
                                   atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_chain.accumulator),
                               np.asarray(st_ref.accumulator), atol=1e-12)


def test_roundtrip_hopped_chain_hop1_roi_and_channels():
    """Degenerate-hop path under ROI and channel batching; tile-target
    tuning via k_tile changes nothing numerically."""
    from sdft_tpu import roundtrip_hopped, sdft_hopped

    plan = Plan(64, window="hamming", precision=F64, roi=(8, 40))
    B, nb, C = 24, 2, 2
    x = _signal(nb * C * B, seed=10).reshape(nb, C, B)

    st = init_state(plan, channels=C)
    st, hd, ys = roundtrip_hopped(plan, st, x, 1)
    assert hd.shape == (nb, C, B, 64, 2)
    import jax

    from sdft_tpu.ops.analysis import refresh_state

    st_ref = init_state(plan, channels=C)
    for b in range(nb):
        _, hd_b = sdft_hopped(plan, st_ref, x[b], 1)
        st_ref, y_b = roundtrip(plan, st_ref, x[b])
        st_ref = jax.vmap(lambda s: refresh_state(plan, s))(st_ref)
        np.testing.assert_allclose(np.asarray(hd[b]), np.asarray(hd_b),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(ys[b]), np.asarray(y_b),
                                   atol=1e-12)

    st2 = init_state(plan, channels=C)
    _, hd2, ys2 = roundtrip_hopped(plan, st2, x, 1, k_tile=16)
    np.testing.assert_allclose(np.asarray(hd2), np.asarray(hd), atol=1e-13)
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys), atol=1e-13)


def test_roundtrip_hopped_chain_batched_channels():
    from sdft_tpu import roundtrip_hopped

    plan = Plan(64, window="hamming", precision=F64)
    hop, B, nb, C = 8, 64, 3, 2
    x = _signal(nb * C * B, seed=4).reshape(nb, C, B)

    st = init_state(plan, channels=C)
    st, hd, ys = roundtrip_hopped(plan, st, x, hop)
    assert hd.shape == (nb, C, B // hop, 64, 2)
    assert ys.shape == (nb, C, B)
    # channel c of the batch == an independent mono stream
    for c in range(C):
        st1 = init_state(plan)
        st1, hd1, ys1 = roundtrip_hopped(plan, st1, x[:, c], hop)
        np.testing.assert_allclose(np.asarray(hd[:, c]), np.asarray(hd1),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(ys[:, c]), np.asarray(ys1),
                                   atol=1e-12)


def test_roundtrip_hopped_validates_shapes():
    from sdft_tpu import roundtrip_hopped

    plan = Plan(64, precision=F64)
    st = init_state(plan)
    with pytest.raises(ValueError, match="multiple of hop"):
        roundtrip_hopped(plan, st, np.zeros((2, 65)), 8)
    with pytest.raises(ValueError, match="blocks must be"):
        roundtrip_hopped(plan, st, np.zeros(64), 8)


def test_split4_mxu_mode_parity_class():
    """The "split4" throughput mode (4-pass masked bf16 split GEMMs) must
    track the exact-f32 path within its documented ~2^-16 relative class,
    with identical carry semantics."""
    plan4 = Plan(96, window="hann",
                 precision=Precision("float32", "float32", mxu="split4"))
    planH = Plan(96, window="hann", precision=F32)
    x = _signal(384, seed=6).astype(np.float32)

    s4, sh = init_state(plan4), init_state(planH)
    s4, y4 = roundtrip_block_lti(plan4, s4, x)
    sh, yh = roundtrip_block_lti(planH, sh, x)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(yh), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s4.accumulator),
                               np.asarray(sh.accumulator), atol=1e-2)
    # second block: carried state stays interchangeable at the same class
    s4, y4b = roundtrip_block_lti(plan4, s4, x)
    sh, yhb = roundtrip_block_lti(planH, sh, x)
    np.testing.assert_allclose(np.asarray(y4b), np.asarray(yhb), atol=1e-3)


def test_split4_chained_driver_protocol():
    """Regression: the chained driver protocol must accept split4 plans
    (it selects the split consts like roundtrip_block_lti does), with the
    hop spectra staying on the exact-f32 path bit-identically."""
    from sdft_tpu import roundtrip_hopped

    x = _signal(3 * 128, seed=8).astype(np.float32).reshape(3, 128)
    plan4 = Plan(96, precision=Precision("float32", "float32", mxu="split4"))
    planH = Plan(96, precision=Precision("float32", "float32"))

    s4, hd4, y4 = roundtrip_hopped(plan4, init_state(plan4), x, 32)
    sh, hdh, yh = roundtrip_hopped(planH, init_state(planH), x, 32)
    np.testing.assert_array_equal(np.asarray(hd4), np.asarray(hdh))
    np.testing.assert_allclose(np.asarray(y4), np.asarray(yh), atol=1e-3)


def test_driver_segment_matches_scan_chain():
    """The scan-free batched segment (ops.lti._driver_segment_nd,
    roundtrip_hopped_chain(segment=True)) equals the scanned fused chain —
    hop spectra, synthesized samples and carried state — for single and
    batched channels."""
    from sdft_tpu.ops.lti import roundtrip_hopped_chain

    plan = Plan(96, window="hann", precision=F64)
    hop, B, nb = 16, 128, 5
    x = _signal(nb * B, seed=13)

    st_a, hd_a, ys_a = roundtrip_hopped_chain(
        plan, init_state(plan), x.reshape(nb, B), hop)
    st_b, hd_b, ys_b = roundtrip_hopped_chain(
        plan, init_state(plan), x.reshape(nb, B), hop, segment=True)
    np.testing.assert_allclose(np.asarray(hd_b), np.asarray(hd_a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_b.accumulator),
                               np.asarray(st_a.accumulator), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(st_b.delayline),
                                  np.asarray(st_a.delayline))

    C = 2
    xs_c = _signal(nb * C * B, seed=14).reshape(nb, C, B)
    st_a, hd_a, ys_a = roundtrip_hopped_chain(
        plan, init_state(plan, channels=C), xs_c, hop)
    st_b, hd_b, ys_b = roundtrip_hopped_chain(
        plan, init_state(plan, channels=C), xs_c, hop, segment=True)
    np.testing.assert_allclose(np.asarray(hd_b), np.asarray(hd_a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_a), atol=1e-12)
