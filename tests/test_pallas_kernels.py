"""Pallas kernels (interpret mode on CPU) vs the XLA reference path."""

import numpy as np
import pytest

from sdft_tpu import Plan, Precision, init_state, isdft, sdft
from sdft_tpu.kernels import (
    forward_block_pallas,
    plan_supported,
    roundtrip_block_fused,
)

F32 = Precision(td="float32", fd="float32")


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).clip(-1, 1).astype(np.float32)


def _accumulator_f64(m, x):
    """f64 oracle for the carried accumulator after one block from rest:
    acc[i] = sum_k delta[k] * T_i^((k) mod 2m) with delta = x - x[k-2m]."""
    n2 = 2 * m
    x = np.asarray(x, np.float64)
    delta = x - np.pad(x, (n2, 0))[: x.size]
    k = np.arange(x.size)
    i = np.arange(m)
    ph = np.exp(-1j * (np.pi / m) * ((k[:, None] * i[None, :]) % n2))
    acc = (delta[:, None] * ph).sum(axis=0)
    return np.stack([acc.real, acc.imag], axis=-1)


@pytest.mark.parametrize("window", ["boxcar", "hann", "hamming", "blackman"])
def test_forward_kernel_matches_xla(window):
    m = 256
    M = 3 * 128
    x = _signal(M)
    plan = Plan(m, window=window, precision=F32)
    assert plan_supported(plan, M)

    state = init_state(plan)
    want_state, want = sdft(plan, state, x)

    got_state, got = forward_block_pallas(plan, state, x, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-4)
    # The carried accumulator is an f32 sum over the whole block; Pallas's
    # intra-block scan and XLA's cumsum reduce in different orders, so gate
    # each backend against the f64 oracle with an eps-proportional bound
    # (k * eps32 * M covers any summation order of M unit-bounded terms)
    # instead of widening the pairwise tolerance.
    acc64 = _accumulator_f64(m, x)
    bound = 4 * np.finfo(np.float32).eps * M
    for acc in (got_state.accumulator, want_state.accumulator):
        err = np.abs(np.asarray(acc, np.float64) - acc64).max()
        assert err < bound, (err, bound)
    assert int(got_state.offset) == int(want_state.offset)
    np.testing.assert_array_equal(np.asarray(got_state.delayline),
                                  np.asarray(want_state.delayline))


@pytest.mark.parametrize("latency", [1.0, 0.5])
def test_roundtrip_kernel_matches_xla(latency):
    m = 256
    M = 4 * 128
    x = _signal(M, seed=1)
    plan = Plan(m, window="hann", latency=latency, precision=F32)

    state = init_state(plan)
    _, dfts = sdft(plan, state, x)
    want = np.asarray(isdft(plan, dfts))

    state = init_state(plan)
    _, y = roundtrip_block_fused(plan, state, x, interpret=True)

    np.testing.assert_allclose(np.asarray(y), want, atol=5e-4, rtol=1e-3)


def test_kernel_streaming_carry():
    """Two kernel blocks chain identically to one (offset + acc carry),
    including across the 2m phase boundary."""
    m = 256
    M = 4 * 128  # 512 = 2m: second block starts exactly at the phase reset
    x = _signal(2 * M, seed=2)
    plan = Plan(m, precision=F32)

    state = init_state(plan)
    _, want = sdft(plan, state, x)
    want = np.asarray(want)

    state = init_state(plan)
    state, d1 = forward_block_pallas(plan, state, x[:M], interpret=True)
    state, d2 = forward_block_pallas(plan, state, x[M:], interpret=True)
    got = np.concatenate([np.asarray(d1), np.asarray(d2)])

    np.testing.assert_allclose(got, want, atol=5e-6, rtol=1e-4)


def test_planar_layout_matches_packed():
    """layout="planar" is the same spectra without the interleaving pass —
    on both the Pallas kernel and the XLA fallback (api.sdft)."""
    m = 256
    M = 2 * 128
    x = _signal(M, seed=3)
    plan = Plan(m, precision=F32)

    state = init_state(plan)
    st_p, packed = forward_block_pallas(plan, state, x, interpret=True)
    st_q, (re, im) = forward_block_pallas(plan, state, x, interpret=True,
                                          layout="planar")
    packed = np.asarray(packed)
    np.testing.assert_array_equal(np.asarray(re), packed[..., 0])
    np.testing.assert_array_equal(np.asarray(im), packed[..., 1])
    np.testing.assert_array_equal(np.asarray(st_q.accumulator),
                                  np.asarray(st_p.accumulator))

    # XLA fallback path through the public API (CPU backend -> no pallas)
    _, packed_api = sdft(plan, state, x)
    _, (re2, im2) = sdft(plan, state, x, layout="planar")
    np.testing.assert_array_equal(np.asarray(re2),
                                  np.asarray(packed_api)[..., 0])
    np.testing.assert_array_equal(np.asarray(im2),
                                  np.asarray(packed_api)[..., 1])

    # batched planar
    xs = np.stack([x, _signal(M, seed=4)])
    states = init_state(plan, channels=2)
    _, packed_b = sdft(plan, states, xs)
    _, (re3, im3) = sdft(plan, states, xs, layout="planar")
    np.testing.assert_array_equal(np.asarray(re3),
                                  np.asarray(packed_b)[..., 0])
    np.testing.assert_array_equal(np.asarray(im3),
                                  np.asarray(packed_b)[..., 1])


def test_plan_supported_gates():
    assert not plan_supported(Plan(100, precision=F32), 64)     # m < 128
    assert not plan_supported(Plan(256), 64)                    # f64 fd
    # ROI plans ride the toepconv kernel now (masks fold into the tables)
    assert plan_supported(Plan(256, precision=F32, roi=(0, 128)), 64)
    # any m >= 128 and any block length are in-kernel now (internal padding)
    assert plan_supported(Plan(256, precision=F32), 100)
    assert plan_supported(Plan(1000, precision=F32), 2100)      # canonical m
    assert plan_supported(Plan(4096, precision=F32), 16384)
    # dftsizes whose tables cannot fit VMEM fall back to the XLA path
    assert not plan_supported(Plan(1 << 17, precision=F32), 4096)
    # bf16 output halves the staging: m=65536 is a bf16-only Pallas size
    assert not plan_supported(Plan(1 << 16, precision=F32), 4096)
    assert plan_supported(Plan(1 << 16, precision=F32), 4096,
                          out_dtype="bfloat16")


def test_bf16_spectra_output():
    """spectra_dtype="bfloat16" emits bf16 planes that round the f32 result
    (the half-HBM-write fast path), on the kernel and the XLA fallback."""
    import jax.numpy as jnp

    m = 256
    M = 2 * 128
    x = _signal(M, seed=5)
    plan = Plan(m, precision=F32)
    state = init_state(plan)

    # pin the tile configuration: the auto pick is out-dtype-dependent
    # (f32 -> (96,4), bf16 -> (64,8)) and different tiles reassociate the
    # f32 sums differently, which is not what this test gates
    st32, (re32, im32) = forward_block_pallas(plan, state, x, interpret=True,
                                              layout="planar", tile_k=64,
                                              super_r=4)
    st16, (re16, im16) = forward_block_pallas(plan, state, x, interpret=True,
                                              layout="planar", tile_k=64,
                                              super_r=4,
                                              out_dtype="bfloat16")
    assert re16.dtype == jnp.bfloat16 and im16.dtype == jnp.bfloat16
    # the scan stays f32: bf16 output equals the rounded f32 planes exactly
    np.testing.assert_array_equal(
        np.asarray(re16), np.asarray(np.asarray(re32).astype(jnp.bfloat16)))
    np.testing.assert_array_equal(np.asarray(st16.accumulator),
                                  np.asarray(st32.accumulator))

    # packed layout would re-read the spectra; rejected
    with pytest.raises(ValueError, match="planar"):
        forward_block_pallas(plan, state, x, interpret=True,
                             out_dtype="bfloat16")

    # XLA fallback via the public API
    _, (re_a, im_a) = sdft(plan, state, x, layout="planar",
                           spectra_dtype="bfloat16")
    assert re_a.dtype == jnp.bfloat16
    with pytest.raises(ValueError, match="planar"):
        sdft(plan, state, x, spectra_dtype="bfloat16")


@pytest.mark.parametrize("m,M,window", [
    (1000, 2100, "hann"),       # the reference's canonical dftsize
    (136, 384, "blackman"),     # odd m, halo 2
    (256, 500, "hamming"),      # partial final tile
])
def test_unaligned_m_and_block(m, M, window):
    """The kernel pads the bin axis to the next 128 multiple and the time
    axis to whole tiles internally; outputs and carry must still match the
    XLA scan path exactly (reference canonical config: test/main.sh:3)."""
    from sdft_tpu.ops.analysis import sdft_block

    plan = Plan(m, window=window, precision=F32)
    x = _signal(M, seed=11)
    st0 = init_state(plan)

    st_k, d_k = forward_block_pallas(plan, st0, x, interpret=True)
    st_x, d_x = sdft_block(plan, st0, x)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_x), atol=5e-6)
    np.testing.assert_allclose(np.asarray(st_k.accumulator),
                               np.asarray(st_x.accumulator), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(st_k.delayline),
                                  np.asarray(st_x.delayline))

    # fused round trip at the same shapes
    from sdft_tpu.kernels import roundtrip_block_fused
    from sdft_tpu.ops.lti import roundtrip_block_lti
    st_f, y_f = roundtrip_block_fused(plan, st0, x, interpret=True)
    st_l, y_l = roundtrip_block_lti(plan, st0, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_l), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_f.accumulator),
                               np.asarray(st_l.accumulator), atol=5e-4)


@pytest.mark.parametrize("m,M,window", [
    (256, 500, "hann"),
    (1000, 2100, "blackman"),
    (136, 384, "hamming"),
    (256, 384, "boxcar"),
])
def test_toepconv_kernel_matches_xla(m, M, window):
    """The super-tiled spectra kernel (toepconv) matches the XLA scan path
    on every window, including partial tiles and partial super-steps."""
    from sdft_tpu.ops.analysis import sdft_block

    plan = Plan(m, window=window, precision=F32)
    x = _signal(M, seed=21)
    st0 = init_state(plan)
    st_x, d_x = sdft_block(plan, st0, x)
    st_k, d_k = forward_block_pallas(plan, st0, x, interpret=True,
                                     cumsum_mode="toepconv", tile_k=64,
                                     super_r=4)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_x), atol=5e-6)
    np.testing.assert_allclose(np.asarray(st_k.accumulator),
                               np.asarray(st_x.accumulator), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(st_k.delayline),
                                  np.asarray(st_x.delayline))


def test_hop1_pallas_chain_matches_stepped():
    """The hop=1 driver chain's Pallas route (kernel spectra + LTI
    synthesis per block) equals the stepped XLA chain at the kernel's
    documented contraction class, including the carried state."""
    from sdft_tpu.ops.lti import (_chain_fused_jit, _chain_hop1_pallas_jit,
                                  _fused_driver_consts, driver_sub_factor)

    plan = Plan(256, window="hann", precision=F32)
    nb, B = 3, 384
    xs = _signal(nb * B, seed=29).astype(np.float32).reshape(nb, B)

    # build the stepped XLA reference EXPLICITLY — on a TPU backend the
    # public chain would itself route to the Pallas body and this test
    # would compare the new route against itself
    sub1 = driver_sub_factor(1)
    consts1 = _fused_driver_consts(plan, 1, sub1)
    st_x = init_state(plan)
    st_x, hd_x, ys_x = _chain_fused_jit(plan, st_x, xs, consts1, 1, 1, sub1)
    st_p = init_state(plan)
    st_p, hd_p, ys_p = _chain_hop1_pallas_jit(plan, st_p, xs, 1, True)
    assert hd_p.shape == hd_x.shape == (nb, B, 256, 2)
    scale = np.abs(np.asarray(hd_x)).max()
    assert np.abs(np.asarray(hd_p) - np.asarray(hd_x)).max() < 5e-6 * scale
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_p.accumulator),
                               np.asarray(st_x.accumulator), atol=1e-4)

    # channel-batched form
    C = 2
    xs_c = _signal(nb * C * B, seed=30).astype(np.float32).reshape(nb, C, B)
    st_x = init_state(plan, channels=C)
    st_x, hd_x, ys_x = _chain_fused_jit(plan, st_x, xs_c, consts1, 1, 1,
                                        sub1)
    st_p = init_state(plan, channels=C)
    st_p, hd_p, ys_p = _chain_hop1_pallas_jit(plan, st_p, xs_c, 1, True)
    scale = np.abs(np.asarray(hd_x)).max()
    assert np.abs(np.asarray(hd_p) - np.asarray(hd_x)).max() < 5e-6 * scale
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x),
                               atol=1e-5)


@pytest.mark.parametrize("roi", [(10, 100), (30, 256), (64, 128)])
def test_hop1_pallas_chain_roi_matches_stepped(roi):
    """ROI through the hop=1 fused-kernel route: the scan-family kernel
    folds the accumulate mask into its in-kernel fine tables and masks
    the emitted bins (the gap a round-5 review found: forward_and_y had
    no ROI handling while the route's gate never excluded ROI plans)."""
    from sdft_tpu.ops.lti import (_chain_fused_jit, _chain_hop1_pallas_jit,
                                  _fused_driver_consts, driver_sub_factor)

    plan = Plan(256, window="hann", precision=F32, roi=roi)
    nb, B = 2, 384
    xs = _signal(nb * B, seed=31).astype(np.float32).reshape(nb, B)

    sub1 = driver_sub_factor(1)
    consts1 = _fused_driver_consts(plan, 1, sub1)
    st_x, hd_x, ys_x = _chain_fused_jit(plan, init_state(plan), xs, consts1,
                                        1, 1, sub1)
    st_p, hd_p, ys_p = _chain_hop1_pallas_jit(plan, init_state(plan), xs,
                                              1, True)
    scale = np.abs(np.asarray(hd_x)).max()
    assert np.abs(np.asarray(hd_p) - np.asarray(hd_x)).max() < 5e-6 * scale
    # bins outside the ROI are exactly zero, like every other path
    first, last = roi
    assert np.all(np.asarray(hd_p)[..., :first, :] == 0)
    assert np.all(np.asarray(hd_p)[..., last:, :] == 0)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_p.accumulator),
                               np.asarray(st_x.accumulator), atol=1e-4)


def test_scan_kernel_roi_spectra_matches_xla():
    """ROI on the scan-family spectra path (guard-free top-column fixes
    carry the ROI bit) and the fused roundtrip, interpret mode."""
    from sdft_tpu.kernels import forward_block_pallas, roundtrip_block_fused
    from sdft_tpu.ops.analysis import sdft_block
    from sdft_tpu.ops.lti import roundtrip_block_lti

    for roi in [(10, 100), (100, 256), (30, 255)]:
        plan = Plan(256, window="blackman", precision=F32, roi=roi)
        x = _signal(384, seed=33).astype(np.float32)
        _, want = sdft_block(plan, init_state(plan), x)
        _, got = forward_block_pallas(plan, init_state(plan), x,
                                      interpret=True, cumsum_mode="mxu2")
        scale = np.abs(np.asarray(want)).max()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6 * scale)
        _, y_want = roundtrip_block_lti(plan, init_state(plan), x)
        _, y_got = roundtrip_block_fused(plan, init_state(plan), x,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_want),
                                   atol=1e-5)


@pytest.mark.parametrize("roi", [(10, 100), (0, 200), (30, 256), (64, 128)])
def test_toepconv_roi_matches_xla(roi):
    """ROI on the Pallas fast path (VERDICT r3 missing#2): masked bins fold
    into the kernel tables; parity vs the XLA ROI semantics."""
    from sdft_tpu.ops.analysis import sdft_block

    plan = Plan(256, window="hann", precision=F32, roi=roi)
    x = _signal(500, seed=22)
    st0 = init_state(plan)
    st_x, d_x = sdft_block(plan, st0, x)
    st_k, d_k = forward_block_pallas(plan, st0, x, interpret=True,
                                     cumsum_mode="toepconv", tile_k=64,
                                     super_r=2)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_x), atol=5e-6)
    np.testing.assert_allclose(np.asarray(st_k.accumulator),
                               np.asarray(st_x.accumulator), atol=5e-4)
    # bins outside the ROI are exactly zero
    got = np.asarray(d_k)
    first, last = roi
    assert np.all(got[:, :first] == 0)
    assert np.all(got[:, last:] == 0)


def test_pallas_large_m_phase_products_exact():
    """Regression (round-4 review finding): the spectra launchers'
    padded-axis phase products must use the two-level mulmod split — a
    direct int32 product silently wraps for dftsizes in the newly admitted
    (32768, ~52000] Pallas window once the stream offset grows.  m=33024
    at offset 2m-1 maximizes the product; gate vs the XLA path (which uses
    mulmod throughout)."""
    from sdft_tpu import State
    from sdft_tpu.ops.analysis import sdft_block

    m = 33024                     # lane-aligned; (2m-1)*(W-PAD-1) > 2^31
    plan = Plan(m, window="hann", precision=F32)
    assert plan_supported(plan, 128)
    x = _signal(512, seed=31)
    st0 = init_state(plan)
    # offset at the period edge maximizes the products.  The wrapped
    # phases cancel WITHIN a block (row0 ... conj(row0)) — the corruption
    # lands in the carried accumulator — so chain TWO blocks and gate the
    # second block's spectra and the final carry.
    st0 = State(offset=np.asarray(2 * m - 1, st0.offset.dtype),
                delayline=st0.delayline, accumulator=st0.accumulator)

    st_x, _ = sdft_block(plan, st0, x[:256])
    st_x, d_x = sdft_block(plan, st_x, x[256:])
    st_k, _ = forward_block_pallas(plan, st0, x[:256], interpret=True,
                                   cumsum_mode="toepconv", tile_k=32,
                                   super_r=1)
    st_k, d_k = forward_block_pallas(plan, st_k, x[256:], interpret=True,
                                     cumsum_mode="toepconv", tile_k=32,
                                     super_r=1)
    scale = np.abs(np.asarray(d_x)).max()
    err = np.abs(np.asarray(d_k) - np.asarray(d_x)).max()
    assert err < 2e-3 * scale, (err, scale)
    acc_scale = max(1e-9, np.abs(np.asarray(st_x.accumulator)).max())
    acc_err = np.abs(np.asarray(st_k.accumulator)
                     - np.asarray(st_x.accumulator)).max()
    assert acc_err < 2e-3 * acc_scale, (acc_err, acc_scale)


@pytest.mark.parametrize("window,roi", [("hann", None), ("blackman", None),
                                        ("hamming", (20, 150))])
def test_power_spectra_matches_complex(window, roi):
    """forward_block_power emits |dft|^2 of the complex path (the
    spectrogram fast path: one output plane instead of re+im), on the
    kernel (interpret) and the api XLA fallback, batched included."""
    from sdft_tpu import sdft, sdft_power
    from sdft_tpu.kernels import forward_block_power

    plan = Plan(256, window=window, precision=F32, roi=roi)
    x = _signal(500, seed=41).astype(np.float32)
    st0 = init_state(plan)
    _, d = sdft(plan, st0, x)
    want = np.asarray(d)[..., 0] ** 2 + np.asarray(d)[..., 1] ** 2

    st_k, p = forward_block_power(plan, st0, x, interpret=True)
    err = np.abs(np.asarray(p) - want).max()
    assert err < 1e-4 * want.max() + 1e-12

    _, pa = sdft_power(plan, st0, x)          # CPU -> XLA fallback
    np.testing.assert_allclose(np.asarray(pa), want, atol=1e-9)

    # batched + bf16 element type
    xs = np.stack([x, _signal(500, seed=42).astype(np.float32)])
    sts = init_state(plan, channels=2)
    _, pb = sdft_power(plan, sts, xs, spectra_dtype="bfloat16")
    assert pb.shape == (2, 500, 256)
    import jax.numpy as jnp
    assert pb.dtype == jnp.bfloat16
