"""Streaming runtime: chunk invariance, checkpoint/resume, transform hook."""

import numpy as np

from sdft_tpu import Plan, Precision, init_state, isdft, sdft
from sdft_tpu.stream import Streamer, iter_blocks

F64 = Precision(td="float64", fd="float64")


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(np.random.default_rng(seed).standard_normal(n), -1, 1)


def test_streamer_roundtrip_matches_batch():
    m = 32
    n = 12 * m
    x = _signal(n)
    plan = Plan(m, precision=F64)

    state = init_state(plan)
    _, dfts = sdft(plan, state, x)
    want = np.asarray(isdft(plan, dfts))

    streamer = Streamer(plan)
    got = np.concatenate(list(streamer.run(iter_blocks(x, 96))))
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert streamer.samples_processed == n


def test_streamer_checkpoint_resume(tmp_path):
    m = 16
    x = _signal(8 * m, seed=1)
    plan = Plan(m, precision=F64)
    half = x.size // 2

    ref = Streamer(plan)
    want = [np.asarray(ref.process(b)) for b in iter_blocks(x, 32)]

    a = Streamer(plan)
    got_first = [np.asarray(a.process(b)) for b in iter_blocks(x[:half], 32)]
    ckpt = tmp_path / "state.npz"
    a.checkpoint(ckpt)

    b = Streamer(plan)
    b.restore(ckpt)
    assert b.samples_processed == half
    got_second = [np.asarray(b.process(blk)) for blk in iter_blocks(x[half:], 32)]

    np.testing.assert_allclose(np.concatenate(got_first + got_second),
                               np.concatenate(want), atol=0)


def test_streamer_multichannel_and_transform():
    m = 16
    C = 2
    x = np.stack([_signal(6 * m, seed=2), _signal(6 * m, seed=3)])
    plan = Plan(m, precision=F64)

    streamer = Streamer(plan, channels=C)
    # spectral transform: zero everything -> output must be zero
    out = np.concatenate(
        list(streamer.run(iter_blocks(x, 48), transform=lambda d: d * 0)), axis=-1)
    assert out.shape == x.shape
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_iter_blocks_pad_and_truncate():
    x = np.arange(10.0)
    assert [b.shape[-1] for b in iter_blocks(x, 4)] == [4, 4]
    padded = list(iter_blocks(x, 4, pad=True))
    assert [b.shape[-1] for b in padded] == [4, 4, 4]
    np.testing.assert_array_equal(padded[-1], [8, 9, 0, 0])


def test_streamer_fused_transform_matches_host_transform():
    """run(fuse_transform=True) with an in-jit complex transform equals the
    host-side packed-transform path."""
    import numpy as np

    from sdft_tpu.cplx import to_complex, from_complex

    m = 32
    plan = Plan(m, window="hann")
    rng = np.random.default_rng(19)
    x = (rng.standard_normal(8 * m) * 0.25).clip(-1, 1)
    blocks = [x[i:i + 2 * m] for i in range(0, x.size, 2 * m)]
    mask = (np.arange(m) < m // 2).astype(np.float64)

    def fused(z):  # complex (M, m) inside jit
        return z * mask

    def hosty(d):  # packed (M, m, 2) at the boundary
        return from_complex(to_complex(np.asarray(d)) * mask)

    s1 = Streamer(plan)
    got = np.concatenate(list(s1.run(blocks, transform=fused,
                                     fuse_transform=True)))
    s2 = Streamer(plan)
    want = np.concatenate(list(s2.run(blocks, transform=hosty)))
    np.testing.assert_allclose(got, want, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s1.state.accumulator),
                               np.asarray(s2.state.accumulator), atol=1e-12)


def test_streamer_fused_transform_requires_default_ops():
    import pytest

    plan = Plan(16)
    s = Streamer(plan)
    with pytest.raises(ValueError, match="fuse_transform"):
        list(s.run([np.zeros(32)], fuse_transform=True))


def test_run_hopped_chained_matches_unchained():
    """Streamer.run_hopped (grouped one-program chains) must equal the
    per-block hopped analysis + round trip regardless of group size."""
    from sdft_tpu import Plan, Precision, init_state, roundtrip, sdft_hopped
    from sdft_tpu.stream import Streamer, iter_blocks

    plan = Plan(80, precision=Precision("float64", "float64"))
    hop, B = 10, 80
    rng = np.random.default_rng(9)
    x = np.clip(rng.standard_normal(7 * B), -3, 3) / 2

    ref_state = init_state(plan)
    want = []
    for blk in iter_blocks(x, B):
        _, hd = sdft_hopped(plan, ref_state, blk, hop)
        ref_state, y = roundtrip(plan, ref_state, blk)
        want.append((np.asarray(hd), np.asarray(y)))

    for chain in (1, 3, 16):
        s = Streamer(plan)
        got = list(s.run_hopped(iter_blocks(x, B), hop, chain=chain))
        assert len(got) == len(want)
        for (hd_g, y_g), (hd_w, y_w) in zip(got, want):
            np.testing.assert_allclose(hd_g, hd_w, atol=1e-12)
            np.testing.assert_allclose(y_g, y_w, atol=1e-12)
        assert s.samples_processed == x.size
