"""Plot helper tests (reference component: test/plot.py spectrogram)."""

import numpy as np
import pytest

from sdft_tpu.viz import magnitude_db

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")


def test_magnitude_db_complex_and_packed():
    z = np.array([[1.0 + 0j, 0.1j], [10.0, 0.0]])
    db = magnitude_db(z)
    assert db.shape == z.shape
    np.testing.assert_allclose(db[0, 0], 0.0, atol=1e-9)
    np.testing.assert_allclose(db[0, 1], -20.0, atol=1e-6)
    np.testing.assert_allclose(db[1, 0], 20.0, atol=1e-6)
    assert db[1, 1] < -200  # silence floors at a finite dB, not -inf

    packed = np.stack([z.real, z.imag], axis=-1)
    np.testing.assert_allclose(magnitude_db(packed), db)


def test_spectrogram_smoke(tmp_path):
    from sdft_tpu.viz import compare_spectrograms, spectrogram

    rng = np.random.default_rng(0)
    dfts = rng.standard_normal((32, 16)) + 1j * rng.standard_normal((32, 16))
    ax = spectrogram(dfts, samplerate=8000, hopsize=4, title="t")
    assert ax.get_xlabel() == "time [s]"
    # time extent = hops * hopsize / sr, freq extent = Nyquist
    x0, x1, y0, y1 = ax.images[0].get_extent()
    assert (x0, y0, y1) == (0.0, 0.0, 4000.0)
    np.testing.assert_allclose(x1, 32 * 4 / 8000)

    out = tmp_path / "cmp.png"
    compare_spectrograms([("a", dfts), ("b", dfts)], samplerate=8000,
                         hopsize=4, path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_power_db_matches_magnitude_db():
    from sdft_tpu.viz import magnitude_db, power_db

    rng = np.random.default_rng(3)
    z = rng.standard_normal((5, 8)) + 1j * rng.standard_normal((5, 8))
    np.testing.assert_allclose(power_db(np.abs(z) ** 2), magnitude_db(z),
                               atol=1e-6)
