"""Spectral-transform streaming example: low-pass filtering inside the jit.

The reference's core usage pattern is analyze -> modify the spectrum ->
resynthesize (python/src/sdft/sdft.py module docs; README "sliding STFT"
processing).  This example runs a brickwall low-pass as a *fused* transform
— the callback executes inside the compiled round-trip program
(api.roundtrip(transform=...) via Streamer.run(fuse_transform=True)), so the
mask multiply fuses into the synthesis matvec and the spectra never cross a
program boundary.

Verifies the result physically: energy of the synthesized signal above the
cutoff must drop by >= 40 dB relative to the unfiltered round trip.

    python examples/transform.py [cutoff_hz]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from sdft_tpu import Plan
from sdft_tpu.io.wav import read_wav, write_wav
from sdft_tpu.stream import Streamer, iter_blocks

WAV = "/root/reference/test/test.wav"


def band_energy_db(x, sr, lo_hz):
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(x.size, 1.0 / sr)
    hi = spec[freqs >= lo_hz].sum()
    total = spec.sum()
    return 10 * np.log10(max(hi, 1e-30) / total)


def main():
    cutoff_hz = float(sys.argv[1]) if len(sys.argv) > 1 else 2000.0
    m = 1000
    plan = Plan(m, window="hann")
    x, sr = read_wav(WAV)
    x = x[: (x.size // 4000) * 4000]

    # bin i covers frequencies around i * sr / (2m)
    cut_bin = int(cutoff_hz * 2 * m / sr)
    mask = (np.arange(m) < cut_bin).astype(np.float64)

    def lowpass(z):  # complex (M, m) inside the jitted program
        return z * mask

    blocks = list(iter_blocks(x, 4000))
    y_raw = np.concatenate(list(Streamer(plan).run(blocks)))
    y_lp = np.concatenate(list(Streamer(plan).run(blocks, transform=lowpass,
                                                  fuse_transform=True)))

    above_raw = band_energy_db(y_raw, sr, cutoff_hz * 1.1)
    above_lp = band_energy_db(y_lp, sr, cutoff_hz * 1.1)
    drop = above_raw - above_lp
    print(f"cutoff {cutoff_hz:.0f} Hz (bin {cut_bin}/{m})")
    print(f"energy above cutoff: raw {above_raw:.1f} dB -> "
          f"filtered {above_lp:.1f} dB  (drop {drop:.1f} dB)")
    out = pathlib.Path(__file__).resolve().parent.parent / "transform.wav"
    write_wav(str(out), y_lp.astype(np.float64), sr)
    print(f"wrote {out}")
    assert drop >= 40.0, f"stop-band drop only {drop:.1f} dB"
    print("OK")


if __name__ == "__main__":
    main()
