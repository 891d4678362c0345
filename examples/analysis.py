"""Sine-sweep analysis example (reference: python/examples/analysis.py).

Generates one second of a 1 kHz tone at 44.1 kHz, runs the sliding DFT with
m=1000 bins, and renders the dB spectrogram to analysis.png (if matplotlib
is available) — the classic single-tone sanity picture.
"""


import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from sdft_tpu import Plan, init_state, sdft, to_complex


def main():
    sr = 44100
    n = sr
    m = 1000
    f = 1000.0

    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * f * t)

    plan = Plan(m, window="hann")
    state = init_state(plan)
    _, dfts = sdft(plan, state, x)
    dfts = to_complex(dfts)

    # peak bin should sit at f / (sr / (2m)) = f * 2m / sr
    mags = np.abs(dfts[n // 2])
    peak = int(np.argmax(mags))
    expect = int(round(f * 2 * m / sr))
    print(f"peak bin {peak} (expected ~{expect}), magnitude {mags[peak]:.4f}")

    try:
        from sdft_tpu.viz import spectrogram
        ax = spectrogram(dfts[::100], samplerate=sr, hopsize=100)
        ax.figure.savefig("analysis.png", dpi=100)
        print("wrote analysis.png")
    except ImportError:
        print("matplotlib not available; skipping plot")


if __name__ == "__main__":
    main()
