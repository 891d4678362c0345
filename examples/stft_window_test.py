"""WOLA unity-gain check (reference: python/examples/stft_window_test.py).

Verifies that the STFT comparator's weighted-overlap-add synthesis
reconstructs the interior of a random signal at unity gain for symmetric
and asymmetric window configurations.
"""


import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

# The WOLA unity-gain bound (1e-8) is a float64 contract, matching the
# reference's NumPy-double comparator; JAX defaults to float32 off-test.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

from sdft_tpu.compat import STFT


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16384).clip(-1, 1)

    configs = [
        dict(framesize=1024, hopsize=256),
        dict(framesize=1024, hopsize=256, dftsize=1024),
        dict(framesize=512, hopsize=128, window="hamming"),
    ]
    for cfg in configs:
        st = STFT(**cfg)
        y = st.istft(st.stft(x))
        core = slice(4096, 12288)
        err = np.abs(y[core] - x[core]).max()
        status = "OK" if err < 1e-8 else "FAIL"
        print(f"{status}  {cfg}: max interior error {err:.2e}")


if __name__ == "__main__":
    main()
