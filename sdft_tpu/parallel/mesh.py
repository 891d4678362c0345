"""Device mesh construction for the SDFT workload.

Three natural parallel axes (SURVEY.md §2.4):

  * ``channel`` — data parallelism over independent audio channels
    (embarrassingly parallel; the reference mean-mixes to mono instead,
    test/wav.h:69-84).
  * ``time``    — sequence parallelism over contiguous sample blocks; the
    carry is the m-complex accumulator total, combined with an exclusive
    prefix across devices (the associative-scan seam already present in
    reference Python's cumsum, python/src/sdft/sdft.py:113-115).
  * ``bins``    — "tensor" parallelism over DFT bins (the reference's latent
    ROI seam, c/src/sdft/sdft.h:425); the window convolution needs a 1-2 bin
    halo exchange mirroring the Hermitian guard cells.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("channel", "time", "bins")


def make_mesh(channel: int = 1, time: int = 1, bins: int = 1,
              devices=None) -> Mesh:
    """Build a ('channel', 'time', 'bins') mesh from available devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = channel * time * bins
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(channel, time, bins)
    return Mesh(grid, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)
