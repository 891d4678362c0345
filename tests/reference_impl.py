"""Naive per-sample NumPy oracle, written directly from the algorithm spec.

This is the differential-testing oracle for the JAX/Pallas paths: a direct
transliteration of the *math* in SURVEY.md §0 (modulated SDFT per Duda 2010),
deliberately scalar and simple.  Semantics follow the reference C header
(c/src/sdft/sdft.h:562-657) — per-sample comb/rotate/accumulate/demodulate,
Hermitian guard cells, frequency-domain windowing, latency-controlled
synthesis — implemented here from the equations, not from the code.
"""

from __future__ import annotations

import numpy as np

_TAPS = {
    "boxcar": (1.0, 0.0, 0.0),
    "hann": (0.50, -0.25, 0.0),
    "hamming": (0.54, -0.23, 0.0),
    "blackman": (0.42, -0.25, 0.04),
}
_HALO = {"boxcar": 0, "hann": 1, "hamming": 1, "blackman": 2}


class NaiveSDFT:
    """Per-sample modulated SDFT with exact integer phase bookkeeping."""

    def __init__(self, m: int, window: str = "hann", latency: float = 1.0,
                 td=np.float32, fd=np.float64):
        self.m = m
        self.window = window
        self.latency = latency
        self.td = td
        self.fd = fd
        self.cd = np.complex128 if fd == np.float64 else np.complex64
        self.t = 0  # absolute sample index mod 2m
        self.ring = np.zeros(2 * m, td)
        self.acc = np.zeros(m, self.cd)

    def reset(self):
        self.t = 0
        self.ring[:] = 0
        self.acc[:] = 0

    def _phasor(self, e: int) -> np.ndarray:
        """T_i^e for all bins i, with exponents reduced mod 2m."""
        i = np.arange(self.m)
        r = (e * i) % (2 * self.m)
        return np.exp(self.fd(-np.pi / self.m) * 1j * r).astype(self.cd)

    def step(self, x: float) -> np.ndarray:
        m = self.m
        pos = self.t % (2 * m)
        delta = self.fd(self.td(x) - self.ring[pos])
        self.ring[pos] = self.td(x)
        self.acc += self._phasor(self.t) * delta
        aux = self.acc * np.conj(self._phasor(self.t + 1))
        self.t = (self.t + 1) % (2 * m)

        # Hermitian guards + window convolution.
        halo = _HALO[self.window]
        c0, c1, c2 = _TAPS[self.window]
        if halo:
            left = np.conj(aux[1:halo + 1][::-1])
            right = np.conj(aux[-halo - 1:-1][::-1])
            padded = np.concatenate([left, aux, right])
        else:
            padded = aux
        n = padded.size
        out = c0 * padded[halo:n - halo]
        if halo >= 1:
            out = out + c1 * (padded[halo - 1:n - halo - 1] + padded[halo + 1:n - halo + 1])
        if halo >= 2:
            out = out + c2 * (padded[halo - 2:n - halo - 2] + padded[halo + 2:n - halo + 2])
        return out / (2 * m)

    def sdft(self, samples) -> np.ndarray:
        return np.stack([self.step(x) for x in np.asarray(samples)])

    def isdft(self, dfts) -> np.ndarray:
        dfts = np.atleast_2d(np.asarray(dfts))
        i = np.arange(self.m)
        if self.latency == 1.0:
            tw = np.where(i % 2 == 0, 1.0, -1.0).astype(self.fd)
            y = dfts.real.astype(self.fd) @ tw
        else:
            w = 2.0 / (1.0 - np.cos(np.pi * self.latency))
            tw = w * np.exp(-1j * np.pi * self.latency * i)
            y = (dfts.astype(self.cd) * tw.astype(self.cd)).real.sum(axis=-1)
        return (2.0 * y).astype(self.td)
