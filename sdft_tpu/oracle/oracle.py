"""ctypes binding for the native C++ oracle engine.

The oracle mirrors the reference's native cores (c/src/sdft/sdft.h,
cpp/src/sdft/sdft.h) as the framework's golden CPU implementation: exact
integer-exponent phases, double-precision FD math, per-sample recursion.
Used for differential testing of the JAX/Pallas paths and as the CPU
baseline in bench.py.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..windows import Window
from .build import ensure_library

_WINDOW_CODE = {
    Window.BOXCAR: 0,
    Window.HANN: 1,
    Window.HAMMING: 2,
    Window.BLACKMAN: 3,
}

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(ensure_library()))
        lib.sdft_oracle_create.restype = ctypes.c_void_p
        lib.sdft_oracle_create.argtypes = [
            ctypes.c_int64, ctypes.c_int32, ctypes.c_double, ctypes.c_int32]
        lib.sdft_oracle_destroy.argtypes = [ctypes.c_void_p]
        lib.sdft_oracle_reset.argtypes = [ctypes.c_void_p]
        lib.sdft_oracle_sdft.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        lib.sdft_oracle_isdft.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    return _lib


class NativeSDFT:
    """Stateful native-engine handle with the reference class API shape."""

    def __init__(self, dftsize: int, window="hann", latency: float = 1.0,
                 td_bits: int = 32):
        """td_bits=32 matches the reference TD default (float); 64 for all-double."""
        self._lib = _load()
        self.size = int(dftsize)
        self.window = Window.parse(window)
        self.latency = float(latency)
        self._h = self._lib.sdft_oracle_create(
            self.size, _WINDOW_CODE[self.window], self.latency, td_bits)
        if not self._h:
            raise ValueError(f"oracle rejected dftsize {dftsize}")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.sdft_oracle_destroy(h)
            self._h = None

    def reset(self) -> None:
        self._lib.sdft_oracle_reset(self._h)

    def sdft(self, samples) -> np.ndarray:
        x = np.ascontiguousarray(np.atleast_1d(samples), dtype=np.float64)
        out = np.empty((x.size, self.size), dtype=np.complex128)
        self._lib.sdft_oracle_sdft(
            self._h, x.size,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out

    def isdft(self, dfts) -> np.ndarray:
        d = np.ascontiguousarray(np.atleast_2d(dfts), dtype=np.complex128)
        if d.shape[1] != self.size:
            raise ValueError(f"expected (n, {self.size}), got {d.shape}")
        y = np.empty(d.shape[0], dtype=np.float64)
        self._lib.sdft_oracle_isdft(
            self._h, d.shape[0],
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return y
