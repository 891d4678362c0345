"""Analysis window definitions.

The reference applies time-domain analysis windows as short symmetric
convolutions over neighboring DFT bins in the frequency domain
(reference: c/src/sdft/sdft.h:350-402 ``sdft_etc_convolve``;
python/src/sdft/sdft.py:147-203 ``SDFT.convolve``):

  * boxcar   : out[i] = mid
  * hann     : out[i] = 0.50*mid - 0.25*(l1+r1)
  * hamming  : out[i] = 0.54*mid - 0.23*(l1+r1)
  * blackman : out[i] = 0.42*mid - 0.25*(l1+r1) + 0.04*(l2+r2)

all scaled by the analysis weight 1/(2m) (c/src/sdft/sdft.h:422).  This module
holds the canonical tap tables; the actual convolution lives in
``sdft_tpu.ops.convolve``.
"""

from __future__ import annotations

import enum


class Window(enum.Enum):
    """Analysis window type (reference: c/src/sdft/sdft.h:127-133)."""

    BOXCAR = "boxcar"
    HANN = "hann"
    HAMMING = "hamming"
    BLACKMAN = "blackman"

    @classmethod
    def parse(cls, value) -> "Window":
        """Accept a Window, exact name, or unambiguous prefix (any case)."""
        if isinstance(value, Window):
            return value
        name = str(value).strip().lower()
        if not name:
            return cls.HANN  # reference default window (c/src/sdft/sdft.h:457-460)
        for w in cls:
            if w.value == name:
                return w
        matches = [w for w in cls if w.value.startswith(name)]
        if len(matches) == 1:
            return matches[0]
        raise ValueError(f"unknown window {value!r}")


#: Symmetric frequency-domain tap weights, center-first:
#: (center, first-neighbor, second-neighbor).  The full kernel for taps
#: (c0, c1, c2) is [c2, c1, c0, c1, c2] over bins [i-2 .. i+2].
WINDOW_TAPS = {
    Window.BOXCAR: (1.0, 0.0, 0.0),
    Window.HANN: (0.50, -0.25, 0.0),
    Window.HAMMING: (0.54, -0.23, 0.0),
    Window.BLACKMAN: (0.42, -0.25, 0.04),
}

#: Number of neighbor bins each side that carry nonzero weight.
WINDOW_HALO = {
    Window.BOXCAR: 0,
    Window.HANN: 1,
    Window.HAMMING: 1,
    Window.BLACKMAN: 2,
}

#: Fixed guard-cell count used by the reference regardless of window
#: (c/src/sdft/sdft.h:184 ``sdft_convolution_kernel_size = 2``).  We only
#: materialize the halo actually needed per window, which is equivalent
#: (python/src/sdft/sdft.py:160-201 does the same).
MAX_HALO = 2
