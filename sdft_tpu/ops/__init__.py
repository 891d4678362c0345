from .analysis import sdft_block
from .convolve import hermitian_pad, window_convolve
from .synthesis import isdft_block
from .twiddle import fiddle_rows, synthesis_twiddles

__all__ = [
    "sdft_block",
    "isdft_block",
    "window_convolve",
    "hermitian_pad",
    "fiddle_rows",
    "synthesis_twiddles",
]
