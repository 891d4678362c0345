from .build import ensure_library
from .oracle import NativeSDFT, NativeSDFT2

__all__ = ["NativeSDFT", "NativeSDFT2", "ensure_library"]
