from .build import ensure_library
from .oracle import NativeSDFT

__all__ = ["NativeSDFT", "ensure_library"]
