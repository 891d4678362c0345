"""Lazy build of the native oracle shared library.

Compiles sdft_tpu/native/sdft_native.cpp with g++ on first use and caches
the .so next to the source (rebuilt when the source is newer).  No external
build-system dependency — just the system toolchain.
"""

from __future__ import annotations

import pathlib
import subprocess
import threading

NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
SOURCE = NATIVE_DIR / "sdft_native.cpp"
LIBRARY = NATIVE_DIR / "_build" / "libsdft_native.so"

_lock = threading.Lock()


def ensure_library() -> pathlib.Path:
    """Compile the native engine if missing or stale; return the .so path."""
    with _lock:
        if LIBRARY.exists() and LIBRARY.stat().st_mtime >= SOURCE.stat().st_mtime:
            return LIBRARY
        LIBRARY.parent.mkdir(parents=True, exist_ok=True)
        # -ffast-math matches the reference's own build flags
        # (test/CMakeLists.txt:38-44, cpp/examples/bench.cmake:12-17) and is
        # ~8x faster: without it every std::complex multiply goes through the
        # __muldc3 NaN-checking libcall.  Differential tolerances (1e-7) are
        # far above the reassociation noise this introduces at f64.
        cmd = [
            "g++", "-O3", "-march=native", "-ffast-math", "-std=c++17",
            "-fPIC", "-Wall", "-Wextra", "-shared",
            "-o", str(LIBRARY), str(SOURCE),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"native oracle build failed:\n{' '.join(cmd)}\n{proc.stderr}"
            )
        return LIBRARY
