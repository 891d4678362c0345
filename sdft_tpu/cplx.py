"""Packed-complex boundary layout.

The TPU runtime in this environment cannot materialize complex buffers at
jit boundaries or transfer them device<->host (complex *inside* a compiled
program is fine — XLA decomposes it).  The framework therefore uses a packed
layout at every jit/program boundary: a real array with a trailing axis of
size 2 holding (real, imag), in the plan's FD real dtype.  Pallas kernels
use the same planar convention (Pallas has no complex dtypes at all).

Helpers here convert between the packed layout and complex arrays, on device
(inside jit) and on host (numpy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack(z: jax.Array) -> jax.Array:
    """complex (...,) -> packed (..., 2).  Use inside jit only."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


def unpack(p: jax.Array) -> jax.Array:
    """packed (..., 2) -> complex (...).  Use inside jit only."""
    return jax.lax.complex(p[..., 0], p[..., 1])


def to_complex(p) -> np.ndarray:
    """Host-side: packed array (device or numpy) -> numpy complex array."""
    p = np.asarray(p)
    if p.shape[-1] != 2:
        raise ValueError(f"packed layout needs trailing axis 2, got {p.shape}")
    return p[..., 0] + 1j * p[..., 1]


def planar_to_complex(re, im) -> np.ndarray:
    """Host-side: planar (re, im) pair (device or numpy) -> numpy complex."""
    return np.asarray(re) + 1j * np.asarray(im)


def from_complex(z, dtype=None) -> np.ndarray:
    """Host-side: complex numpy array -> packed numpy array."""
    z = np.asarray(z)
    if not np.iscomplexobj(z):
        z = z.astype(np.complex128)
    real_dtype = dtype or (np.float32 if z.dtype == np.complex64 else np.float64)
    return np.stack([z.real, z.imag], axis=-1).astype(real_dtype)
