"""Frequency-domain window convolution with Hermitian edge guards.

Time-domain analysis windows act as 1/3/5-tap symmetric convolutions over
neighboring bins (reference: c/src/sdft/sdft.h:350-402).  At the spectrum
edges the reference mirrors complex conjugates around bin 0 (DC) and bin m-1
(c/src/sdft/sdft.h:589-595; python/src/sdft/sdft.py:160-199): the guard cell
at bin -k is conj(bin +k) and at bin (m-1)+k is conj(bin (m-1)-k).

This module provides the single-device implementation; bin-sharded execution
exchanges one- or two-column halos between neighbor shards instead
(see sdft_tpu.parallel) — interior shards never build guards.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..plan import Plan
from ..windows import Window, WINDOW_TAPS, WINDOW_HALO


def hermitian_pad(aux: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Pad the bin axis (last axis) with Hermitian mirror guards.

    aux: (..., m) complex.  Returns (..., m + 2*halo).
    """
    if halo == 0:
        return aux
    # Mirror around bin 0: guards [conj(aux[halo]), ..., conj(aux[1])]
    left = jnp.conj(aux[..., 1:halo + 1][..., ::-1])
    # Mirror around bin m-1: guards [conj(aux[m-2]), ..., conj(aux[m-1-halo])]
    right = jnp.conj(aux[..., -halo - 1:-1][..., ::-1])
    return jnp.concatenate([left, aux, right], axis=-1)


def window_convolve(plan: Plan, aux: jnp.ndarray, *, edges: bool = True,
                    weight: float | None = None) -> jnp.ndarray:
    """Apply the window's bin convolution and the analysis weight 1/(2m).

    Args:
      plan: static plan (window + dftsize).
      aux: (..., B) complex demodulated bins.  When ``edges`` is True, B == m
        and Hermitian guards are synthesized; when False, ``aux`` must already
        include ``halo`` extra bins on each side (bin-sharded halo exchange).
      edges: whether to build Hermitian guards from the data itself.
      weight: override for the output scale (default plan.analysis_weight).

    Returns:
      (..., B_core) complex windowed spectrum scaled by the weight.
    """
    window = plan.window
    halo = WINDOW_HALO[window]
    w = plan.analysis_weight if weight is None else weight
    c0, c1, c2 = WINDOW_TAPS[window]

    if window is Window.BOXCAR:
        return (aux * w).astype(aux.dtype)

    padded = hermitian_pad(aux, halo) if edges else aux
    n = padded.shape[-1]
    core = padded[..., halo:n - halo]
    out = c0 * core
    out = out + c1 * (padded[..., halo - 1:n - halo - 1] + padded[..., halo + 1:n - halo + 1])
    if halo >= 2:
        out = out + c2 * (padded[..., halo - 2:n - halo - 2] + padded[..., halo + 2:n - halo + 2])
    return (out * w).astype(aux.dtype)
