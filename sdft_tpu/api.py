"""Jitted, channel-batched public entry points.

The functional API is

    state, dfts = sdft(plan, state, samples)
    samples     = isdft(plan, dfts)

where ``samples`` may be (M,) for one channel or (C, M) for a multi-channel
batch (reference mean-mixes to mono and has no batching — test/wav.h:69-84;
here channels vmap and shard for free).  ``plan`` is static: the first call
per (plan, shape) pair compiles, later calls hit the jit cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ops.analysis import sdft_block
from .ops.synthesis import isdft_block
from .plan import Plan
from .state import State


@functools.partial(jax.jit, static_argnums=0)
def _sdft_1d(plan: Plan, state: State, samples: jax.Array):
    return sdft_block(plan, state, samples)


@functools.partial(jax.jit, static_argnums=0)
def _sdft_2d(plan: Plan, state: State, samples: jax.Array):
    return jax.vmap(lambda st, x: sdft_block(plan, st, x))(state, samples)


@functools.partial(jax.jit, static_argnums=0)
def _isdft(plan: Plan, dfts: jax.Array):
    return isdft_block(plan, dfts)


def sdft(plan: Plan, state: State, samples) -> tuple[State, jax.Array]:
    """Forward analysis: estimate one spectrum per input sample.

    Args:
      plan: static plan.
      state: carry from ``init_state`` (batched iff samples are batched).
      samples: (M,) or (C, M) real samples.

    Returns:
      (new_state, dfts) with dfts (M, m) or (C, M, m) complex.
    """
    samples = jnp.asarray(samples)
    if samples.ndim == 1:
        return _sdft_1d(plan, state, samples)
    if samples.ndim == 2:
        return _sdft_2d(plan, state, samples)
    raise ValueError(f"samples must be (M,) or (C, M), got {samples.shape}")


def isdft(plan: Plan, dfts) -> jax.Array:
    """Inverse synthesis: one sample per spectrum (c/src/sdft/sdft.h:666-672)."""
    dfts = jnp.asarray(dfts)
    if dfts.ndim not in (2, 3):
        raise ValueError(f"dfts must be (M, m) or (C, M, m), got {dfts.shape}")
    return _isdft(plan, dfts)
