"""The functional carry state of a sliding DFT stream.

The complete resumable state of the reference C plan is {cursor, input ring,
accoutput, fiddles} (c/src/sdft/sdft.h:153-159); reference Python carries
{offset, delayline, accumulator} (python/src/sdft/sdft.py:50-52).  Because we
derive all phases from ``offset mod 2m`` exactly (see :mod:`sdft_tpu.plan`),
the fiddle phasors need not be materialized: our carry is

  * ``offset``      — samples processed so far, reduced mod 2m, int32 scalar
  * ``delayline``   — last 2m input samples, TD dtype
  * ``accumulator`` — per-bin running sum of rotated deltas, packed complex
    (..., m, 2) in FD real dtype (see sdft_tpu.cplx for why boundaries are
    packed, not complex)

``State`` is a NamedTuple, hence automatically a JAX pytree: it jit-traces,
vmaps over channels, shards over meshes, and serializes for checkpoint/resume
(reference has no checkpointing; SURVEY.md §5 mandates it).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .plan import Plan


class State(NamedTuple):
    """Carry state for one SDFT stream (one channel)."""

    offset: jax.Array       # () int32, in [0, 2m)
    delayline: jax.Array    # (2m,) td dtype — last 2m samples, oldest first
    accumulator: jax.Array  # (m, 2) fd real — packed sum of rotated deltas


def init_state(plan: Plan, channels: int | None = None) -> State:
    """Time-zero state (reference: sdft_reset, c/src/sdft/sdft.h:517-529).

    With ``channels`` given, returns a batched state with a leading channel
    axis on every leaf (offset included, so the pytree vmaps uniformly).
    """
    m = plan.dftsize
    shape = () if channels is None else (channels,)
    return State(
        offset=jnp.zeros(shape, jnp.int32),
        delayline=jnp.zeros(shape + (2 * m,), plan.precision.td_dtype),
        accumulator=jnp.zeros(shape + (m, 2), plan.precision.fd_dtype),
    )


def reset_state(plan: Plan, state: State) -> State:
    """Functional reset preserving batching shape."""
    return State(
        offset=jnp.zeros_like(state.offset),
        delayline=jnp.zeros_like(state.delayline),
        accumulator=jnp.zeros_like(state.accumulator),
    )


# -- checkpoint / resume ------------------------------------------------------

def state_to_arrays(state: State) -> dict[str, np.ndarray]:
    """Host-side snapshot for checkpointing (SURVEY.md §5: carry-state
    checkpointing makes recovery trivial — re-feed from last block boundary)."""
    return {
        "offset": np.asarray(state.offset),
        "delayline": np.asarray(state.delayline),
        "accumulator": np.asarray(state.accumulator),
    }


def state_from_arrays(arrays: dict[str, np.ndarray]) -> State:
    return State(
        offset=jnp.asarray(arrays["offset"]),
        delayline=jnp.asarray(arrays["delayline"]),
        accumulator=jnp.asarray(arrays["accumulator"]),
    )
