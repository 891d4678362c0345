"""Multi-host SPMD runtime helpers.

The reference is single-process (SURVEY.md §2.4); the TPU framework scales
to pod slices by running one process per host with `jax.distributed` and a
global mesh whose collectives ride ICI within a slice and DCN across slices.
Nothing else in the framework changes: the shard_map programs in
sdft_tpu.parallel.sharded are already SPMD, so the same code runs on 1 chip
or N hosts.

Typical driver:

    from sdft_tpu.parallel import multihost, make_mesh, sharded_sdft
    multihost.initialize()                 # reads cluster env (TPU pods
                                           # auto-detect coordinator/rank)
    mesh = multihost.global_mesh(time=jax.device_count() // 2, bins=2)
    ...
    state, dfts = sharded_sdft(plan, mesh, state, samples)

Host-local input: use `host_local_to_global` to assemble a global sharded
array from each host's shard of the sample stream without materializing the
full stream anywhere.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXES


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the jax.distributed process group (idempotent).

    On Cloud TPU pods all arguments auto-detect from the metadata server;
    pass them explicitly for other clusters (SPMD contract: every host runs
    the same program).
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        # single-process run (no cluster env) — SPMD code still works
        pass


def global_mesh(channel: int = 1, time: int = 1, bins: int = 1) -> Mesh:
    """Mesh over *all* processes' devices (jax.devices() is global)."""
    n = channel * time * bins
    devices = jax.devices()
    if n != len(devices):
        raise ValueError(
            f"mesh {channel}x{time}x{bins}={n} must use all {len(devices)} "
            f"global devices for multi-host SPMD")
    grid = np.array(devices).reshape(channel, time, bins)
    return Mesh(grid, AXES)


def host_local_to_global(mesh: Mesh, spec: P, host_arrays) -> jax.Array:
    """Assemble a global array from per-host local shards.

    Each process passes only its own slice of the data (e.g. its portion of
    a multi-channel sample stream); the result is a global sharded array
    usable with the sharded ops.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, np.asarray(host_arrays))
