"""Multi-host runtime helpers (sdft_tpu.parallel.multihost).

Real multi-process clusters cannot run in CI; these tests exercise the
single-process contracts and mock `jax.distributed` for the initialize()
branching (SURVEY.md §2.4 — the reference is single-process, so this whole
module is TPU-framework surface with no reference counterpart).
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from sdft_tpu.parallel import multihost


class _Recorder:
    def __init__(self, exc=None):
        self.calls = []
        self.exc = exc

    def initialize(self, **kw):
        self.calls.append(kw)
        if self.exc is not None:
            raise self.exc


def test_initialize_forwards_cluster_args(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(jax, "distributed", rec)
    multihost.initialize(coordinator_address="10.0.0.1:1234",
                         num_processes=4, process_id=2)
    assert rec.calls == [dict(coordinator_address="10.0.0.1:1234",
                              num_processes=4, process_id=2)]


def test_initialize_idempotent_when_group_exists(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(jax, "distributed", rec)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    multihost.initialize()
    assert rec.calls == []  # already initialized: no re-init attempt


def test_initialize_tolerates_missing_cluster_env(monkeypatch):
    # single-process run (no coordinator): the RuntimeError is swallowed,
    # SPMD code still works on the local devices
    rec = _Recorder(exc=RuntimeError("no cluster environment detected"))
    monkeypatch.setattr(jax, "distributed", rec)
    multihost.initialize()
    assert len(rec.calls) == 1


def test_global_mesh_uses_all_devices():
    n = len(jax.devices())
    mesh = multihost.global_mesh(time=n)
    assert mesh.axis_names == ("channel", "time", "bins")
    assert mesh.devices.shape == (1, n, 1)
    with pytest.raises(ValueError, match="must use all"):
        multihost.global_mesh(time=max(n // 2, 1), bins=1)


def test_host_local_to_global_roundtrip():
    # single process: the "host-local" shard is the whole array, but the
    # result must come back sharded per spec and numerically intact
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = multihost.global_mesh(channel=2, time=4)
    x = np.arange(2 * 64, dtype=np.float32).reshape(2, 64)
    g = multihost.host_local_to_global(mesh, P("channel", "time"), x)
    assert g.shape == x.shape
    np.testing.assert_array_equal(np.asarray(g), x)
    assert len(g.sharding.device_set) == 8
