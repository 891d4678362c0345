"""Driver entry points stay green: entry() compiles, dryrun_multichip runs."""

import sys
import pathlib

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    state, dfts = jax.jit(fn)(*args)
    jax.block_until_ready(dfts)
    assert dfts.shape == (2048, 4096, 2)
    assert np.isfinite(np.asarray(dfts)).all()


@pytest.mark.parametrize("n", [4, 8])
def test_dryrun_multichip(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")
    graft.dryrun_multichip(n)
