"""Test configuration: force CPU backend with 8 virtual devices and x64.

Multi-chip hardware is unavailable in CI; sharding tests run on a virtual
8-device CPU mesh (SURVEY.md §4c).  This must run before jax is imported by
any test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The hosted TPU plugin ("axon") overrides JAX_PLATFORMS at import time; the
# config update below wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_WAV = pathlib.Path("/root/reference/test/test.wav")


@pytest.fixture(scope="session")
def test_wav():
    """The reference 8-second mono 24-bit 44.1 kHz fixture, loaded once."""
    from sdft_tpu.io.wav import read_wav

    if not REFERENCE_WAV.exists():
        pytest.skip("reference test.wav not available")
    samples, sr = read_wav(str(REFERENCE_WAV))
    return samples, sr
