"""Test configuration: two tiers.

Default (CPU) tier: force the CPU backend with 8 virtual devices and x64 —
multi-chip hardware is unavailable in CI; sharding tests run on a virtual
8-device CPU mesh (SURVEY.md §4c) and parity tests use the f64 contract.

TPU tier (``SDFT_TEST_TPU=1 python -m pytest tests -m tpu``): leave platform
selection to the machine's default accelerator plugin and keep x64 OFF (the
TPU runtime has no f64; its x64 rewriter aborts on complex128).  Only tests
marked ``@pytest.mark.tpu`` run — the on-hardware f32 parity gates of
tests/test_tpu.py, the analogue of the reference comparator running on the
real implementation (test/main.py:67-79).

This must run before jax is imported by any test module.
"""

import os

TPU_TIER = os.environ.get("SDFT_TEST_TPU", "") not in ("", "0")

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_TIER:
    # The hosted TPU plugin ("axon") overrides JAX_PLATFORMS at import time;
    # the config update below wins as long as no backend is initialized yet.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: the CPU tier spends minutes recompiling
    # identical programs across runs (local XLA honors the cache; the hosted
    # TPU plugin does not, so the tpu tier skips it)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/sdft_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib  # noqa: E402

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_WAV = pathlib.Path("/root/reference/test/test.wav")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: on-hardware f32 parity gates; run via "
        "SDFT_TEST_TPU=1 python -m pytest tests -m tpu")


def pytest_collection_modifyitems(config, items):
    if TPU_TIER:
        skip = pytest.mark.skip(
            reason="CPU-tier test (x64/virtual-mesh) skipped in the TPU tier")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="TPU tier: run SDFT_TEST_TPU=1 python -m pytest tests -m tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture(scope="session")
def test_wav():
    """The reference 8-second mono 24-bit 44.1 kHz fixture, loaded once."""
    from sdft_tpu.io.wav import read_wav

    if not REFERENCE_WAV.exists():
        pytest.skip("reference test.wav not available")
    samples, sr = read_wav(str(REFERENCE_WAV))
    return samples, sr
