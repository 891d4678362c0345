"""Profiling subsystem tests (cost model + marginal timing harness)."""

import jax.numpy as jnp
import numpy as np

from sdft_tpu import FAST_PRECISION, Plan
from sdft_tpu.profiling import (analysis_cost, benchmark, benchmark_marginal,
                                roundtrip_cost, synthesis_cost)


def test_cost_model_scales_linearly():
    plan = Plan(256, window="hann", precision=FAST_PRECISION)
    a1 = analysis_cost(plan, 1024)
    a2 = analysis_cost(plan, 2048)
    assert a2.flops == 2 * a1.flops
    assert a1.intensity > 0

    # boxcar has no halo taps -> strictly fewer flops than blackman
    fb = analysis_cost(Plan(256, window="boxcar"), 1024).flops
    bl = analysis_cost(Plan(256, window="blackman"), 1024).flops
    assert fb < bl

    # reduced latency synthesis does the full complex product
    s1 = synthesis_cost(Plan(256, latency=1.0), 1024)
    s2 = synthesis_cost(Plan(256, latency=0.5), 1024)
    assert s2.flops == 2 * s1.flops

    # fused roundtrip never writes spectra to HBM
    rt = roundtrip_cost(plan, 1024)
    assert rt.hbm_bytes < analysis_cost(plan, 1024).hbm_bytes


def test_benchmark_and_marginal_smoke():
    def step(state, x):
        state = state + jnp.sum(x)
        return state, x * 2.0

    import jax
    jit_step = jax.jit(step)
    res = benchmark(jit_step, (jnp.float32(0.0), jnp.ones((8,), jnp.float32)),
                    iters=2, warmup=1)
    assert res["seconds"] > 0

    xs = jnp.asarray(np.ones((12, 8), np.float32))
    res = benchmark_marginal(step, jnp.float32(0.0), xs, k_lo=2, k_hi=6,
                             repeats=1)
    assert "seconds" in res and np.isfinite(res["seconds"])


def test_bench_mesh_cli_smoke(capsys):
    """bench --mesh runs on the virtual 8-device mesh and emits the
    scaling-efficiency JSON line (BASELINE.md scaling protocol)."""
    import json

    import jax

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    from sdft_tpu.profiling import bench_cli

    rc = bench_cli(["64", "1024", "1", "--mesh", "1x4x2"])
    assert rc == 0
    last = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(last)
    assert payload["mesh"] == {"channel": 1, "time": 4, "bins": 2}
    assert payload["value"] > 0
    assert "scaling_efficiency_vs_1dev" in payload
