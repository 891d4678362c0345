"""Benchmark: forward+inverse round-trip throughput at m=4096 on one chip.

Protocol follows the reference bench (cpp/examples/bench.cpp:11-52: time
sdft+isdft over a fixed sample count, several runs, report the hot-loop
rate) scaled to the BASELINE.json flagship config m=4096.  The headline
metric is samples/s/chip for the full sdft->isdft round trip, float32 fast
path, carried state between blocks (the streaming contract).

vs_baseline is measured against this machine's native C++ oracle engine —
the stand-in for the reference's single-threaded C/C++ implementation
(BASELINE.md: the reference publishes no numbers; the baseline is
self-measured per its bench protocol).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

M_BINS = 4096
BLOCK = 32768
WARMUP = 2
RUNS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu():
    """Time k-chained roundtrip steps inside one program and use the marginal
    cost between two chain lengths.  The chain is sequential (state threaded)
    and ends in a nonlinear scalar that is fetched to host — a hard barrier.
    (block_until_ready alone is unreliable through the hosted TPU tunnel, and
    a linear reduction could be reassociated away by XLA.)"""
    import functools
    import jax
    import jax.numpy as jnp
    from jax import lax
    from sdft_tpu import FAST_PRECISION, Plan, init_state
    from sdft_tpu.kernels import forward_block_pallas, pallas_supported
    from sdft_tpu.ops.lti import roundtrip_block_lti
    from sdft_tpu.ops.analysis import sdft_block
    from sdft_tpu.ops.synthesis import isdft_block

    plan = Plan(M_BINS, window="hann", precision=FAST_PRECISION)
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    use_pallas = pallas_supported()
    log(f"pallas kernels: {'on' if use_pallas else 'off (fallback XLA)'}")

    def chain(step):
        @functools.partial(jax.jit, static_argnums=2)
        def many(state, xs, k):
            def body(st, x):
                st, y = step(st, x)
                return st, jnp.sum(y * y)
            st, ys = lax.scan(body, state, xs[:k])
            return jnp.sum(ys)
        return many

    rng = np.random.default_rng(0)
    k_lo, k_hi = 8, 8 + 4 * RUNS
    xs = jax.device_put(rng.standard_normal((k_hi, BLOCK)).astype(np.float32))
    state = init_state(plan)

    def marginal(many, n=6):
        def timed(k):
            float(many(state, xs, k))  # compile + warm
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                float(many(state, xs, k))
                best = min(best, time.perf_counter() - t0)
            return best
        t_lo = timed(k_lo)
        t_hi = timed(k_hi)
        return (t_hi - t_lo) / (k_hi - k_lo), t_lo, t_hi

    # headline: the collapsed LTI round trip (sdft_tpu.ops.lti) — all FLOPs
    # on the MXU, spectra never materialized (the no-transform fast path)
    many_rt = chain(lambda st, x: roundtrip_block_lti(plan, st, x))
    per_block, t_lo, t_hi = marginal(many_rt)
    rate = BLOCK / per_block
    log(f"tpu roundtrip (LTI): {per_block * 1e3:.3f} ms/block marginal "
        f"(chain {k_lo}: {t_lo * 1e3:.1f} ms, chain {k_hi}: {t_hi * 1e3:.1f} ms) "
        f"-> {rate:,.0f} samples/s")

    # diagnostic: multi-channel endless streaming (BASELINE.json config 5) —
    # batched LTI round trip, aggregate samples/s across C channels
    C = 8
    state_c = init_state(plan, channels=C)
    xs_c = jax.device_put(rng.standard_normal((k_hi, C, BLOCK)).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def many_c(state, xs, k):
        def body(st, x):
            st, y = roundtrip_block_lti(plan, st, x)  # batched: one GEMM
            return st, jnp.sum(y * y)
        st, ys = lax.scan(body, state, xs[:k])
        return jnp.sum(ys)

    def marginal_c(n=4):
        def timed(k):
            float(many_c(state_c, xs_c, k))
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                float(many_c(state_c, xs_c, k))
                best = min(best, time.perf_counter() - t0)
            return best
        t_lo = timed(k_lo)
        t_hi = timed(k_hi)
        return (t_hi - t_lo) / (k_hi - k_lo)

    per_c = marginal_c()
    log(f"tpu roundtrip {C}-channel (LTI): {per_c * 1e3:.3f} ms/block "
        f"-> {C * BLOCK / per_c:,.0f} aggregate samples/s "
        f"({BLOCK / per_c:,.0f} per channel)")

    # diagnostic: forward analysis emitting all spectra (Pallas kernel,
    # planar layout — the kernel's native output; both planes consumed so
    # the full (M, m) spectra hit HBM)
    if use_pallas:
        def fwd(st, x):
            st, (re, im) = forward_block_pallas(plan, st, x, layout="planar")
            return st, jnp.sum(re[:, 0] * re[:, 0]) + jnp.sum(im[:, 0] * im[:, 0])
        per_f, _, _ = marginal(chain(fwd), n=3)
        log(f"tpu forward+spectra (pallas, planar): {per_f * 1e3:.3f} ms/block "
            f"-> {BLOCK / per_f:,.0f} samples/s")
    return rate


def bench_oracle():
    """Native C++ per-sample engine (reference-equivalent CPU baseline)."""
    from sdft_tpu.oracle import NativeSDFT

    n = 2048
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n)
    eng = NativeSDFT(M_BINS, "hann", td_bits=64)
    eng.sdft(x[:64])  # touch caches
    eng.reset()
    t0 = time.perf_counter()
    d = eng.sdft(x)
    y = eng.isdft(d)
    elapsed = time.perf_counter() - t0
    assert y.shape == (n,)
    rate = n / elapsed
    log(f"native oracle roundtrip: {rate:,.0f} samples/s (n={n})")
    return rate


def main():
    tpu_rate = bench_tpu()
    try:
        cpu_rate = bench_oracle()
        vs = tpu_rate / cpu_rate
    except Exception as e:  # oracle build failure must not kill the bench
        log(f"oracle baseline unavailable: {e}")
        vs = 0.0
    print(json.dumps({
        "metric": "roundtrip_samples_per_s_per_chip_m4096",
        "value": round(tpu_rate, 1),
        "unit": "samples/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
