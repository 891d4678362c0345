"""Ad-hoc ablation of the collapsed-LTI round trip stages on TPU (not a test).

Times progressively larger prefixes of the pipeline to locate the bottleneck:
  dots      — the two (C*nt, K) @ (K, m) totals GEMMs only
  trig      — + row0 phase rows (periodicity-deduped transcendentals)
  scan      — + rotations, cumsum, prefix, c0 demodulation
  full      — + the three output GEMMs (y)
Also compares dot precision HIGHEST (6-pass f32) vs HIGH (3-pass bf16x3).

    python scripts/exp_ablate.py [m] [block] [channels] [k_tile]
"""

import functools
import pathlib
import sys
import time

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from sdft_tpu import FAST_PRECISION, Plan, init_state  # noqa: E402
from sdft_tpu.ops import lti  # noqa: E402
from sdft_tpu.state import State  # noqa: E402


def stage_fn(plan, stage, k_tile, precision):
    fd = jnp.float32

    def step(state, samples):
        m = plan.dftsize
        n2 = 2 * m
        C, M = samples.shape
        K = k_tile
        nt = M // K
        fine_re, fine_im, P, Q, GLT = (jnp.asarray(a, fd)
                                       for a in lti._lti_constants(plan, K))
        line = jnp.concatenate([state.delayline, samples], axis=-1)
        delta = samples - line[:, :M]
        new_delayline = line[:, M:]
        dt = delta.reshape(C, nt, K)
        hi = precision
        totals_re = jnp.dot(dt, fine_re, precision=hi, preferred_element_type=fd)
        totals_im = jnp.dot(dt, fine_im, precision=hi, preferred_element_type=fd)
        new_state = State(offset=jnp.mod(state.offset + M, n2),
                          delayline=new_delayline,
                          accumulator=state.accumulator)
        if stage == "dots":
            return new_state, totals_re[:, -1] + totals_im[:, -1]
        row0_re, row0_im = lti._phase_rows(state.offset, nt, K, m, fd)
        if stage == "trig":
            return new_state, (totals_re[:, -1] + totals_im[:, -1]
                               + row0_re[:, -1] + row0_im[:, -1])
        rt_re = row0_re * totals_re - row0_im * totals_im
        rt_im = row0_re * totals_im + row0_im * totals_re
        inc_re = jnp.cumsum(rt_re, axis=1)
        inc_im = jnp.cumsum(rt_im, axis=1)
        acc_re = state.accumulator[..., 0][:, None, :]
        acc_im = state.accumulator[..., 1][:, None, :]
        prefix_re = acc_re + jnp.concatenate(
            [jnp.zeros_like(inc_re[:, :1]), inc_re[:, :-1]], axis=1)
        prefix_im = acc_im + jnp.concatenate(
            [jnp.zeros_like(inc_im[:, :1]), inc_im[:, :-1]], axis=1)
        acc_out = jnp.stack([acc_re[:, 0] + inc_re[:, -1],
                             acc_im[:, 0] + inc_im[:, -1]], axis=-1)
        c0_re = prefix_re * row0_re + prefix_im * row0_im
        c0_im = prefix_im * row0_re - prefix_re * row0_im
        new_state = State(offset=new_state.offset, delayline=new_delayline,
                          accumulator=acc_out)
        if stage == "scan":
            return new_state, c0_re[:, -1] + c0_im[:, -1]
        y = (jnp.dot(dt, GLT, precision=hi, preferred_element_type=fd)
             + jnp.dot(c0_re, P.T, precision=hi, preferred_element_type=fd)
             + jnp.dot(c0_im, Q.T, precision=hi, preferred_element_type=fd))
        return new_state, y.reshape(C, M)

    return step


def marginal(step, state, xs, k_lo, k_hi, n=4):
    @functools.partial(jax.jit, static_argnums=2)
    def many(st, xs, k):
        def body(st, x):
            st, y = step(st, x)
            return st, jnp.sum(y * y)
        st, ys = lax.scan(body, st, xs[:k])
        return jnp.sum(ys)

    def timed(k):
        float(many(state, xs, k))
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            float(many(state, xs, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(k_lo)
    t_hi = timed(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo), t_lo, t_hi


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    kt = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    plan = Plan(m, window="hann", precision=FAST_PRECISION)
    print(f"backend={jax.default_backend()} m={m} block={block} C={C} kt={kt}")
    rng = np.random.default_rng(0)
    k_lo, k_hi = 8, 520 if C == 1 else 136
    xs = jax.device_put(
        rng.standard_normal((k_hi, C, block)).astype(np.float32))
    state = init_state(plan, channels=C)

    for prec_name, prec in (("HIGHEST", lax.Precision.HIGHEST),
                            ("HIGH", lax.Precision.HIGH)):
        for stage in ("dots", "trig", "scan", "full"):
            step = stage_fn(plan, stage, kt, prec)
            per, t_lo, t_hi = marginal(step, state, xs, k_lo, k_hi)
            sig = (t_hi - t_lo) / t_hi
            print(f"{prec_name:7s} {stage:5s}: {per * 1e3:7.3f} ms/block "
                  f"(signal {sig:.0%}) -> {C * block / per:,.0f} samples/s",
                  flush=True)


if __name__ == "__main__":
    main()
