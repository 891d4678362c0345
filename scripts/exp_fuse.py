"""Ad-hoc: LTI round-trip GEMM-fusion variants on TPU (not a test).

Baseline `ops.lti.roundtrip_block_lti` issues 5 MXU dots (2 input totals,
GLT, 2 carry outputs).  Variants measured here:

  base     — the production path (k_tile arg)
  wide     — totals as ONE (C*nt, K) @ (K, 2m) dot (fine_re|fine_im concat)
             and carry output as ONE (C*nt, 2m) @ (2m, K) dot ([P;Q] stack):
             3 dots total; concat cost vs launch overhead
  mxucsum  — `wide` + inter-tile cumsum as an exact-split triangular matmul
             (L exact 0/1, operand 2x bf16) instead of the VPU log-scan

    python scripts/exp_fuse.py [m] [block] [channels] [k_tile]
"""

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    # the hosted TPU plugin overrides the env var at import time; re-assert
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from sdft_tpu import FAST_PRECISION, Plan, init_state  # noqa: E402
from sdft_tpu.ops import lti  # noqa: E402
from sdft_tpu.state import State  # noqa: E402


def variant_fn(plan, variant, K):
    m = plan.dftsize
    n2 = 2 * m
    fd = jnp.float32
    fine_re, fine_im, P, Q, GLT = (np.asarray(a, np.float64)
                                   for a in lti._lti_constants(plan, K))
    fine_cat = jnp.asarray(np.concatenate([fine_re, fine_im], axis=1), fd)
    PQ_T = jnp.asarray(np.concatenate([P.T, Q.T], axis=0), fd)  # (2m, K)
    GLT_j = jnp.asarray(GLT, fd)
    hi = lax.Precision.HIGHEST

    def step(state, samples):
        C, M = samples.shape
        nt = M // K
        line = jnp.concatenate([state.delayline, samples], axis=-1)
        delta = samples - line[:, :M]
        new_delayline = line[:, M:]
        dt = delta.reshape(C, nt, K)

        tot = jnp.dot(dt, fine_cat, precision=hi, preferred_element_type=fd)
        totals_re, totals_im = tot[..., :m], tot[..., m:]

        row0_re, row0_im = lti._phase_rows(state.offset, nt, K, m, fd)
        rt_re = row0_re * totals_re - row0_im * totals_im
        rt_im = row0_re * totals_im + row0_im * totals_re

        if variant == "mxucsum":
            r = lax.broadcasted_iota(jnp.int32, (nt, nt), 0)
            c = lax.broadcasted_iota(jnp.int32, (nt, nt), 1)
            L = (c <= r).astype(jnp.bfloat16)

            def csum(v):
                out = jnp.zeros_like(v)
                rem = v
                for _ in range(2):
                    p = rem.astype(jnp.bfloat16)
                    out = out + jnp.einsum(
                        "ts,csm->ctm", L, p, preferred_element_type=fd)
                    rem = rem - p.astype(fd)
                return out

            inc_re = csum(rt_re)
            inc_im = csum(rt_im)
        else:
            inc_re = jnp.cumsum(rt_re, axis=1)
            inc_im = jnp.cumsum(rt_im, axis=1)

        acc_re = state.accumulator[..., 0].astype(fd)[:, None, :]
        acc_im = state.accumulator[..., 1].astype(fd)[:, None, :]
        prefix_re = acc_re + jnp.concatenate(
            [jnp.zeros_like(inc_re[:, :1]), inc_re[:, :-1]], axis=1)
        prefix_im = acc_im + jnp.concatenate(
            [jnp.zeros_like(inc_im[:, :1]), inc_im[:, :-1]], axis=1)
        acc_out = jnp.stack([acc_re[:, 0] + inc_re[:, -1],
                             acc_im[:, 0] + inc_im[:, -1]], axis=-1)

        c0_re = prefix_re * row0_re + prefix_im * row0_im
        c0_im = prefix_im * row0_re - prefix_re * row0_im
        c_cat = jnp.concatenate([c0_re, c0_im], axis=-1)  # (C, nt, 2m)

        y = (jnp.dot(dt, GLT_j, precision=hi, preferred_element_type=fd)
             + jnp.dot(c_cat, PQ_T, precision=hi, preferred_element_type=fd))
        y = y.reshape(C, M)
        new_state = State(offset=jnp.mod(state.offset + M, n2),
                          delayline=new_delayline, accumulator=acc_out)
        return new_state, y

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
    return (t_hi - t_lo) / (k_hi - k_lo), (t_hi - t_lo) / t_hi


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    kt = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    plan = Plan(m, window="hann", precision=FAST_PRECISION)
    print(f"backend={jax.default_backend()} m={m} block={block} C={C} kt={kt}",
          flush=True)
    rng = np.random.default_rng(0)
    k_lo, k_hi = 8, 520 if C == 1 else 136
    xs = jax.device_put(
        rng.standard_normal((k_hi, C, block)).astype(np.float32))
    state = init_state(plan, channels=C)

    # correctness cross-check of the variants before timing them
    ref_step = variant_fn(plan, "base", kt)
    st_r, y_r = jax.jit(ref_step)(state, xs[0])
    for variant in ("wide", "mxucsum"):
        st_v, y_v = jax.jit(variant_fn(plan, variant, kt))(state, xs[0])
        err = float(jnp.max(jnp.abs(y_v - y_r)))
        aerr = float(jnp.max(jnp.abs(st_v.accumulator - st_r.accumulator)))
        print(f"{variant:8s} parity vs base: y {err:.3e}  acc {aerr:.3e}",
              flush=True)

    for variant in ("base", "wide", "mxucsum"):
        step = variant_fn(plan, variant, kt)
        per, sig = marginal(step, state, xs, k_lo, k_hi)
        print(f"{variant:8s}: {per * 1e3:7.3f} ms/block (signal {sig:.0%}) "
              f"-> {C * block / per:,.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
