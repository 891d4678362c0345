"""hop=1 driver-chain experiment: two-leg route vs single fused kernel.

Candidates at the canonical driver m=1000, chained-marginal on chip:
  two_leg          — toepconv spectra kernel THEN collapsed-LTI synthesis
                     (the pre-experiment route)
  fused_kernel_*   — forward_and_y_pallas: ONE scan-kernel launch emitting
                     spectra + synthesized samples (no second comb/totals
                     pass), with the mxu2 / mxu3 in-kernel cumsum split.

Measured (v5e tunnel, block=8000): two_leg 25.9M samples/s (~3e-6 rel
spectra at m=4096); fused mxu2 31.0M (+20%, 7e-6 rel); fused mxu3 25.5M
(1.7e-6 rel — accuracy back, speed win gone).  SHIPPED: fused mxu2 —
hop=1's founding claim is throughput, and the absolute error at the
m=4096 gate (1.2e-8) stays ~10x under the reference's 1e-7 DFT contract.

Run: python scripts/exp_hop1.py   (ONE TPU user at a time)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sdft_tpu import Plan, Precision, init_state
from sdft_tpu.kernels import forward_and_y_pallas, forward_block_pallas
from sdft_tpu.ops.lti import refresh_state_any, roundtrip_block_lti

M = 1000
PREC = Precision("float32", "float32")


def marginal(many, state, xs, k_lo=4, k_hi=64, n=3):
    def timed(k):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(many(state, xs, k))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    many(state, xs, k_lo)
    many(state, xs, k_hi)
    t_lo, t_hi = timed(k_lo), timed(k_hi)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    return per, (t_hi - t_lo) / t_hi


def main():
    plan = Plan(M, window="hann", precision=PREC)
    rng = np.random.default_rng(0)
    for block in (2000, 8000):
        xs = jnp.asarray(
            rng.standard_normal((64, block)).astype(np.float32))

        @functools.partial(jax.jit, static_argnums=2)
        def two_leg(state, xs, k):
            def body(st, x):
                _, hd = forward_block_pallas(plan, st, x)
                st, y = roundtrip_block_lti(plan, st, x)
                st = refresh_state_any(plan, st)
                return st, jnp.sum(y * y) + jnp.sum(hd[0, 0, 0])
            st, ys = lax.scan(body, state, xs[:k])
            return jnp.sum(ys)

        def make_fused(mode):
            @functools.partial(jax.jit, static_argnums=2)
            def fused(state, xs, k):
                def body(st, x):
                    st, hd, y = forward_and_y_pallas(plan, st, x,
                                                     cumsum_mode=mode)
                    st = refresh_state_any(plan, st)
                    return st, jnp.sum(y * y) + jnp.sum(hd[0, 0, 0])
                st, ys = lax.scan(body, state, xs[:k])
                return jnp.sum(ys)
            return fused

        st = init_state(plan)
        for name, many in (("two_leg", two_leg),
                           ("fused_kernel_mxu2", make_fused("mxu2")),
                           ("fused_kernel_mxu3", make_fused("mxu3"))):
            try:
                per, sig = marginal(many, st, xs)
            except Exception as e:
                print(f"block={block} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            print(f"block={block} {name}: {per * 1e3:.3f} ms/block "
                  f"(signal {sig:.0%}) -> {block / per / 1e6:.1f} M samples/s")


if __name__ == "__main__":
    main()
