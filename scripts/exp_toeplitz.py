"""A/B the Toeplitz kernel variant vs the mxu2 cumsum variant on the chip.

Chained-marginal timing (sdft_tpu.profiling convention) of the forward+
spectra path at the flagship config; prints ms/block and samples/s.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from sdft_tpu import FAST_PRECISION, Plan, init_state
from sdft_tpu.kernels import forward_block_pallas

M_BINS = 4096
BLOCK = int(__import__("os").environ.get("EXP_BLOCK", 65536))
K_LO, K_HI = 8, 136


def chain(step):
    @functools.partial(jax.jit, static_argnums=2)
    def many(state, xs, k):
        def body(st, x):
            st, (re, im) = step(st, x)
            return st, jnp.sum(re[:, 0] * re[:, 0]) + jnp.sum(im[:, 0] * im[:, 0])
        st, ys = lax.scan(body, state, xs[:k])
        return jnp.sum(ys)
    return many


def marginal(many, state, xs, n=3):
    def timed(k):
        float(many(state, xs, k))
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            float(many(state, xs, k))
            best = min(best, time.perf_counter() - t0)
        return best
    t_lo, t_hi = timed(K_LO), timed(K_HI)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    return per, (t_hi - t_lo) / t_hi


def main():
    plan = Plan(M_BINS, window="hann", precision=FAST_PRECISION)
    state = init_state(plan)
    xs = jax.jit(lambda: jax.random.normal(jax.random.key(0), (K_HI, BLOCK),
                                           jnp.float32))()
    for mode in sys.argv[1:] or ("mxu2", "toeplitz", "toepconv"):
        odt = "bfloat16" if "+bf16" in mode else None
        cm = mode.replace("+bf16", "")
        tk = 128
        if "@" in cm:
            cm, tk = cm.split("@")[0], int(cm.split("@")[1])
        step = lambda st, x: forward_block_pallas(plan, st, x, layout="planar",
                                                  cumsum_mode=cm, tile_k=tk,
                                                  out_dtype=odt)
        per, sig = marginal(chain(step), state, xs)
        print(f"{mode}: {per*1e3:.3f} ms/block (signal {sig:.0%}) "
              f"-> {BLOCK/per:,.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
