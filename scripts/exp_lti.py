"""Ad-hoc TPU timing sweep for the collapsed-LTI round trip (not a test).

Times roundtrip_block_lti across k_tile values for single- and multi-channel
configs using the chained-marginal method with chains long enough that the
marginal dominates the ~25 ms host<->tunnel dispatch floor.

    python scripts/exp_lti.py [m] [block]
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
from sdft_tpu.ops.lti import roundtrip_block_lti  # noqa: E402


def marginal(step, state, xs, k_lo, k_hi, n=4):
    @functools.partial(jax.jit, static_argnums=2)
    def many(st, xs, k):
        def body(st, x):
            st, y = step(st, x)
            return st, jnp.sum(y * y)
        st, ys = lax.scan(body, st, xs[:k])
        return jnp.sum(ys)

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


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    plan = Plan(m, window="hann", precision=FAST_PRECISION)
    print(f"backend={jax.default_backend()} m={m} block={block}")
    rng = np.random.default_rng(0)

    for C, k_hi, tiles in ((1, 520, (128, 256, 512, 1024)),
                           (8, 72, (128, 512, 1024))):
        k_lo = 8
        if C == 1:
            xs = jax.device_put(
                rng.standard_normal((k_hi, block)).astype(np.float32))
            state = init_state(plan)
        else:
            xs = jax.device_put(
                rng.standard_normal((k_hi, C, block)).astype(np.float32))
            state = init_state(plan, channels=C)
        for kt in tiles:
            per, t_lo, t_hi = marginal(
                lambda st, x, kt=kt: roundtrip_block_lti(plan, st, x, kt),
                state, xs, k_lo, k_hi)
            agg = C * block / per
            sig = (t_hi - t_lo) / t_hi
            print(f"C={C} k_tile={kt:5d}: {per * 1e3:7.3f} ms/block "
                  f"(lo {t_lo * 1e3:7.1f} hi {t_hi * 1e3:7.1f} "
                  f"signal {sig:.0%}) -> {agg:,.0f} samples/s aggregate",
                  flush=True)


if __name__ == "__main__":
    main()
