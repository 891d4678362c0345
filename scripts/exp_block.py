"""Probe the block-size anomaly (docs/PERF.md "Block-size anomaly").

At m=4096, k_tile=128, block=16384 measured ~3x MORE per block than
block=32768 despite half the work.  Hypothesis: the cost cliff tracks the
tile count nt = block/k_tile (XLA layout/fusion choice for the (C*nt, K)
GEMM row dim), not the block length.  Sweep (block, k_tile) pairs and
report ms/block + samples/s so the pairs with equal nt can be compared.

Methodology matches bench.py: data generated ON DEVICE (host->device
transfers stall the hosted tunnel), chained-marginal timing between an
8-block and a long dependency chain ending in a host-fetched scalar.

Run on the real chip (one TPU process at a time):
    python scripts/exp_block.py [m]
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
from jax import lax             # noqa: E402

from sdft_tpu import FAST_PRECISION, Plan, init_state   # noqa: E402
from sdft_tpu.ops.lti import roundtrip_block_lti        # noqa: E402

K_LO, K_HI = 8, 520


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    plan = Plan(m, window="hann", precision=FAST_PRECISION)
    state = init_state(plan)
    print(f"device: {jax.devices()[0].device_kind} ({jax.default_backend()})",
          flush=True)

    import ast
    if len(sys.argv) > 2:
        configs = ast.literal_eval(sys.argv[2])
    else:
        configs = [
        # (block, k_tile) — nt = block // k_tile
        (32768, 128),   # nt=256: the fast flagship config
        (16384, 128),   # nt=128: the anomaly
        (16384, 64),    # nt=256: same nt as flagship, half block
        (16384, 256),   # nt=64
        (8192, 32),     # nt=256, quarter block
        (65536, 256),   # nt=256, double block
    ]
    for block, k_tile in configs:
        @functools.partial(jax.jit, static_argnums=2)
        def many(st, xs, k, k_tile=k_tile):
            def body(s, x):
                s, y = roundtrip_block_lti(plan, s, x, k_tile)
                return s, jnp.sum(y * y)
            _, ys = lax.scan(body, st, xs[:k])
            return jnp.sum(ys)

        xs = jax.jit(lambda b=block: jax.random.normal(
            jax.random.key(0), (K_HI, b), jnp.float32))()

        def timed(k):
            float(many(state, xs, k))  # compile + warm
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(many(state, xs, k))
                best = min(best, time.perf_counter() - t0)
            return best

        t0 = time.time()
        t_lo, t_hi = timed(K_LO), timed(K_HI)
        per = (t_hi - t_lo) / (K_HI - K_LO)
        sig = (t_hi - t_lo) / t_hi
        nt = block // k_tile
        print(f"block={block:6d} k_tile={k_tile:4d} nt={nt:4d}: "
              f"{per * 1e3:7.3f} ms/block (signal {sig:.0%}) -> "
              f"{block / per:14,.0f} samples/s "
              f"(compile+run {time.time() - t0:.0f}s)", flush=True)
        del xs


if __name__ == "__main__":
    main()
