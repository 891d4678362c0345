"""Ad-hoc sweep: forward+spectra Pallas kernel vs its HBM-write roofline.

VERDICT r1 weak#4: 2.66 ms/block at m=4096, M=32768 vs the ~1.31 ms write
floor (1.07 GB spectra at 819 GB/s).  Sweeps tile_k x cumsum_mode on the
planar layout and prints ms/block + % of roofline.

    python scripts/exp_fwd.py [m] [block] [k_lo] [k_hi]


HISTORICAL: measured against round-3/4 kernel revisions; the
variant knobs it drives (toephoist/fold_conv/direct/manual_out/
DIM_SEMANTICS) were retired in the round-5 pruning — run from the
matching git revision.  Conclusions: docs/PERF.md."""

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from sdft_tpu import FAST_PRECISION, Plan, init_state  # noqa: E402
from sdft_tpu.kernels import analysis_pallas as ap  # noqa: E402
from sdft_tpu.profiling import device_peaks  # noqa: E402


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    k_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    k_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 44

    plan = Plan(m, window="hann", precision=FAST_PRECISION)
    dev = jax.devices()[0]
    _, bw = device_peaks(dev)
    bw = bw or 819e9
    floor = 2 * block * m * 4 / bw
    print(f"backend={jax.default_backend()} kind={dev.device_kind} m={m} "
          f"block={block}; write floor {floor * 1e3:.2f} ms "
          f"({2 * block * m * 4 / 2**30:.2f} GiB @ {bw / 1e9:.0f} GB/s)",
          flush=True)

    rng = np.random.default_rng(0)
    xs = jax.device_put(rng.standard_normal((k_hi, block)).astype(np.float32))
    state = init_state(plan)

    def bench(tile_k, cumsum_mode):
        @functools.partial(jax.jit, static_argnums=2)
        def many(st, xs, k):
            def body(st, x):
                st, (re, im) = ap.forward_block_pallas(
                    plan, st, x, cumsum_mode=cumsum_mode, tile_k=tile_k,
                    layout="planar")
                return st, jnp.sum(re[:, 0] * re[:, 0]) + jnp.sum(im[:, 0] * im[:, 0])
            st, ys = lax.scan(body, st, xs[:k])
            return jnp.sum(ys)

        def timed(k):
            float(many(state, xs, k))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(many(state, xs, k))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo = timed(k_lo)
        t_hi = timed(k_hi)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        sig = (t_hi - t_lo) / t_hi
        print(f"tile_k={tile_k:4d} cumsum={cumsum_mode:7s}: "
              f"{per * 1e3:7.3f} ms/block (signal {sig:.0%}) = "
              f"{floor / per:5.1%} of write roofline -> "
              f"{block / per:,.0f} samples/s", flush=True)

    # tile_k 512 is omitted: Mosaic's register allocator spills ~66 MB of
    # (K, W) temporaries at that size and the program exceeds the 128 MB
    # vmem budget (measured 2026-08; 256 already regresses 2.5x vs 128 for
    # the same reason).  128 is the sweet spot on v5e.
    for tile_k in (128, 256):
        for mode in ("mxu2", "vpu"):
            if block % tile_k:
                continue
            bench(tile_k, mode)


if __name__ == "__main__":
    main()
