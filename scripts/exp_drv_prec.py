"""On-chip: driver-protocol chain under the three MXU accuracy modes —
throughput + accuracy vs the f64 oracle.  ONE TPU process at a time."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdft_tpu import Plan, Precision, init_state
from sdft_tpu.cplx import to_complex
from sdft_tpu.ops.lti import roundtrip_hopped_block
from sdft_tpu.profiling import benchmark_marginal

DRV_M, DRV_HOP, DRV_BLOCK = 1000, 100, 4000


def log(*a):
    print(*a, flush=True)


def main():
    log(f"backend: {jax.default_backend()}")
    xs = jax.jit(lambda: jax.random.normal(
        jax.random.key(1), (520, DRV_BLOCK), jnp.float32))()

    from sdft_tpu.oracle import NativeSDFT
    eng = NativeSDFT(DRV_M, "hann", td_bits=64)
    x0 = np.asarray(xs[0])
    d_ref = eng.sdft(x0.astype(np.float64))
    y_ref = eng.isdft(d_ref)

    for mode in ("highest", "high", "split4"):
        plan = Plan(DRV_M, window="hann",
                    precision=Precision("float32", "float32", mxu=mode))

        def step(st, x, plan=plan):
            st, hd, y = roundtrip_hopped_block(plan, st, x, DRV_HOP,
                                               refresh=True)
            return st, jnp.sum(y * y) + jnp.sum(hd)

        st, hd, y = roundtrip_hopped_block(plan, init_state(plan), xs[0],
                                           DRV_HOP, refresh=True)
        derr = np.abs(to_complex(np.asarray(hd)) - d_ref[::DRV_HOP]).max()
        yerr = np.abs(np.asarray(y) - y_ref).max()
        r = benchmark_marginal(step, init_state(plan), xs, k_lo=8, k_hi=520,
                               repeats=8)
        per = r["seconds"]
        sig = (r["chain_hi_seconds"] - r["chain_lo_seconds"]
               ) / r["chain_hi_seconds"]
        log(f"driver mxu={mode:8s} {per * 1e6:7.1f} us/block  "
            f"{DRV_BLOCK / per / 1e6:6.1f} M samples/s  sig {sig:.0%}  "
            f"dft err {derr:.2e}  y err {yerr:.2e}")


if __name__ == "__main__":
    main()
