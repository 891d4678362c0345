"""Round-4 combined on-chip measurements: lean-bf16 spectra kernel, fused
driver protocol, block=32768 auto-tile check.  ONE TPU process at a time."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdft_tpu import FAST_PRECISION, Plan, Precision, init_state
from sdft_tpu.kernels import forward_block_pallas
from sdft_tpu.ops.lti import roundtrip_block_lti, roundtrip_hopped_block
from sdft_tpu.profiling import benchmark_marginal

M_BINS = 4096
BLOCK = 65536
K_LO, K_HI = 8, 72


def log(*a):
    print(*a, flush=True)


def main():
    plan = Plan(M_BINS, window="hann",
                precision=Precision("float32", "float32"))
    log(f"backend: {jax.default_backend()}")
    xs = jax.jit(lambda: jax.random.normal(
        jax.random.key(0), (K_HI, BLOCK), jnp.float32))()
    state = init_state(plan)

    from sdft_tpu.ops.analysis import sdft_block
    ACC_BLOCK = 8192

    @jax.jit
    def _acc_ref(x):
        _, want = sdft_block(plan, state, x)
        return want, jnp.max(jnp.abs(want))

    want_dev, scale_dev = _acc_ref(xs[0][:ACC_BLOCK])
    scale = float(scale_dev)

    def run(name, tile_k, super_r, out_dtype=None, fold_conv=True):
        def fwd(st, x):
            return forward_block_pallas(
                plan, st, x, cumsum_mode="toepconv", tile_k=tile_k,
                super_r=super_r, layout="planar", out_dtype=out_dtype,
                fold_conv=fold_conv)

        def step(st, x):
            st, (re, im) = fwd(st, x)
            r32 = re[:, 0].astype(jnp.float32)
            i32 = im[:, 0].astype(jnp.float32)
            return st, jnp.sum(r32 * r32) + jnp.sum(i32 * i32)

        @jax.jit
        def _acc_err(x, want):
            _, (re, im) = fwd(state, x)
            got = jnp.stack([re.astype(jnp.float32),
                             im.astype(jnp.float32)], axis=-1)
            return jnp.max(jnp.abs(got - want))

        try:
            err = float(_acc_err(xs[0][:ACC_BLOCK], want_dev)) / scale
            r = benchmark_marginal(step, state, xs, k_lo=K_LO, k_hi=K_HI,
                                   repeats=3)
        except Exception as e:
            log(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            return
        per = r["seconds"]
        sig = (r["chain_hi_seconds"] - r["chain_lo_seconds"]
               ) / r["chain_hi_seconds"]
        log(f"{name:40s} {per * 1e3:7.3f} ms/block  "
            f"{BLOCK / per / 1e6:6.1f} M samples/s  sig {sig:.0%}  "
            f"relerr {err:.2e}")

    run("lean fold bf16 (K=64, R=8)", 64, 8, "bfloat16")
    run("lean fold bf16 (K=64, R=16)", 64, 16, "bfloat16")
    run("lean nofold bf16 (K=64, R=8)", 64, 8, "bfloat16", fold_conv=False)
    run("lean fold bf16 (K=96, R=4)", 96, 4, "bfloat16")
    del xs

    # --- fused driver protocol (m=1000, hop=100, chained) -----------------
    DRV_M, DRV_HOP, DRV_BLOCK = 1000, 100, 4000
    plan_drv = Plan(DRV_M, window="hann", precision=FAST_PRECISION)
    xs_d = jax.jit(lambda: jax.random.normal(
        jax.random.key(1), (520, DRV_BLOCK), jnp.float32))()

    def drv_fused(st, x):
        st, hd, y = roundtrip_hopped_block(plan_drv, st, x, DRV_HOP,
                                           refresh=True)
        return st, jnp.sum(y * y) + jnp.sum(hd)

    def drv_legacy(st, x):
        from sdft_tpu.ops.analysis import refresh_state
        from sdft_tpu.ops.lti import sdft_hopped
        _, hd = sdft_hopped(plan_drv, st, x, DRV_HOP)
        st, y = roundtrip_block_lti(plan_drv, st, x)
        st = refresh_state(plan_drv, st)
        return st, jnp.sum(y * y) + jnp.sum(hd)

    for name, fn in [("driver fused (refresh=1)", drv_fused),
                     ("driver legacy 2-pass", drv_legacy),
                     ("driver fused (rpt)", drv_fused)]:
        r = benchmark_marginal(fn, init_state(plan_drv), xs_d, k_lo=8,
                               k_hi=520, repeats=8)
        per = r["seconds"]
        sig = (r["chain_hi_seconds"] - r["chain_lo_seconds"]
               ) / r["chain_hi_seconds"]
        log(f"{name:40s} {per * 1e6:7.1f} us/block  "
            f"{DRV_BLOCK / per / 1e6:6.1f} M samples/s  sig {sig:.0%}")
    del xs_d

    # --- block=32768 auto-tile consistency row (VERDICT r3 weak#4) --------
    xs2 = jax.jit(lambda: jax.random.normal(
        jax.random.key(2), (520, 32768), jnp.float32))()
    for kt in (None,):
        def rt(st, x, kt=kt):
            return roundtrip_block_lti(plan, st, x, kt)
        r = benchmark_marginal(rt, init_state(plan), xs2, k_lo=8, k_hi=520,
                               repeats=4)
        per = r["seconds"]
        sig = (r["chain_hi_seconds"] - r["chain_lo_seconds"]
               ) / r["chain_hi_seconds"]
        log(f"block32768 k_tile={str(kt):4s} {per * 1e6:7.1f} us/block  "
            f"{32768 / per / 1e6:6.1f} M samples/s  sig {sig:.0%}")


if __name__ == "__main__":
    main()
