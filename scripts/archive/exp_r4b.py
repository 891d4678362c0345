"""Round-4b on-chip: direct-store spectra variant; driver segment vs
per-block fused scan A/B.  ONE TPU process at a time."""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdft_tpu import FAST_PRECISION, Plan, Precision, init_state, \
    roundtrip_hopped
from sdft_tpu.kernels import forward_block_pallas
from sdft_tpu.ops.lti import roundtrip_hopped_block
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

    def run(name, tile_k, super_r, out_dtype=None, direct=True):
        def fwd(st, x):
            return forward_block_pallas(
                plan, st, x, cumsum_mode="toepconv", tile_k=tile_k,
                super_r=super_r, layout="planar", out_dtype=out_dtype,
                direct=direct)

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
            log(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:160]}")
            return
        per = r["seconds"]
        sig = (r["chain_hi_seconds"] - r["chain_lo_seconds"]
               ) / r["chain_hi_seconds"]
        log(f"{name:40s} {per * 1e3:7.3f} ms/block  "
            f"{BLOCK / per / 1e6:6.1f} M samples/s  sig {sig:.0%}  "
            f"relerr {err:.2e}")

    run("direct f32 (K=96, R=4)", 96, 4)
    run("direct f32 (K=64, R=8)", 64, 8)
    run("direct bf16 (K=64, R=8)", 64, 8, "bfloat16")
    run("direct bf16 (K=96, R=4)", 96, 4, "bfloat16")
    del xs

    # --- driver protocol: batched segment vs per-block fused scan ---------
    DRV_M, DRV_HOP, DRV_BLOCK = 1000, 100, 4000
    plan_drv = Plan(DRV_M, window="hann", precision=FAST_PRECISION)
    NB = 520
    xs_d = jax.jit(lambda: jax.random.normal(
        jax.random.key(1), (NB, DRV_BLOCK), jnp.float32))()

    @functools.partial(jax.jit, static_argnums=2)
    def seg_many(state, xs, k):
        st, hd, ys = roundtrip_hopped(plan_drv, state, xs[:k], DRV_HOP)
        return jnp.sum(ys * ys) + jnp.sum(hd)

    def blk_step(st, x):
        st, hd, y = roundtrip_hopped_block(plan_drv, st, x, DRV_HOP,
                                           refresh=True)
        return st, jnp.sum(y * y) + jnp.sum(hd)

    import time as _t

    def timed_pair(fn, k):
        float(fn(k))
        best = float("inf")
        for _ in range(8):
            t0 = _t.perf_counter()
            float(fn(k))
            best = min(best, _t.perf_counter() - t0)
        return best

    st0 = init_state(plan_drv)
    for name, call in [
        ("segment (batched, no scan)", lambda k: seg_many(st0, xs_d, k)),
    ]:
        t_lo = timed_pair(call, 8)
        t_hi = timed_pair(call, NB)
        per = max((t_hi - t_lo) / (NB - 8), t_hi / NB * 1e-9)
        log(f"{name:40s} {per * 1e6:7.1f} us/block  "
            f"{DRV_BLOCK / per / 1e6:6.1f} M samples/s  "
            f"(lo {t_lo * 1e3:.1f} ms, hi {t_hi * 1e3:.1f} ms)")

    r = benchmark_marginal(blk_step, st0, xs_d, k_lo=8, k_hi=NB, repeats=8)
    per = r["seconds"]
    log(f"{'per-block fused scan':40s} {per * 1e6:7.1f} us/block  "
        f"{DRV_BLOCK / per / 1e6:6.1f} M samples/s  "
        f"(lo {r['chain_lo_seconds'] * 1e3:.1f} ms, "
        f"hi {r['chain_hi_seconds'] * 1e3:.1f} ms)")

    # segment at a larger block size (fewer per-block overheads, same
    # protocol by chunking invariance)
    xs_d2 = jax.jit(lambda: jax.random.normal(
        jax.random.key(2), (130, 16000), jnp.float32))()

    @functools.partial(jax.jit, static_argnums=2)
    def seg_many2(state, xs, k):
        st, hd, ys = roundtrip_hopped(plan_drv, state, xs[:k], DRV_HOP)
        return jnp.sum(ys * ys) + jnp.sum(hd)

    t_lo = timed_pair(lambda k: seg_many2(st0, xs_d2, k), 4)
    t_hi = timed_pair(lambda k: seg_many2(st0, xs_d2, k), 130)
    per = (t_hi - t_lo) / (130 - 4)
    log(f"{'segment, 16000-sample blocks':40s} {per * 1e6:7.1f} us/block  "
        f"{16000 / per / 1e6:6.1f} M samples/s  "
        f"(lo {t_lo * 1e3:.1f} ms, hi {t_hi * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
