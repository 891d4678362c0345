"""On-chip check + timing of the manual double-buffered output DMA spectra
kernel (toepconv manual_out) vs toephoist.  ONE TPU process at a time.

HISTORICAL: measured against round-3/4 kernel revisions; the
variant knobs it drives (toephoist/fold_conv/direct/manual_out/
DIM_SEMANTICS) were retired in the round-5 pruning — run from the
matching git revision.  Conclusions: docs/PERF.md."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdft_tpu import Plan, Precision, init_state
from sdft_tpu.kernels import forward_block_pallas
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

    # correctness at awkward sizes first: partial tiles, partial super-steps
    for MM in (ACC_BLOCK, 5000):
        @jax.jit
        def _err(x):
            _, want = sdft_block(plan, state, x)
            _, (re, im) = forward_block_pallas(
                plan, state, x, cumsum_mode="toepconv", tile_k=64,
                super_r=4, layout="planar")
            got = jnp.stack([re, im], axis=-1)
            return jnp.max(jnp.abs(got - want)), jnp.max(jnp.abs(want))

        e, sc = _err(xs[0][:MM])
        log(f"M={MM}: relerr {float(e) / float(sc):.2e}")

    def run(name, mode, tile_k=None, super_r=None, out_dtype=None,
            fold_conv=True):
        def fwd(st, x):
            return forward_block_pallas(
                plan, st, x, cumsum_mode=mode, tile_k=tile_k,
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
            log(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            return
        per = r["seconds"]
        sig = (r["chain_hi_seconds"] - r["chain_lo_seconds"]
               ) / r["chain_hi_seconds"]
        log(f"{name:44s} {per * 1e3:7.3f} ms/block  "
            f"{BLOCK / per / 1e6:6.1f} M samples/s  sig {sig:.0%}  "
            f"relerr {err:.2e}")

    run("manual nofold f32 (K=64, R=4)", "toepconv", 64, 4, fold_conv=False)
    run("manual nofold f32 (K=64, R=8)", "toepconv", 64, 8, fold_conv=False)
    run("manual fold f32 (K=64, R=4)", "toepconv", 64, 4)
    run("manual nofold f32 (K=96, R=4)", "toepconv", 96, 4, fold_conv=False)
    run("manual fold bf16 (K=64, R=8)", "toepconv", 64, 8,
        out_dtype="bfloat16")
    run("manual nofold bf16 (K=64, R=8)", "toepconv", 64, 8,
        out_dtype="bfloat16", fold_conv=False)
    run("manual fold bf16 (K=64, R=4)", "toepconv", 64, 4,
        out_dtype="bfloat16")


if __name__ == "__main__":
    main()
