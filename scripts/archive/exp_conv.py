"""On-chip sweep: super-tiled spectra kernel variants vs the shipped
toephoist kernel at the flagship config m=4096, block=65536.
Chained-marginal timing; one accuracy row per variant vs the on-chip XLA
scan path.  ONE process on the TPU at a time.

HISTORICAL: measured against round-3/4 kernel revisions; the
variant knobs it drives (toephoist/fold_conv/direct/manual_out/
DIM_SEMANTICS) were retired in the round-5 pruning — run from the
matching git revision.  Conclusions: docs/PERF.md."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sdft_tpu import Plan, Precision, init_state
from sdft_tpu.kernels import analysis_pallas as ap
from sdft_tpu.kernels import forward_block_pallas
from sdft_tpu.profiling import benchmark_marginal

M_BINS = 4096
BLOCK = 65536
K_LO, K_HI = 8, 72


def log(*a):
    print(*a, flush=True)


def set_dimsem(sem):
    if ap.DIM_SEMANTICS != sem:
        ap.DIM_SEMANTICS = sem
        ap._launch_spectra_toeplitz.clear_cache()
        ap._launch_spectra_conv.clear_cache()


def main():
    plan = Plan(M_BINS, window="hann",
                precision=Precision("float32", "float32"))
    log(f"backend: {jax.default_backend()}")

    xs = jax.jit(lambda: jax.random.normal(
        jax.random.key(0), (K_HI, BLOCK), jnp.float32))()
    state = init_state(plan)

    # accuracy reference: a small block through the XLA scan path, error
    # reduced ON DEVICE (full spectra fetches are unsupported on the tunnel)
    from sdft_tpu.ops.analysis import sdft_block
    ACC_BLOCK = 8192

    @jax.jit
    def _acc_ref(x):
        _, want = sdft_block(plan, state, x)
        return want, jnp.max(jnp.abs(want))

    want_dev, scale_dev = _acc_ref(xs[0][:ACC_BLOCK])
    scale = float(scale_dev)

    def run(name, mode, tile_k=None, super_r=None, out_dtype=None,
            fold_conv=True, dimsem=("arbitrary",)):
        set_dimsem(dimsem)

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
            log(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:100]}")
            return
        per = r["seconds"]
        sig = (r["chain_hi_seconds"] - r["chain_lo_seconds"]
               ) / r["chain_hi_seconds"]
        log(f"{name:44s} {per * 1e3:7.3f} ms/block  "
            f"{BLOCK / per / 1e6:6.1f} M samples/s  sig {sig:.0%}  "
            f"relerr {err:.2e}")

    PAR = ("parallel",)
    run("toephoist f32 (K=96)", "toephoist")
    run("toephoist f32 (K=96) dimsem=par", "toephoist", dimsem=PAR)
    run("nofold f32 (K=64, R=4)", "toepconv", 64, 4, fold_conv=False)
    run("nofold f32 (K=64, R=8)", "toepconv", 64, 8, fold_conv=False)
    run("nofold f32 (K=96, R=4)", "toepconv", 96, 4, fold_conv=False)
    run("nofold f32 (K=64, R=8) dimsem=par", "toepconv", 64, 8,
        fold_conv=False, dimsem=PAR)
    run("fold f32 (K=64, R=4)", "toepconv", 64, 4)
    run("fold f32 (K=64, R=8) dimsem=par", "toepconv", 64, 8, dimsem=PAR)
    run("toephoist bf16 (K=96)", "toephoist", out_dtype="bfloat16")
    run("nofold bf16 (K=64, R=8)", "toepconv", 64, 8,
        out_dtype="bfloat16", fold_conv=False)
    run("nofold bf16 (K=64, R=8) dimsem=par", "toepconv", 64, 8,
        out_dtype="bfloat16", fold_conv=False, dimsem=PAR)
    run("fold bf16 (K=64, R=8)", "toepconv", 64, 8, out_dtype="bfloat16")
    run("fold bf16 (K=32, R=8)", "toepconv", 32, 8, out_dtype="bfloat16")


if __name__ == "__main__":
    main()
