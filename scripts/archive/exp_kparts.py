"""Microbenchmark the fused-kernel building blocks in isolation on the chip:
which of (6 bf16 split dots | carry+conv VPU chain | pure store) dominates a
(K, W) -> (K, m) spectra tile?  Chained-marginal over grid steps.

HISTORICAL: measured against round-3/4 kernel revisions; the
variant knobs it drives (toephoist/fold_conv/direct/manual_out/
DIM_SEMANTICS) were retired in the round-5 pruning — run from the
matching git revision.  Conclusions: docs/PERF.md."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

m, K, PAD = 4096, 128, 64
W = m + 2 * PAD
NT = 1536         # tiles per call (outputs ~6.4 GB; v5e has 16)


def make(body, n_scratch_f32=2, n_bf16=0, with_toep=False, nt=NT):
    def kernel(*refs):
        body(*refs)

    in_specs = [pl.BlockSpec((8, W), lambda t: (t, 0), memory_space=pltpu.VMEM)]
    n_in = 1
    if with_toep:
        in_specs += [pl.BlockSpec((K, K), lambda t: (t, 0),
                                  memory_space=pltpu.VMEM)] * 2
        n_in = 3
    scratch = ([pltpu.VMEM((K, W), jnp.float32)] * n_scratch_f32
               + [pltpu.VMEM((K, W), jnp.bfloat16)] * n_bf16)

    @jax.jit
    def run(c0, thi, tlo):
        args = (c0,) + ((thi, tlo) if with_toep else ())
        return pl.pallas_call(
            kernel, grid=(nt,),
            in_specs=in_specs,
            out_shape=(jax.ShapeDtypeStruct((nt * K, m), jnp.float32),) * 2,
            out_specs=(pl.BlockSpec((K, m), lambda t: (t, 0),
                                    memory_space=pltpu.VMEM),) * 2,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)
    return run


NT_LO = 64


def bench(name, mk, args, n=6):
    # marginal method: the tunnel RTT (~25-50 ms) dwarfs the kernel, so time
    # the same kernel at two grid lengths and report the per-tile difference
    run_lo, run_hi = mk(NT_LO), mk(NT)

    def once(run):
        o1, o2 = run(*args)
        return float(o1[-1, -1])  # one fetch: one ~25 ms RTT, o2 same program

    def timed(run):
        once(run)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            once(run)
            best = min(best, time.perf_counter() - t0)
        return best
    t_lo, t_hi = timed(run_lo), timed(run_hi)
    per = (t_hi - t_lo) / (NT - NT_LO)
    print(f"{name}: {per*1e6:.2f} us/tile (signal {(t_hi-t_lo)/t_hi:.0%})",
          flush=True)


def init_dmf(dmf_re, dmf_im):
    kk = lax.broadcasted_iota(jnp.int32, (K, W), 0)
    iw = lax.broadcasted_iota(jnp.int32, (K, W), 1) - PAD
    ang = np.float32(-np.pi / m) * jnp.mod(kk * iw, 2 * m).astype(jnp.float32)
    dmf_re[:] = jnp.cos(ang)
    dmf_im[:] = jnp.sin(ang)


def main():
    c0 = jnp.ones((NT * 8, W), jnp.float32)
    thi = jnp.ones((NT * K, K), jnp.bfloat16)
    tlo = jnp.ones((NT * K, K), jnp.bfloat16) * 0.001

    # 1. store-only: write constant planes (measures output DMA floor)
    def store_only(c0_ref, o1, o2, s1, s2):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            init_dmf(s1, s2)
        o1[:] = s1[:, PAD:PAD + m]
        o2[:] = s2[:, PAD:PAD + m]
    bench("store-only      ", lambda nt: make(store_only, nt=nt), (c0, thi, tlo))

    # 2. dots-only: 6 bf16 dots, store results
    def dots_only(c0_ref, thi_ref, tlo_ref, o1, o2, s1, s2, b1, b2):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            init_dmf(s1, s2)
            b1[:] = s1[:].astype(jnp.bfloat16)
            b2[:] = s2[:].astype(jnp.bfloat16)
        th, tl = thi_ref[:], tlo_ref[:]

        def split3(b):
            out = jnp.dot(th, b[:], preferred_element_type=jnp.float32)
            out = out + jnp.dot(th, b[:], preferred_element_type=jnp.float32)
            return out + jnp.dot(tl, b[:], preferred_element_type=jnp.float32)
        o1[:] = split3(b1)[:, PAD:PAD + m]
        o2[:] = split3(b2)[:, PAD:PAD + m]
    bench("dots-only (6)   ", lambda nt: make(dots_only, 2, 2, True, nt=nt), (c0, thi, tlo))

    # 3. vpu-only: carry + conv chain, no dots
    def vpu_only(c0_ref, o1, o2, s1, s2):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            init_dmf(s1, s2)
        cr = c0_ref[0:1, :]
        ci = c0_ref[1:2, :]
        aux_re = cr * s1[:] - ci * s2[:]
        aux_im = cr * s2[:] + ci * s1[:]
        c0t, c1t = np.float32(0.5), np.float32(-0.25)

        def conv(a):
            return (c0t * a[:, PAD:PAD + m]
                    + c1t * (a[:, PAD - 1:PAD + m - 1]
                             + a[:, PAD + 1:PAD + m + 1]))
        o1[:] = conv(aux_re)
        o2[:] = conv(aux_im)
    bench("vpu carry+conv  ", lambda nt: make(vpu_only, nt=nt), (c0, thi, tlo))

    # 4. full: dots + carry + conv
    def full(c0_ref, thi_ref, tlo_ref, o1, o2, s1, s2, b1, b2):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            init_dmf(s1, s2)
            b1[:] = s1[:].astype(jnp.bfloat16)
            b2[:] = s2[:].astype(jnp.bfloat16)
        th, tl = thi_ref[:], tlo_ref[:]

        def split3(b):
            out = jnp.dot(th, b[:], preferred_element_type=jnp.float32)
            out = out + jnp.dot(th, b[:], preferred_element_type=jnp.float32)
            return out + jnp.dot(tl, b[:], preferred_element_type=jnp.float32)
        cr = c0_ref[0:1, :]
        ci = c0_ref[1:2, :]
        aux_re = split3(b1) + (cr * s1[:] - ci * s2[:])
        aux_im = split3(b2) + (cr * s2[:] + ci * s1[:])
        c0t, c1t = np.float32(0.5), np.float32(-0.25)

        def conv(a):
            return (c0t * a[:, PAD:PAD + m]
                    + c1t * (a[:, PAD - 1:PAD + m - 1]
                             + a[:, PAD + 1:PAD + m + 1]))
        o1[:] = conv(aux_re)
        o2[:] = conv(aux_im)
    bench("full            ", lambda nt: make(full, 2, 2, True, nt=nt), (c0, thi, tlo))




def main2():
    """Case 5: dmf arrives as constant-index-map INPUTS (the real kernel's
    layout) instead of scratch — measures whether Pallas re-fetches
    revisited input blocks per grid step."""
    c0 = jnp.ones((NT * 8, W), jnp.float32)
    thi = jnp.ones((NT * K, K), jnp.bfloat16)
    tlo = jnp.ones((NT * K, K), jnp.bfloat16) * 0.001
    d1 = jnp.ones((K, W), jnp.float32)
    d2 = jnp.ones((K, W), jnp.float32) * 0.5
    b1 = d1.astype(jnp.bfloat16)
    b2 = d2.astype(jnp.bfloat16)

    def kern(c0_ref, thi_ref, tlo_ref, d1_ref, d2_ref, b1_ref, b2_ref,
             o1, o2):
        th, tl = thi_ref[:], tlo_ref[:]

        def split3(b):
            out = jnp.dot(th, b[:], preferred_element_type=jnp.float32)
            out = out + jnp.dot(th, b[:], preferred_element_type=jnp.float32)
            return out + jnp.dot(tl, b[:], preferred_element_type=jnp.float32)
        cr = c0_ref[0:1, :]
        ci = c0_ref[1:2, :]
        aux_re = split3(b1_ref) + (cr * d1_ref[:] - ci * d2_ref[:])
        aux_im = split3(b2_ref) + (cr * d2_ref[:] + ci * d1_ref[:])
        c0t, c1t = np.float32(0.5), np.float32(-0.25)

        def conv(a):
            return (c0t * a[:, PAD:PAD + m]
                    + c1t * (a[:, PAD - 1:PAD + m - 1]
                             + a[:, PAD + 1:PAD + m + 1]))
        o1[:] = conv(aux_re)
        o2[:] = conv(aux_im)

    def mk(nt):
        table = lambda shp, dt: pl.BlockSpec(shp, lambda t: (0, 0),
                                             memory_space=pltpu.VMEM)

        @jax.jit
        def run(c0, thi, tlo):
            return pl.pallas_call(
                kern, grid=(nt,),
                in_specs=[
                    pl.BlockSpec((8, W), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, K), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, K), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM),
                    table((K, W), jnp.float32), table((K, W), jnp.float32),
                    table((K, W), jnp.bfloat16), table((K, W), jnp.bfloat16),
                ],
                out_shape=(jax.ShapeDtypeStruct((nt * K, m), jnp.float32),) * 2,
                out_specs=(pl.BlockSpec((K, m), lambda t: (t, 0),
                                        memory_space=pltpu.VMEM),) * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(c0, thi, tlo, d1, d2, b1, b2)
        return run
    bench("full w/ table-ins", mk, (c0, thi, tlo))


if __name__ == "__main__":
    main2() if "tables" in sys.argv else main()
