"""Round-5 decisive roofline experiment for the spectra kernel.

The round-4 VMEM-bandwidth model (docs/PERF.md) prices per output row
~165 KB of VMEM traffic at ~2.7 TB/s: dots temp (K,2W) write+read
(67 KB/row), dmf carry-demod planes read (34 KB/row), output staging
(write + DMA read).  Its headline prediction — the "lean" bf16 tables
halve the dominant terms — measured NO speedup, so round 5 measures the
MARGINAL price of each traffic term directly:

  * junk-column inflation: widen b_conv by J columns -> the dots temp
    (the ONLY thing that changes) grows by 8*J bytes/row (write+read).
    If the term is bandwidth-priced, ns/row rises with slope ~1/BW.
  * dmf shadow: per-subtile (K, W) f32 planes read with a runtime-zero
    coefficient -> +34 KB/row of pure VMEM reads, zero extra math
    reaching the output.
  * dots_bf16: round the contraction output to bf16 at the matmul store
    -> dots temp halves IF Mosaic fuses the cast into the store.
  * W-sweep: m in {2048, 4096, 8192} at fixed K, R -> ALL terms scale
    with W; the model predicts ns/row proportional to W.

HISTORICAL: this script ran against the round-5 pre-pruning revision
(commit 3634480, whose kernel carried the lean/dmf_shadow/dots_bf16/
junk-width probe knobs).  After the experiment falsified the bandwidth
model, the probes and every rejected variant were deleted from
kernels/analysis_pallas.py — re-running requires checking out that
commit.  Results and the corrected model: docs/PERF.md round-5.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdft_tpu import Plan, Precision, init_state
from sdft_tpu.kernels import analysis_pallas as ap
from sdft_tpu.profiling import benchmark_marginal

BLOCK = 65536
K_LO, K_HI = 8, 72


def log(*a):
    print(*a, flush=True)


def tables_for(plan, K, fold, lean, junk_cols=0):
    tabs = list(ap._spectra_tables_conv(plan, K, fold, lean)
                + ap._coarse_rows_host(plan, K))
    if junk_cols:
        # widen the contraction table with nonzero junk columns (zeros
        # could in principle be elided; random is opaque)
        b = tabs[4]
        pad = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (b.shape[0], junk_cols)), jnp.bfloat16)
        tabs[4] = jnp.concatenate([b, pad], axis=1)
    return tuple(tabs)


def run(plan, xs, state, want_dev, scale, name, K, R, fold=False,
        lean=False, junk_cols=0, dmf_shadow=False, dots_bf16=False,
        out_dtype=None, power=False, acc_block=8192):
    tabs = tables_for(plan, K, fold, lean, junk_cols)

    def fwd(st, x):
        return ap._launch_spectra_conv(
            plan, st, x, tabs, False, K, R, "planar", out_dtype,
            fold, lean, False, power, dmf_shadow, dots_bf16)

    def step(st, x):
        st, out = fwd(st, x)
        if power:
            return st, jnp.sum(out[:, 0].astype(jnp.float32) ** 2)
        re, im = out
        r32 = re[:, 0].astype(jnp.float32)
        i32 = im[:, 0].astype(jnp.float32)
        return st, jnp.sum(r32 * r32) + jnp.sum(i32 * i32)

    @jax.jit
    def _acc_err(x, want):
        _, out = fwd(state, x)
        if power:
            wpow = want[..., 0] ** 2 + want[..., 1] ** 2
            return jnp.max(jnp.abs(out.astype(jnp.float32) - wpow))
        re, im = out
        got = jnp.stack([re.astype(jnp.float32),
                         im.astype(jnp.float32)], axis=-1)
        return jnp.max(jnp.abs(got - want))

    try:
        err = float(_acc_err(xs[0][:acc_block], want_dev)) / (
            scale * scale if power else scale)
        r = benchmark_marginal(step, state, xs, k_lo=K_LO, k_hi=K_HI,
                               repeats=3)
    except Exception as e:
        log(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:110]}")
        return None
    per = r["seconds"]
    sig = (r["chain_hi_seconds"] - r["chain_lo_seconds"]
           ) / r["chain_hi_seconds"]
    ns_row = per / xs.shape[1] * 1e9
    log(f"{name:46s} {per * 1e3:7.3f} ms/block  {ns_row:6.1f} ns/row  "
        f"{xs.shape[1] / per / 1e6:6.1f} M/s  sig {sig:.0%}  "
        f"relerr {err:.2e}")
    return ns_row


def main():
    log(f"backend: {jax.default_backend()}")

    def setup(m_bins, block=BLOCK):
        plan = Plan(m_bins, window="hann",
                    precision=Precision("float32", "float32"))
        xs = jax.jit(lambda: jax.random.normal(
            jax.random.key(0), (K_HI, block), jnp.float32))()
        state = init_state(plan)
        from sdft_tpu.ops.analysis import sdft_block
        acc_block = 8192

        @jax.jit
        def _acc_ref(x):
            _, want = sdft_block(plan, state, x)
            return want, jnp.max(jnp.abs(want))

        want_dev, scale_dev = _acc_ref(xs[0][:acc_block])
        return plan, xs, state, want_dev, float(scale_dev)

    m = 4096
    W = ap._round_up(m, 128) + 2 * ap.PAD
    env = setup(m)

    log("== baseline and inflation probes (m=4096, nofold, K=64, R=4) ==")
    run(*env, "base f32", 64, 4)
    run(*env, f"junk +W ({4 * W // 1024} KB/row extra)", 64, 4, junk_cols=W)
    run(*env, f"junk +2W ({8 * W // 1024} KB/row extra)", 64, 4,
        junk_cols=2 * W)
    run(*env, "dmf shadow (+2 f32 planes read/row)", 64, 4, dmf_shadow=True)
    run(*env, "lean dmf bf16 (-17 KB/row read)", 64, 4, lean=True)
    run(*env, "dots temp bf16 (-34 KB/row if fused)", 64, 4, dots_bf16=True)

    log("== same probes on the bf16-output shipped config (K=64, R=8) ==")
    run(*env, "base bf16 out", 64, 8, out_dtype="bfloat16")
    run(*env, "bf16 out + junk +2W", 64, 8, out_dtype="bfloat16",
        junk_cols=2 * W)
    run(*env, "bf16 out + dmf shadow", 64, 8, out_dtype="bfloat16",
        dmf_shadow=True)
    run(*env, "bf16 out + dots bf16", 64, 8, out_dtype="bfloat16",
        dots_bf16=True)
    run(*env, "bf16 out + dots bf16 + lean", 64, 8, out_dtype="bfloat16",
        dots_bf16=True, lean=True)
    run(*env, "power bf16 + dots bf16", 64, 8, out_dtype="bfloat16",
        power=True, dots_bf16=True)
    run(*env, "power bf16 base", 64, 8, out_dtype="bfloat16", power=True)

    log("== W sweep (nofold, f32, K=64, R=4; model: ns/row ~ W) ==")
    for m_s in (2048, 8192):
        env_s = setup(m_s)
        run(*env_s, f"m={m_s} f32", 64, 4)
    run(*env, "m=4096 f32 (again)", 64, 4)


if __name__ == "__main__":
    main()
