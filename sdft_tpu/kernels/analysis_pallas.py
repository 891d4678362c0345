"""Fused Pallas TPU kernels for SDFT analysis and round trip.

One single-pass kernel replaces the XLA op chain (rotate -> cumsum -> demod
-> window conv [-> synthesis]) that would otherwise materialize O(M*m)
complex intermediates in HBM several times over.  Everything lives in VMEM
tiles; the only HBM traffic is the inputs, the spectra (forward variant
only) and the synthesized samples.

Grid: one dimension over time tiles.  Each step processes TILE_K samples
across all m bins (padded to lane alignment), carrying the per-bin
accumulator in VMEM scratch — the in-kernel form of the blockwise
associative scan (SURVEY.md §0.3).

Phase tables use the exact integer-exponent construction (see
sdft_tpu.ops.twiddle): within the kernel,

    T_i^(offset + t*TILE_K + k) = row0_i * fine[k, i]

where ``fine[k, i] = T_i^k`` is computed once at t == 0 into scratch (the
only O(TILE_K * m) transcendentals) and ``row0_i = T_i^((offset + t*TILE_K)
mod 2m)`` is one row of transcendentals per grid step.  All exponent
arithmetic is mod 2m in int32, so phases never drift — the kernel equivalent
of reference C's periodic phase reset (c/src/sdft/sdft.h:566-576).

Layout: planar re/im throughout (Pallas has no complex dtype).  The bin
axis is first rounded up to mp = ceil(m/128)*128 ("dead" bins m..mp-1 hold
well-defined but unused phases; every op is per-bin elementwise except the
window convolution, whose halo reads at the top edge are overwritten by the
Hermitian guard logic before use), then padded by PAD=64 columns on each
side so W = mp + 128 stays lane-aligned.  The window convolution reads a
1-2 column halo and the Hermitian edge guards (c/src/sdft/sdft.h:589-595)
are materialized by masked column writes / top-column output fixes.  Block
lengths that are not a multiple of the tile are zero-padded in the delta
domain (zero deltas cannot perturb the carry) and the junk spectra rows are
masked off by the partial final output block.

Constraints (wrapper falls back to the XLA path otherwise):
  * float32 TD/FD precision (f64 parity mode stays on XLA/CPU),
  * m >= 128 (smaller plans gain nothing from the fused kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..plan import Plan
from ..state import State
from ..windows import WINDOW_HALO, WINDOW_TAPS
from ..ops.lti import _bf16_split_host, _split_mask
from ..ops.twiddle import mulmod, synthesis_twiddles

PAD = 64          # bin-axis padding each side (total W = m + 128, lane aligned)
TILE_K = 128      # samples per grid step (lane-aligned slices)
#: Tile for the hoisted-Toeplitz spectra kernel.  Its MXU work per SAMPLE is
#: proportional to the tile length (each sample contracts over its tile's
#: deltas), so smaller tiles cut compute until per-tile overheads win:
#: measured at m=4096/65536 (ms/block, f32): 128 -> 4.53, 112 -> 4.04,
#: 96 -> 4.06, 80 -> 4.05, 64 -> 4.16, 32 -> 5.41.  96 balances the f32
#: plateau with the bf16-output optimum (64) and keeps tables small.
SPECTRA_TILE_K = 96
#: Toeplitz depth / rows-per-grid-step for the conv-folded spectra kernel
#: (see _kernel_spectra_conv).  The MXU work per sample is proportional to
#: CONV_TILE_K alone; CONV_SUPER_R tiles share one grid step to amortize
#: per-step overheads without adding MXU work.
CONV_TILE_K = 64
CONV_SUPER_R = 4
#: Grid dimension semantics for the spectra kernels.  Measured: "parallel"
#: makes NO difference on v5e (docs/PERF.md round-4) and is UNSAFE in
#: principle — the kernels DMA their tables into persistent VMEM scratch at
#: t == 0, a loop-carried dependency that out-of-order execution would
#: break.  Keep "arbitrary"; module-level only so experiments can A/B it
#: (clear the launcher jit caches after changing, single-core chips only).
DIM_SEMANTICS = ("arbitrary",)


def pallas_supported() -> bool:
    """Pallas fast path requires a TPU backend."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def plan_supported(plan: Plan, M: int, out_dtype: str | None = None) -> bool:
    del M  # any block length: partial tiles are zero-padded internally
    from ..ops.twiddle import MAX_INT32_DFTSIZE

    p = plan.precision.resolve()
    out_bytes = 2 if out_dtype == "bfloat16" else 4
    return (
        p.td == "float32"
        and p.fd == "float32"
        and plan.dftsize >= 128
        and plan.dftsize <= MAX_INT32_DFTSIZE   # int32 two-level phases
        # a VMEM-feasible spectra-kernel tile configuration must exist for
        # the requested output element type (bf16 halves the staging, so
        # some large dftsizes are bf16-only)
        and _conv_pick_tiles(plan.dftsize, out_bytes) is not None
    )


def _toephoist_vmem_ok(m: int, K: int) -> bool:
    """VMEM estimate for the toephoist kernel: resident tables 20*K*W,
    the (K, 2W) dots temp, double-buffered f32 out blocks."""
    W = _round_up(m, 128) + 2 * PAD
    est = 20 * K * W + 8 * K * W + 4 * K * m * 4
    return est <= 80 * 1024 * 1024


def _cumsum_rows(v, K, mode="mxu2"):
    """Inclusive prefix sum along axis 0.

    "mxu2"/"mxu3" (default "mxu2"): multiply by the lower-triangular ONES
    matrix on the systolic array, splitting the f32 operand into 2 (or 3)
    bf16 components.  Because L's entries are exactly 0/1 and the MXU
    accumulates in f32, each component's products are exact — the split sum
    reproduces the f32 value to ~17 ("mxu2") / 24+ ("mxu3") mantissa bits.
    This moves the whole prefix sum off the VPU (the kernel's bottleneck
    unit), ~1.4x end-to-end on v5e vs "vpu".

    "vpu": log-step shifted adds, the exact-f32 fallback.  "mxu_f32": the
    one-pass f32 HIGHEST matmul (slower than the splits).
    """
    if mode in ("mxu2", "mxu3"):
        r = lax.broadcasted_iota(jnp.int32, (K, K), 0)
        c = lax.broadcasted_iota(jnp.int32, (K, K), 1)
        L = (c <= r).astype(jnp.bfloat16)
        out = jnp.zeros_like(v)
        rem = v
        for _ in range(int(mode[-1])):
            # masked split (ops.lti._split_mask), not an astype round trip:
            # XLA folds f32->bf16->f32 convert chains to identity under
            # excess precision, which would zero `rem` after the first pass
            # and silently degrade the prefix sum to ~8-bit
            part, _lo = _split_mask(rem)
            out = out + jnp.dot(L, part, preferred_element_type=jnp.float32)
            rem = rem - part.astype(jnp.float32)
        return out
    if mode == "mxu_f32":
        r = lax.broadcasted_iota(jnp.int32, (K, K), 0)
        c = lax.broadcasted_iota(jnp.int32, (K, K), 1)
        L = (c <= r).astype(jnp.float32)
        return jnp.dot(L, v, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)
    s = 1
    while s < K:
        v = v + jnp.pad(v, ((s, 0), (0, 0)))[:K]
        s *= 2
    return v


def _kernel(off_ref, delta_ref, acc_in_ref, synth_ref,
            *refs, plan: Plan, emit_dfts: bool, emit_y: bool,
            cumsum_mode: str = "mxu2", tile_k: int = TILE_K):
    """Fused per-tile body.

    Algebraic form (see module docstring for the phase split): with
    row0 = T^(e0*i), fine[k,i] = T_i^k, base = conj(T_i),

        cumv     = cumsum_k(delta[k] * fine[k,i])
        aux[k,i] = (acc*conj(row0) + cumv[k,i]) * (conj(fine)*base)[k,i]
        acc'     = acc + row0 * cumv[K-1]

    using |row0|^2 == 1 to cancel row0 out of the demodulation — the full
    fid matrix is never materialized, and conj(fine)*base is a constant
    hoisted into scratch at t == 0.
    """
    K = tile_k
    idx = 0
    dft_re_ref = dft_im_ref = y_ref = None
    if emit_dfts:
        dft_re_ref, dft_im_ref = refs[idx], refs[idx + 1]
        idx += 2
    if emit_y:
        y_ref = refs[idx]
        idx += 1
    acc_out_ref = refs[idx]
    fine_re, fine_im, dmf_re, dmf_im, acc = refs[idx + 1: idx + 6]

    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    omega = np.float32(-np.pi / m)
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    # bin index per lane column (negative in left pad; mod handles signs)
    ib = lax.broadcasted_iota(jnp.int32, (1, W), 1) - PAD

    @pl.when(t == 0)
    def _init():
        kk = lax.broadcasted_iota(jnp.int32, (K, W), 0)
        iw = lax.broadcasted_iota(jnp.int32, (K, W), 1) - PAD
        r = jnp.mod(kk * iw, n2)
        ang = omega * r.astype(jnp.float32)
        fre = jnp.cos(ang)
        fim = jnp.sin(ang)
        fine_re[:] = fre
        fine_im[:] = fim
        # demod constant: conj(fine) * base, base = conj(T^i)
        angb = (-omega) * jnp.mod(iw, n2).astype(jnp.float32)
        bre = jnp.cos(angb)
        bim = jnp.sin(angb)
        dmf_re[:] = fre * bre + fim * bim
        dmf_im[:] = fre * bim - fim * bre
        acc[:] = acc_in_ref[:]

    # row0 = T^(e0 * i), e0 = offset + t*K (mod 2m)
    e0 = jnp.mod(off_ref[0, 0] + t * K, n2)
    # mulmod keeps the product exact on the PADDED bin axis (ib up to
    # round_up(m,128)+PAD-1 exceeds m-1, so a direct product can overflow
    # int32 near and above m=32768)
    r0 = mulmod(e0, ib, n2)
    ang0 = omega * r0.astype(jnp.float32)
    r0_re = jnp.cos(ang0)
    r0_im = jnp.sin(ang0)

    # v = delta * fine; prefix sum along time
    d = delta_ref[0, pl.ds(pl.multiple_of(t * K, min(K, 128)), K)].reshape(K, 1)
    cv_re = _cumsum_rows(d * fine_re[:], K, cumsum_mode)
    cv_im = _cumsum_rows(d * fine_im[:], K, cumsum_mode)

    # carry in the demodulated frame: acc * conj(row0) (rows, broadcast)
    a_re = acc[0:1, :]
    a_im = acc[1:2, :]
    c0_re = a_re * r0_re + a_im * r0_im
    c0_im = a_im * r0_re - a_re * r0_im
    u_re = cv_re + c0_re
    u_im = cv_im + c0_im

    # acc' = acc + row0 * cumv[last]  (exact global frame, no approximation)
    l_re = cv_re[K - 1:K, :]
    l_im = cv_im[K - 1:K, :]
    acc[0:1, :] = a_re + r0_re * l_re - r0_im * l_im
    acc[1:2, :] = a_im + r0_re * l_im + r0_im * l_re

    @pl.when(t == nt - 1)
    def _emit_acc():
        acc_out_ref[:] = acc[:]

    # aux = u * demod_fine
    aux_re = u_re * dmf_re[:] - u_im * dmf_im[:]
    aux_im = u_re * dmf_im[:] + u_im * dmf_re[:]

    _finish_tile(plan, K, W, t, aux_re, aux_im, emit_dfts, emit_y,
                 dft_re_ref, dft_im_ref, y_ref, synth_ref)


def _finish_tile(plan: Plan, K: int, W: int, t, aux_re, aux_im,
                 emit_dfts: bool, emit_y: bool,
                 dft_re_ref, dft_im_ref, y_ref, synth_ref):
    """Shared tile tail: Hermitian guards, window convolution, spectra/
    synthesis emission — identical for the cumsum and Toeplitz variants."""
    m = plan.dftsize

    # Hermitian edge guards (c/src/sdft/sdft.h:589-595): bins -g <-
    # conj(bin g) and bins (m-1)+g <- conj(bin (m-1)-g).  The DC-side guard
    # holds identically in this kernel: for real delta the exact
    # integer-exponent phases give T_{-g}^e = conj(T_g^e), so every left pad
    # column already equals the conjugate of its mirror — only the top edge
    # (mirror around m-1, which differs from the spectrum's natural
    # 2m-periodic conjugate mirror around m) deviates.  The spectra-only
    # path handles it AFTER the guard-free convolution by overwriting the
    # top `halo` output columns (a (K, 1)-sized fix) instead of masking the
    # full (K, W) aux planes — the masked-write form costs ~2 VPU ops per
    # element per guard on the kernel's bottleneck unit.
    halo = WINDOW_HALO[plan.window]
    guard_free = emit_dfts and not emit_y
    if halo > 0 and not guard_free:
        cols = lax.broadcasted_iota(jnp.int32, (K, W), 1)

        def put_guard(a_re, a_im, dst, src):
            msk = cols == dst
            src_re = a_re[:, src:src + 1]
            src_im = a_im[:, src:src + 1]
            return (jnp.where(msk, src_re, a_re),
                    jnp.where(msk, -src_im, a_im))

        for g in range(1, halo + 1):
            aux_re, aux_im = put_guard(aux_re, aux_im, PAD + m - 1 + g,
                                       PAD + m - 1 - g)

    # frequency-domain window convolution, analysis weight folded into taps
    wgt = plan.analysis_weight
    c0, c1, c2 = (np.float32(c * wgt) for c in WINDOW_TAPS[plan.window])

    def conv(a):
        out = c0 * a[:, PAD:PAD + m]
        if halo >= 1:
            out = out + c1 * (a[:, PAD - 1:PAD + m - 1]
                              + a[:, PAD + 1:PAD + m + 1])
        if halo >= 2:
            out = out + c2 * (a[:, PAD - 2:PAD + m - 2]
                              + a[:, PAD + 2:PAD + m + 2])
        return out

    out_re = conv(aux_re)
    out_im = conv(aux_im)

    if emit_dfts:
        dft_re_ref[:] = out_re.astype(dft_re_ref.dtype)
        dft_im_ref[:] = out_im.astype(dft_im_ref.dtype)
        if guard_free and halo > 0:
            # top-edge guard as column rewrites; with A = aux, the guarded
            # convolution at the top bins expands to (guard col m-1+g holds
            # conj(A[m-1-g])):
            #   halo 1: out[m-1] = c0 A[m-1] + c1 (A[m-2] + conj(A[m-2]))
            #   halo 2: out[m-2] = c0 A[m-2] + c1 (A[m-3] + A[m-1])
            #                      + c2 (A[m-4] + conj(A[m-2]))
            #           out[m-1] = c0 A[m-1] + c1 (A[m-2] + conj(A[m-2]))
            #                      + c2 (A[m-3] + conj(A[m-3]))
            def acol(g):  # aux column for bin m-1-g, (K, 1) slices
                j = PAD + m - 1 - g
                return aux_re[:, j:j + 1], aux_im[:, j:j + 1]

            a0r, a0i = acol(0)
            a1r, a1i = acol(1)
            if halo == 1:
                fr = c0 * a0r + 2 * c1 * a1r
                fi = c0 * a0i
            else:
                a2r, a2i = acol(2)
                a3r, a3i = acol(3)
                fr = c0 * a0r + 2 * c1 * a1r + 2 * c2 * a2r
                fi = c0 * a0i
                gr = c0 * a1r + c1 * (a2r + a0r) + c2 * (a3r + a1r)
                gi = c0 * a1i + c1 * (a2i + a0i) + c2 * (a3i - a1i)
                dft_re_ref[:, m - 2:m - 1] = gr.astype(dft_re_ref.dtype)
                dft_im_ref[:, m - 2:m - 1] = gi.astype(dft_im_ref.dtype)
            dft_re_ref[:, m - 1:m] = fr.astype(dft_re_ref.dtype)
            dft_im_ref[:, m - 1:m] = fi.astype(dft_im_ref.dtype)
    if emit_y:
        # synthesis matvec on the MXU: y = 2 * (Re(dft).Re(s) - Im(dft).Im(s))
        s_re = synth_ref[0:1, PAD:PAD + m]
        s_im = synth_ref[1:2, PAD:PAD + m]
        y = jnp.dot(out_re, s_re.reshape(m, 1)[:, 0],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
        if plan.latency != 1.0:
            y = y - jnp.dot(out_im, s_im.reshape(m, 1)[:, 0],
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        y_ref[0, pl.ds(pl.multiple_of(t * K, min(K, 128)), K)] = (
            np.float32(plan.synthesis_weight) * y)



def _toeplitz_blocks(delta, nt: int, K: int):
    """Build the per-tile lower-triangular Toeplitz operators
    Toep_t[k, j] = delta[t*K + k - j] (j <= k) as bf16 hi+lo splits, shape
    (nt*K, K) each — pure broadcast/reshape/slice (no gathers): with
    v = [d0, 0...0, d_{K-1}..d_1] of length 2K per tile, the row-major
    reshape of K copies of v to width 2K-1 left-shifts row k by k, i.e.
    rows become v[(c - k) mod 2K] = the Toeplitz diagonals.  The hi/lo
    split happens on the tiny (nt, 2K) vectors BEFORE broadcasting, so the
    O(M*K) expansion runs (twice) in bf16 — half the HBM traffic of one
    f32 expansion."""
    dt = delta.reshape(nt, K)
    v = jnp.concatenate(
        [dt[:, :1], jnp.zeros((nt, K), delta.dtype), dt[:, :0:-1]], axis=1)
    # masked split (ops.lti._split_mask), NOT an astype round trip: XLA's
    # algebraic simplifier folds f32 -> bf16 -> f32 convert chains to
    # identity under excess precision, which silently turns (v - bf16(v))
    # into zero — on the chip the low split was exactly 0 and the
    # contraction degraded to ~2^-9 relative (caught by the on-chip oracle
    # gate; interpret mode, which upcasts, hid it).
    v_hi, v_lo = _split_mask(v)

    def expand(vv):
        rolled = jnp.broadcast_to(vv[:, None, :], (nt, K, 2 * K))
        rolled = rolled.reshape(nt, K * 2 * K)[:, :K * (2 * K - 1)]
        return rolled.reshape(nt, K, 2 * K - 1)[:, :, :K].reshape(nt * K, K)

    return expand(v_hi), expand(v_lo)


@functools.lru_cache(maxsize=None)
def _spectra_tables(plan: Plan, K: int):
    """Per-plan device tables for the hoisted-Toeplitz spectra kernel.

    Built once on the host with exact integer phases mod 2m (f64 -> f32),
    converted to device arrays under ensure_compile_time_eval (safe to
    first-fetch inside a trace), and passed into the jitted launcher as
    ARGUMENTS, not embedded literals; the kernel bulk-DMAs them to VMEM
    scratch once per launch.  This kills
    the old per-block t==0 scratch init, whose ~3M transcendental
    evaluations cost more than the entire per-tile pipeline.

    Returns (fine_re, fine_im, dmf_re, dmf_im, b_all): fine[k, i] = T_i^k
    and dmf[k, i] = T_i^(-(k+1)) on the padded bin axis i in [-PAD, mp+PAD),
    f32 planes, plus b_all = the bf16 hi+lo splits of dmf pre-stacked into
    the (3K, 2W) right operand of the single deep MXU contraction.
    """
    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    i = np.arange(W) - PAD
    k = np.arange(K)
    rf = (k[:, None] * i[None, :]) % n2
    af = (-np.pi / m) * rf
    fine_re = np.cos(af).astype(np.float32)
    fine_im = np.sin(af).astype(np.float32)
    rd = ((k[:, None] + 1) * i[None, :]) % n2
    ad = (np.pi / m) * rd
    dre = np.cos(ad).astype(np.float32)
    dim = np.sin(ad).astype(np.float32)

    dre_hi, dre_lo = _bf16_split_host(dre)
    dim_hi, dim_lo = _bf16_split_host(dim)
    # Stack the split planes into the (3K, W) right operand of the single
    # deep contraction [thi | thi | tlo] @ [hi; lo; hi] — one 384-deep dot
    # measured ~10% faster end-to-end than three 128-deep dots, and
    # pre-stacking here avoids a 6.5 MB per-tile VMEM concat.
    b_re = np.concatenate([dre_hi, dre_lo, dre_hi], axis=0)
    b_im = np.concatenate([dim_hi, dim_lo, dim_hi], axis=0)
    b_all = np.concatenate([b_re, b_im], axis=1)        # (3K, 2W)
    # DEVICE arrays (ensure_compile_time_eval escapes any active trace —
    # caching host numpy here would re-upload ~5-15 MB of tables on every
    # forward block instead of once per plan)
    with jax.ensure_compile_time_eval():
        return tuple(jnp.asarray(a) for a in
                     (fine_re, fine_im, dre, dim, b_all))


def _acc_mask_host(plan: Plan, bins):
    """ROI accumulate-mask evaluated at (possibly out-of-range) signed bin
    indices: pads below DC and above Nyquist mirror their interior bin
    (the Hermitian guard of a zeroed bin is zero)."""
    m = plan.dftsize
    if plan.roi is None:
        return np.ones(np.shape(bins))
    first, last = plan.roi
    bm = np.where(bins < 0, -bins,
                  np.where(bins >= m, 2 * m - 2 - bins, bins))
    return ((bm >= first) & (bm < last)).astype(np.float64)


def _conv_folded_planes_host(plan: Plan, K: int, cols, out_mask, fold: bool):
    """Shared builder for the spectra kernels\' demod planes over arbitrary
    signed bin columns (exact integer phases): returns (dre, dim) — the raw
    masked carry-demod planes — and (dmfc_re, dmfc_im) — the (optionally)
    window-conv-folded, out-masked contraction planes."""
    m = plan.dftsize
    n2 = 2 * m
    halo = WINDOW_HALO[plan.window]
    taps = [float(c) * plan.analysis_weight for c in WINDOW_TAPS[plan.window]]
    k = np.arange(K)
    n = len(cols)
    dre = np.zeros((K, n))
    dim = np.zeros((K, n))
    dmfc_re = np.zeros((K, n))
    dmfc_im = np.zeros((K, n))
    for g in (range(-halo, halo + 1) if fold else (0,)):
        b = cols + g
        ad = (np.pi / m) * (((k[:, None] + 1) * b[None, :]) % n2)
        cg = taps[abs(g)] if fold else 1.0
        mg = _acc_mask_host(plan, b)     # accumulate mask at the READ bin
        dmfc_re += cg * mg * np.cos(ad)
        dmfc_im += cg * mg * np.sin(ad)
        if g == 0:
            dre = np.cos(ad) * mg
            dim = np.sin(ad) * mg
    dmfc_re *= out_mask
    dmfc_im *= out_mask
    return dre, dim, dmfc_re, dmfc_im


def _phi_host(plan: Plan, K: int):
    """Carry conv-shift phasor columns phi_h[k] = exp(j*pi*(k+1)*h/m)."""
    m = plan.dftsize
    n2 = 2 * m
    k = np.arange(K)
    phi = np.zeros((K, 128), np.float32)
    for h in range(1, WINDOW_HALO[plan.window] + 1):
        aph = (np.pi / m) * (((k + 1) * h) % n2)
        phi[:, 2 * (h - 1)] = np.cos(aph)
        phi[:, 2 * (h - 1) + 1] = np.sin(aph)
    return phi



@functools.lru_cache(maxsize=None)
def _spectra_tables_conv(plan: Plan, K: int, fold: bool = True,
                         lean: bool = False):
    """Device tables for the conv-folded spectra kernel (_kernel_spectra_conv).

    The window's bin convolution (c/src/sdft/sdft.h:350-402) is linear and
    bin-shift-invariant while the Toeplitz coefficients are bin-independent,
    so it FOLDS into the contraction table:

        conv_g(Toep @ dmf) = Toep @ conv_g(dmf) = Toep @ dmfc

    (analysis weight included) — the kernel's VPU never runs the window
    stencil.  Returns (fine_re, fine_im, dmf_re, dmf_im, b_conv, phi):

      * fine planes: launcher-side totals GEMM + top-edge fix machinery,
      * raw dmf planes: the carry demodulation in the kernel,
      * b_conv: bf16 hi/lo split of dmfc stacked (3K, 2W) for the single
        deep contraction [thi | thi | tlo] @ [hi; lo; hi],
      * phi (K, 128) f32: the carry's conv shift phasors
        phi_h[k] = exp(j*pi*(k+1)*h/m) at columns (2(h-1), 2(h-1)+1) —
        dmf[k, i+g] = dmf[k, i] * phi_g[k], so the convolved carry is
        Re/Im(dmf * D) with D built from rank-1 (K,1)x(1,W) VPU terms
        (NOT skinny MXU dots: Mosaic pads those to full 128-deep matmuls,
        the measured sink of the round-3 "rank-h carry" attempt).

    ROI folds entirely into the tables (masked fine/dmf/dmfc columns with
    DC-mirrored pads — see _acc_mask_host / _conv_folded_planes_host).
    """
    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    i = np.arange(W) - PAD
    k = np.arange(K)

    mask = _acc_mask_host(plan, i)
    rf = (k[:, None] * i[None, :]) % n2
    af = (-np.pi / m) * rf
    fine_re = (np.cos(af) * mask).astype(np.float32)
    fine_im = (np.sin(af) * mask).astype(np.float32)

    dre, dim, dmfc_re, dmfc_im = _conv_folded_planes_host(
        plan, K, i, mask, fold)

    b_hi_re, b_lo_re = _bf16_split_host(dmfc_re.astype(np.float32))
    b_hi_im, b_lo_im = _bf16_split_host(dmfc_im.astype(np.float32))
    b_re = np.concatenate([b_hi_re, b_lo_re, b_hi_re], axis=0)
    b_im = np.concatenate([b_hi_im, b_lo_im, b_hi_im], axis=0)
    b_conv = np.concatenate([b_re, b_im], axis=1)       # (3K, 2W)

    # "lean" (bf16-output fast mode): the carry-demod planes round to
    # bf16 — their 2^-8 relative error sits at the bf16 OUTPUT rounding
    # class and halves the kernel's dominant VMEM read traffic
    ddt = jnp.bfloat16 if lean else jnp.float32
    with jax.ensure_compile_time_eval():
        return tuple(jnp.asarray(a, d) for a, d in
                     ((fine_re, jnp.float32), (fine_im, jnp.float32),
                      (dre.astype(np.float32), ddt),
                      (dim.astype(np.float32), ddt),
                      (b_conv, jnp.bfloat16),
                      (_phi_host(plan, K), jnp.float32)))


@functools.lru_cache(maxsize=None)
def _spectra_tables_direct(plan: Plan, K: int, lean: bool = False):
    """Device tables for the DIRECT spectra kernel variant: per-plane
    conv-folded contraction tables on the m-window (bins [0, mp), no pad
    columns), so each plane's (K, 3K) @ (3K, mp) dot is stored straight to
    the output block and the carry is applied read-modify-write — no
    2W-wide dots temp.  Returns (fine_re, fine_im [W-wide, prologue],
    dmfm_re, dmfm_im (K, mp), b_dre, b_dim (3K, mp), phi).  Shares the
    mask/fold machinery with _spectra_tables_conv via
    _conv_folded_planes_host."""
    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    mp = _round_up(m, 128)
    i = np.arange(W) - PAD
    i2 = np.arange(mp)
    k = np.arange(K)

    maskW = _acc_mask_host(plan, i)
    rf = (k[:, None] * i[None, :]) % n2
    af = (-np.pi / m) * rf
    fine_re = (np.cos(af) * maskW).astype(np.float32)
    fine_im = (np.sin(af) * maskW).astype(np.float32)

    # out-mask on the m-window: ROI plus the mp-padding columns (junk,
    # never stored); top-halo columns are fix-overwritten either way
    out_mask = _acc_mask_host(plan, i2) * (i2 < m)
    dre, dim, dmfc_re, dmfc_im = _conv_folded_planes_host(
        plan, K, i2, out_mask, fold=True)
    dre = dre * out_mask
    dim = dim * out_mask

    hr, lr = _bf16_split_host(dmfc_re.astype(np.float32))
    hi_, li = _bf16_split_host(dmfc_im.astype(np.float32))
    b_dre = np.concatenate([hr, lr, hr], axis=0)       # (3K, mp)
    b_dim = np.concatenate([hi_, li, hi_], axis=0)

    ddt = jnp.bfloat16 if lean else jnp.float32
    with jax.ensure_compile_time_eval():
        return tuple(jnp.asarray(a, d) for a, d in
                     ((fine_re, jnp.float32), (fine_im, jnp.float32),
                      (dre.astype(np.float32), ddt),
                      (dim.astype(np.float32), ddt),
                      (b_dre, jnp.bfloat16), (b_dim, jnp.bfloat16),
                      (_phi_host(plan, K), jnp.float32)))


@functools.lru_cache(maxsize=None)
def _coarse_rows_host(plan: Plan, K: int):
    """Host table C[j, i] = T_i^(j*K mod 2m) for the q distinct coarse
    exponents (q = period of t*K mod 2m), padded bin axis.  f32."""
    import math as _math

    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    q = n2 // _math.gcd(K, n2)
    i = np.arange(W) - PAD
    r = ((np.arange(q)[:, None] * K) * i[None, :]) % n2
    ang = (-np.pi / m) * r
    with jax.ensure_compile_time_eval():
        return (jnp.asarray(np.cos(ang).astype(np.float32)),
                jnp.asarray(np.sin(ang).astype(np.float32)))


def _phase_rows_W(plan: Plan, offset, nt: int, K: int, coarse):
    """row0[t, i] = T_i^((offset + t*K) mod 2m) on the padded bin axis.

    Only ONE row of transcendentals is evaluated in-program (T_i^offset,
    the traced part); the coarse factors T_i^(t*K) come from the cached
    host table and combine by unit-phasor multiplication (~1 ulp), exactly
    the fiddle_block trick (ops.twiddle) — the per-block q*W trig sweep
    measured as a top prologue cost disappears.
    """
    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    c_re, c_im = coarse
    q = c_re.shape[0]
    i = jnp.arange(W, dtype=jnp.int32) - PAD
    r0 = mulmod(jnp.mod(offset.astype(jnp.int32), n2), i, n2)
    ang = (-np.pi / m) * r0.astype(jnp.float32)
    o_re, o_im = jnp.cos(ang), jnp.sin(ang)
    row_re = o_re[None, :] * c_re - o_im[None, :] * c_im
    row_im = o_re[None, :] * c_im + o_im[None, :] * c_re
    if nt > q:
        reps = -(-nt // q)
        row_re = jnp.tile(row_re, (reps, 1))[:nt]
        row_im = jnp.tile(row_im, (reps, 1))[:nt]
    return row_re[:nt], row_im[:nt]


def _kernel_spectra(c0_ref, fix_ref, toep_hi_ref, toep_lo_ref,
                    *refs, plan: Plan, tile_k: int, nfixed: int,
                    dma_tables: bool = True):
    """Stateless spectra tile: out = conv(Toep @ dmf + c0 o dmf).

    Every sequential or plan-constant quantity is hoisted into the launcher
    or the cached tables (per-tile carry rows c0, the next accumulator, the
    Hermitian top-edge fix columns, the demod tables and their bf16
    splits), so grid steps are fully independent and contain no
    transcendentals — the scheduler can overlap the tile\'s MXU contraction,
    the short VPU carry/conv chain and the output DMA across steps with no
    loop-carried dependency.  Per element: one 3-term bf16-split
    contraction (MXU), one complex multiply-add and the window stencil.
    """
    K = tile_k
    m = plan.dftsize
    halo = WINDOW_HALO[plan.window]
    wgt = plan.analysis_weight
    c0t, c1t, c2t = (np.float32(c * wgt) for c in WINDOW_TAPS[plan.window])

    t = pl.program_id(0)
    if dma_tables:
        # one-time bulk DMA of the demod tables HBM -> VMEM scratch: no
        # per-step refetch (constant-index VMEM inputs cost ~1.6 us/tile,
        # measured) and no in-kernel transcendentals (the old per-launch
        # scratch init cost more than the whole tile pipeline)
        hbm_tables = refs[:3]
        dft_re_ref, dft_im_ref = refs[3], refs[4]
        scratch_tables = refs[5:8]
        sems = refs[8]
        (dmf_re, dmf_im, b_all) = scratch_tables

        @pl.when(t == 0)
        def _load_tables():
            for idx in range(3):
                pltpu.make_async_copy(hbm_tables[idx], scratch_tables[idx],
                                      sems.at[idx]).start()
            for idx in range(3):
                pltpu.make_async_copy(hbm_tables[idx], scratch_tables[idx],
                                      sems.at[idx]).wait()
    else:
        # interpret mode: tables arrive as whole-array VMEM inputs (the
        # DMA staging confuses the interpreter's pl.when lowering and its
        # performance does not matter there)
        (dmf_re, dmf_im, b_all) = refs[:3]
        dft_re_ref, dft_im_ref = refs[3], refs[4]

    # the 3-term bf16 split product for BOTH planes as ONE contraction:
    # [thi | thi | tlo] (K, 3K) @ [[hi;lo;hi]_re | [hi;lo;hi]_im] (3K, 2W)
    # — a single 384-deep, 2W-wide MXU dot (pre-stacked table, one DMA;
    # the A concat is a 98 kB VMEM copy per tile).  Measured 13.1 -> 14.5M
    # samples/s over three separate 128-deep dots per plane.
    W = _round_up(m, 128) + 2 * PAD
    A = jnp.concatenate([toep_hi_ref[:], toep_hi_ref[:], toep_lo_ref[:]],
                        axis=1)
    dots = jnp.dot(A, b_all[:], preferred_element_type=jnp.float32)

    r = 2 * (t - (t // 8) * 8)            # this tile's row pair in the block
    c0_re = c0_ref[pl.ds(r, 1), :]
    c0_im = c0_ref[pl.ds(r + 1, 1), :]
    aux_re = dots[:, :W] + (c0_re * dmf_re[:] - c0_im * dmf_im[:])
    aux_im = dots[:, W:] + (c0_re * dmf_im[:] + c0_im * dmf_re[:])

    def conv(a):
        out = c0t * a[:, PAD:PAD + m]
        if halo >= 1:
            out = out + c1t * (a[:, PAD - 1:PAD + m - 1]
                               + a[:, PAD + 1:PAD + m + 1])
        if halo >= 2:
            out = out + c2t * (a[:, PAD - 2:PAD + m - 2]
                               + a[:, PAD + 2:PAD + m + 2])
        return out

    dft_re_ref[:] = conv(aux_re).astype(dft_re_ref.dtype)
    dft_im_ref[:] = conv(aux_im).astype(dft_im_ref.dtype)
    if nfixed:
        # Hermitian top-edge columns precomputed in the launcher
        dft_re_ref[:, m - nfixed:m] = (
            fix_ref[:, :nfixed].astype(dft_re_ref.dtype))
        dft_im_ref[:, m - nfixed:m] = (
            fix_ref[:, nfixed:].astype(dft_im_ref.dtype))


def _kernel_spectra_conv(crows_ref, fix_ref, toep_hi_ref, toep_lo_ref,
                         phi_ref, *refs, plan: Plan, tile_k: int,
                         super_r: int, nfixed: int, crow_stride: int,
                         fold_conv: bool, manual_out: bool = False,
                         n_out: int = 0, n_steps: int = 0,
                         lean: bool = False, direct: bool = False,
                         power: bool = False, dma_tables: bool = True,
                         dmf_shadow: bool = False, dots_bf16: bool = False):
    """Super-tiled stateless spectra step: R tiles of K samples per step,
    ONE (R*K, 3K) @ (3K, 2W) bf16-split contraction — the Toeplitz depth K
    (MXU work per sample) is decoupled from the R*K samples each grid step
    emits, so per-step overheads amortize without adding MXU work.

    ``fold_conv`` selects the carry/stencil organization:

      * False: the toephoist math — carry = c0 o dmf, window stencil
        applied in-kernel (crows carry 2 rows per tile: c0_re, c0_im);
      * True: the window conv is folded into the contraction table
        (dmfc = conv(dmf), _spectra_tables_conv) and the carry lands in
        the convolved domain, out += Re/Im(dmf o D) with
        D[k,i] = E0[i] + sum_h (phi_h[k]*S_h[i] -/+ ...) built from
        rank-1 (K,1)x(1,W) VPU FMAs (NOT skinny MXU dots — Mosaic pads
        those to full matmuls).  crows carry 2 + 4*halo rows per tile.

    Either way the top ``nfixed`` Hermitian-guarded output columns are
    overwritten from launcher-precomputed fix columns.

    ``manual_out``: Mosaic's automatic out-block pipelining measured fully
    SERIAL here — per-block time is the SUM of the output DMA and the
    compute across every swept variant (docs/PERF.md round-4 notes).  With
    manual_out the outputs live in ANY/HBM space and the kernel writes a
    ping-pong VMEM scratch slot, starts an async copy per step, and only
    waits for the copy issued two steps earlier — the step-t store streams
    while step t+1 computes.
    """
    K = tile_k
    R = super_r
    m = plan.dftsize
    halo = WINDOW_HALO[plan.window]
    wgt = plan.analysis_weight
    c0t, c1t, c2t = (np.float32(c * wgt) for c in WINDOW_TAPS[plan.window])
    W = _round_up(m, 128) + 2 * PAD

    t = pl.program_id(0)
    oscr_re = oscr_im = osems = None
    # roofline-probe scratch (exp_r5_roofline): per-subtile shadow planes
    # read with a runtime-zero coefficient — adds ONLY VMEM read traffic
    sh_re, sh_im = (refs[-2], refs[-1]) if dmf_shadow else (None, None)
    nt_tab = 4 if direct else 3
    n_outs = 1 if power else 2
    if dma_tables:
        hbm_tables = refs[:nt_tab]
        if power:
            dft_re_ref = refs[nt_tab]
            dft_im_ref = None
        else:
            dft_re_ref, dft_im_ref = refs[nt_tab], refs[nt_tab + 1]
        scratch_tables = refs[nt_tab + n_outs:2 * nt_tab + n_outs]
        sems = refs[2 * nt_tab + n_outs]
        if direct:
            dmf_re, dmf_im, b_conv, b_conv2 = scratch_tables
        else:
            dmf_re, dmf_im, b_conv = scratch_tables
            b_conv2 = None
        if manual_out:
            oscr_re, oscr_im, osems = refs[2 * nt_tab + n_outs + 1:
                                           2 * nt_tab + n_outs + 4]

        @pl.when(t == 0)
        def _load_tables():
            for idx in range(nt_tab):
                pltpu.make_async_copy(hbm_tables[idx], scratch_tables[idx],
                                      sems.at[idx]).start()
            for idx in range(nt_tab):
                pltpu.make_async_copy(hbm_tables[idx], scratch_tables[idx],
                                      sems.at[idx]).wait()
            if dmf_shadow:
                # distinct per-subtile slices so the reads cannot CSE
                for r_ in range(super_r):
                    sh_re[pl.ds(r_ * K, K), :] = scratch_tables[0][
                        ...].astype(jnp.float32)
                    sh_im[pl.ds(r_ * K, K), :] = scratch_tables[1][
                        ...].astype(jnp.float32)
    else:
        dmf_re, dmf_im, b_conv = refs[:3]
        b_conv2 = refs[3] if direct else None
        if power:
            dft_re_ref = refs[nt_tab]
            dft_im_ref = None
        else:
            dft_re_ref, dft_im_ref = refs[nt_tab], refs[nt_tab + 1]

    RK = R * K
    if manual_out:
        # ping-pong output staging: slot = t % 2 rows [slot*RK, slot*RK+RK)
        # of the (2*RK, m) scratch planes; the copy started at step t-2 on
        # this slot must have drained before we overwrite it
        slot = jnp.mod(t, 2)
        row0_out = t * RK
        size_last = n_out - (n_steps - 1) * RK

        def out_copy(plane_scr, plane_hbm, start_row, size, sl, pidx):
            return pltpu.make_async_copy(
                plane_scr.at[pl.ds(sl * RK, size), :],
                plane_hbm.at[pl.ds(start_row, size), :],
                osems.at[sl, pidx])

        @pl.when(t >= 2)
        def _reclaim_slot():
            out_copy(oscr_re, dft_re_ref, (t - 2) * RK, RK, slot, 0).wait()
            out_copy(oscr_im, dft_im_ref, (t - 2) * RK, RK, slot, 1).wait()

    def conv(a):
        out = c0t * a[:, PAD:PAD + m]
        if halo >= 1:
            out = out + c1t * (a[:, PAD - 1:PAD + m - 1]
                               + a[:, PAD + 1:PAD + m + 1])
        if halo >= 2:
            out = out + c2t * (a[:, PAD - 2:PAD + m - 2]
                               + a[:, PAD + 2:PAD + m + 2])
        return out

    mre = dmf_re[:].astype(jnp.float32)
    mim = dmf_im[:].astype(jnp.float32)

    def dot_sub(r):
        """Subtile r's contraction into a FRESH temp — no WAR hazard, so
        the MXU can run subtile r while the VPU drains subtile r-1."""
        rows = slice(r * K, (r + 1) * K)
        A_r = jnp.concatenate([toep_hi_ref[rows, :], toep_hi_ref[rows, :],
                               toep_lo_ref[rows, :]], axis=1)     # (K, 3K)
        # (a bf16 preferred_element_type would halve the dots temp traffic,
        # but Mosaic requires 32-bit matmul accumulators)
        if direct:
            return (jnp.dot(A_r, b_conv[:],
                            preferred_element_type=jnp.float32),
                    jnp.dot(A_r, b_conv2[:],
                            preferred_element_type=jnp.float32))
        d = jnp.dot(A_r, b_conv[:], preferred_element_type=jnp.float32)
        # roofline probe: round the dots temp to bf16 at the matmul store
        # (f32 MXU accumulate, halved temp traffic IF Mosaic fuses the cast)
        return d.astype(jnp.bfloat16) if dots_bf16 else d

    def carry_rows(base):
        """Convolved-domain carry factors D_re, D_im from the packed
        launcher rows (the rank-1 phi expansion)."""
        d_re = crows_ref[base + 0:base + 1, :]
        d_im = crows_ref[base + 1:base + 2, :]
        for h in range(1, halo + 1):
            o = base + 2 + 4 * (h - 1)
            s_r = crows_ref[o + 0:o + 1, :]
            s_i = crows_ref[o + 1:o + 2, :]
            t_r = crows_ref[o + 2:o + 3, :]
            t_i = crows_ref[o + 3:o + 4, :]
            phr = phi_ref[:, 2 * (h - 1):2 * (h - 1) + 1]          # (K, 1)
            phm = phi_ref[:, 2 * (h - 1) + 1:2 * (h - 1) + 2]
            d_re = d_re + phr * s_r - phm * t_i
            d_im = d_im + phr * s_i + phm * t_r
        return d_re, d_im

    def vpu_store(r, dsub):
        base = r * crow_stride
        rows = slice(r * K, (r + 1) * K)
        if direct:
            # store the per-plane conv-folded dots straight to the output
            # block, then apply the carry read-modify-write — no 2W-wide
            # dots temp in the chain
            dre, dim_ = dsub
            d_re, d_im = carry_rows(base)
            car_re = (mre * d_re - mim * d_im)[:, :m]
            car_im = (mre * d_im + mim * d_re)[:, :m]
            if power:
                pr = dre[:, :m] + car_re
                pi = dim_[:, :m] + car_im
                dft_re_ref[rows, :] = (pr * pr + pi * pi).astype(
                    dft_re_ref.dtype)
                return
            dft_re_ref[rows, :] = dre[:, :m].astype(dft_re_ref.dtype)
            dft_im_ref[rows, :] = dim_[:, :m].astype(dft_im_ref.dtype)
            dft_re_ref[rows, :] = (
                dft_re_ref[rows, :].astype(jnp.float32)
                + car_re).astype(dft_re_ref.dtype)
            dft_im_ref[rows, :] = (
                dft_im_ref[rows, :].astype(jnp.float32)
                + car_im).astype(dft_im_ref.dtype)
            return
        if fold_conv:
            d_re, d_im = carry_rows(base)
            out_re = dsub[:, :W].astype(jnp.float32) + (mre * d_re
                                                        - mim * d_im)
            out_im = dsub[:, W:2 * W].astype(jnp.float32) + (mre * d_im
                                                             + mim * d_re)
            if dmf_shadow:
                z = phi_ref[0, 127]          # runtime zero, opaque to Mosaic
                out_re = out_re + z * sh_re[pl.ds(r * K, K), :].astype(
                    jnp.float32)
                out_im = out_im + z * sh_im[pl.ds(r * K, K), :].astype(
                    jnp.float32)
            out_re = out_re[:, PAD:PAD + m]
            out_im = out_im[:, PAD:PAD + m]
        else:
            c_re = crows_ref[base + 0:base + 1, :]
            c_im = crows_ref[base + 1:base + 2, :]
            aux_re = dsub[:, :W].astype(jnp.float32) + (c_re * mre
                                                        - c_im * mim)
            aux_im = dsub[:, W:2 * W].astype(jnp.float32) + (c_re * mim
                                                             + c_im * mre)
            if dmf_shadow:
                z = phi_ref[0, 127]          # runtime zero, opaque to Mosaic
                aux_re = aux_re + z * sh_re[pl.ds(r * K, K), :].astype(
                    jnp.float32)
                aux_im = aux_im + z * sh_im[pl.ds(r * K, K), :].astype(
                    jnp.float32)
            out_re = conv(aux_re)
            out_im = conv(aux_im)
            if plan.roi is not None:
                # conv spill past the ROI edge reads as zero; the folded
                # mode bakes this mask into the dmfc table instead.
                # (in-kernel iota: pallas kernels cannot capture array
                # constants)
                first, last = plan.roi
                ib2 = lax.broadcasted_iota(jnp.int32, (1, m), 1)
                roi_row = ((ib2 >= first) & (ib2 < last)).astype(jnp.float32)
                out_re = out_re * roi_row
                out_im = out_im * roi_row
        if power:
            dft_re_ref[rows, :] = (out_re * out_re
                                   + out_im * out_im).astype(
                dft_re_ref.dtype)
        elif manual_out:
            oscr_re[pl.ds(slot * RK + r * K, K), :] = (
                out_re.astype(oscr_re.dtype))
            oscr_im[pl.ds(slot * RK + r * K, K), :] = (
                out_im.astype(oscr_im.dtype))
        else:
            dft_re_ref[rows, :] = out_re.astype(dft_re_ref.dtype)
            dft_im_ref[rows, :] = out_im.astype(dft_im_ref.dtype)

    # software-pipelined subtiles: issue subtile r's MXU contraction, then
    # run subtile r-1's (independent) VPU/store chain while it completes
    prev = None
    for r in range(R):
        cur = dot_sub(r)
        if prev is not None:
            vpu_store(prev[0], prev[1])
        prev = (r, cur)
    vpu_store(prev[0], prev[1])
    if power:
        if nfixed:
            # launcher pre-squares the fix columns for the power path
            dft_re_ref[:, m - nfixed:m] = (
                fix_ref[:, :nfixed].astype(dft_re_ref.dtype))
    elif manual_out:
        if nfixed:
            oscr_re[pl.ds(slot * RK, RK), m - nfixed:m] = (
                fix_ref[:, :nfixed].astype(oscr_re.dtype))
            oscr_im[pl.ds(slot * RK, RK), m - nfixed:m] = (
                fix_ref[:, nfixed:].astype(oscr_im.dtype))
        if size_last == RK:
            out_copy(oscr_re, dft_re_ref, row0_out, RK, slot, 0).start()
            out_copy(oscr_im, dft_im_ref, row0_out, RK, slot, 1).start()
        else:
            @pl.when(t < n_steps - 1)
            def _start_full():
                out_copy(oscr_re, dft_re_ref, row0_out, RK, slot, 0).start()
                out_copy(oscr_im, dft_im_ref, row0_out, RK, slot, 1).start()

            @pl.when(t == n_steps - 1)
            def _start_last():
                out_copy(oscr_re, dft_re_ref, row0_out, size_last,
                         slot, 0).start()
                out_copy(oscr_im, dft_im_ref, row0_out, size_last,
                         slot, 1).start()

        @pl.when(t == n_steps - 1)
        def _drain():
            if n_steps >= 2:
                psl = jnp.mod(t + 1, 2)
                out_copy(oscr_re, dft_re_ref, (t - 1) * RK, RK,
                         psl, 0).wait()
                out_copy(oscr_im, dft_im_ref, (t - 1) * RK, RK,
                         psl, 1).wait()
            out_copy(oscr_re, dft_re_ref, row0_out, size_last,
                     slot, 0).wait()
            out_copy(oscr_im, dft_im_ref, row0_out, size_last,
                     slot, 1).wait()
    else:
        if nfixed:
            dft_re_ref[:, m - nfixed:m] = (
                fix_ref[:, :nfixed].astype(dft_re_ref.dtype))
            dft_im_ref[:, m - nfixed:m] = (
                fix_ref[:, nfixed:].astype(dft_im_ref.dtype))


def _spectra_prologue(plan: Plan, state: State, samples, K: int,
                      fine_re, fine_im, coarse):
    """Shared launcher prologue for the hoisted spectra kernels: computes
    every sequential quantity with dense batched XLA ops over all tiles at
    once, leaving the Pallas grid a stateless map:

      * comb delta + new delayline                     (the TD stage)
      * per-tile totals     S_t = delta_tile @ fine    (one real GEMM)
      * rotated prefix      c0_t = (acc + excl-cumsum(row0_t S_t)) conj(row0_t)
      * the next carry      acc' = acc + sum_t row0_t S_t
      * top-edge fixes      guarded window conv at the top `halo` bins from
                            raw aux in the cheap per-column form
                            (O(nt*K*2halo) elementwise, no GEMM)

    Returns (delta, dt, nt, new_delayline, c0_re, c0_im, acc_out, fix).
    """
    m = plan.dftsize
    W = _round_up(m, 128) + 2 * PAD
    (M,) = samples.shape
    Mp = _round_up(M, K)
    nt = Mp // K
    halo = WINDOW_HALO[plan.window]
    hiP = lax.Precision.HIGHEST

    samples = samples.astype(jnp.float32)
    line = jnp.concatenate([state.delayline.astype(jnp.float32), samples])
    delta = (samples - line[:M]).reshape(1, M)
    if Mp != M:
        delta = jnp.pad(delta, ((0, 0), (0, Mp - M)))
    new_delayline = line[M:].astype(plan.precision.td_dtype)
    dt = delta.reshape(nt, K)

    # hoisted totals + prefix (the ops.lti machinery on the padded bin axis)
    s_re = jnp.dot(dt, fine_re, precision=hiP,
                   preferred_element_type=jnp.float32)
    s_im = jnp.dot(dt, fine_im, precision=hiP,
                   preferred_element_type=jnp.float32)
    row_re, row_im = _phase_rows_W(plan, state.offset, nt, K, coarse)
    rt_re = row_re * s_re - row_im * s_im
    rt_im = row_re * s_im + row_im * s_re

    # accumulator on the padded axis, Hermitian-mirror seeded (left pad
    # columns must mirror the interior so the guard-free conv edge holds)
    acc_in = jnp.zeros((2, W), jnp.float32)
    acc_in = acc_in.at[:, PAD:PAD + m].set(
        state.accumulator.T.astype(jnp.float32))
    for g in range(1, halo + 1):
        acc_in = acc_in.at[0, PAD - g].set(acc_in[0, PAD + g])
        acc_in = acc_in.at[1, PAD - g].set(-acc_in[1, PAD + g])

    inc_re = jnp.cumsum(rt_re, axis=0)
    inc_im = jnp.cumsum(rt_im, axis=0)
    pre_re = acc_in[0] + jnp.concatenate(
        [jnp.zeros_like(inc_re[:1]), inc_re[:-1]], axis=0)
    pre_im = acc_in[1] + jnp.concatenate(
        [jnp.zeros_like(inc_im[:1]), inc_im[:-1]], axis=0)
    c0_re = pre_re * row_re + pre_im * row_im          # prefix * conj(row0)
    c0_im = pre_im * row_re - pre_re * row_im

    acc_out = jnp.stack([acc_in[0, PAD:PAD + m] + inc_re[-1, PAD:PAD + m],
                         acc_in[1, PAD:PAD + m] + inc_im[-1, PAD:PAD + m]],
                        axis=-1)

    # Hermitian top-edge output columns (only the top `halo` bins need the
    # guard-corrected stencil), from raw aux at the top 2*halo bins in the
    # cheap per-column form — O(nt*K*2halo) elementwise work.
    wgt = plan.analysis_weight
    taps = [np.float32(c * wgt) for c in WINDOW_TAPS[plan.window]]
    if halo:
        ncol = 2 * halo
        sl = slice(PAD + m - ncol, PAD + m)
        f_re = fine_re[:, sl]                           # (K, ncol)
        f_im = fine_im[:, sl]
        base_re = fine_re[1, sl]                        # T_i = fine[1]
        base_im = -fine_im[1, sl]                       # base = conj(T_i)
        v_re = dt[:, :, None] * f_re[None, :, :]        # (nt, K, ncol)
        v_im = dt[:, :, None] * f_im[None, :, :]
        cum_re = jnp.cumsum(v_re, axis=1) + c0_re[:, None, sl]
        cum_im = jnp.cumsum(v_im, axis=1) + c0_im[:, None, sl]
        # aux = cum * conj(fine) * base
        cf_re = cum_re * f_re[None] + cum_im * f_im[None]
        cf_im = cum_im * f_re[None] - cum_re * f_im[None]
        ac_re = cf_re * base_re - cf_im * base_im
        ac_im = cf_re * base_im + cf_im * base_re

        def acol(g):
            j = ncol - 1 - g
            return ac_re[..., j], ac_im[..., j]

        a0r, a0i = acol(0)
        a1r, a1i = acol(1)
        if halo == 1:
            cols_re = [taps[0] * a0r + 2 * taps[1] * a1r]
            cols_im = [taps[0] * a0i]
        else:
            a2r, a2i = acol(2)
            a3r, a3i = acol(3)
            cols_re = [taps[0] * a1r + taps[1] * (a2r + a0r)
                       + taps[2] * (a3r + a1r),
                       taps[0] * a0r + 2 * taps[1] * a1r + 2 * taps[2] * a2r]
            cols_im = [taps[0] * a1i + taps[1] * (a2i + a0i)
                       + taps[2] * (a3i - a1i),
                       taps[0] * a0i]
        fix = jnp.concatenate(
            [jnp.stack(cols_re, axis=-1), jnp.stack(cols_im, axis=-1)],
            axis=-1).reshape(nt * K, 2 * halo)
        if plan.roi is not None:
            # output mask on the overwritten top columns (bins m-halo..m-1,
            # in fix column order)
            first, last = plan.roi
            colmask = np.array([1.0 if first <= m - halo + j < last else 0.0
                                for j in range(halo)], np.float32)
            fix = fix * jnp.asarray(np.concatenate([colmask, colmask]))[None]
    else:
        fix = jnp.zeros((nt * K, 2), jnp.float32)

    return delta, dt, nt, new_delayline, c0_re, c0_im, acc_out, fix


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def _launch_spectra_toeplitz(plan: Plan, state: State, samples, tables,
                             interpret: bool = False, tile_k: int = TILE_K,
                             layout: str = "packed",
                             out_dtype: str | None = None):
    """Forward spectra via the hoisted-Toeplitz kernel.

    The launcher computes every sequential quantity with dense batched XLA
    ops over all tiles at once, leaving the Pallas grid a stateless map
    (see _kernel_spectra):

      * per-tile totals     S_t = delta_tile @ fine        (one real GEMM)
      * rotated prefix      c0_t = (acc + excl-cumsum(row0_t S_t)) conj(row0_t)
      * the next carry      acc\' = acc + sum_t row0_t S_t
      * top-edge fixes      from raw aux at the 2*halo top bins — computed
                            in the cheap per-column form
                            aux[t,k,c] = (c0[t,c] + cumsum_k(d fine))
                                         * conj(fine[k,c]) * base[c]
                            (O(nt*K*2halo) elementwise, no GEMM, no
                            Toeplitz materialization)
    """
    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    (M,) = samples.shape
    K = tile_k
    halo = WINDOW_HALO[plan.window]
    (fine_re, fine_im, dmf_re, dmf_im, b_all, *coarse) = tables

    (delta, dt, nt, new_delayline, c0_re, c0_im, acc_out, fix
     ) = _spectra_prologue(plan, state, samples, K, fine_re, fine_im, coarse)
    Mp = nt * K

    # pack 8 tiles' (re, im) row pairs per fetched (16, W) block — no
    # zero-padding waste, and Pallas re-fetches only every 8th grid step
    # (measured faster than per-tile static (8, W) blocks, 4.99 vs 5.15
    # ms/block at the flagship config, despite the dynamic sublane slice)
    ntp = _round_up(nt, 8)
    c0 = jnp.stack([c0_re, c0_im], axis=1)
    if ntp != nt:
        c0 = jnp.concatenate(
            [c0, jnp.zeros((ntp - nt, 2, W), jnp.float32)], axis=0)
    c0 = c0.reshape(ntp * 2, W)

    toep_hi, toep_lo = _toeplitz_blocks(delta, nt, K)

    odt = jnp.dtype(out_dtype) if out_dtype else jnp.float32
    if odt != jnp.float32 and layout != "planar":
        raise ValueError("non-f32 spectra require layout=\'planar\'")

    nfix = fix.shape[-1]
    if interpret:
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    else:
        table_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # HBM; the kernel
        scratch = [                                        # DMAs at t==0
            pltpu.VMEM((K, W), jnp.float32),           # dmf re
            pltpu.VMEM((K, W), jnp.float32),           # dmf im
            pltpu.VMEM((3 * K, 2 * W), jnp.bfloat16),  # stacked B re|im
            pltpu.SemaphoreType.DMA((3,)),
        ]
    # NOTE a software-pipelined two-stage variant (MXU dots for tile t into
    # ping-pong scratch while the VPU finishes tile t-1) measured SLOWER
    # (6.3 vs 5.1 ms/block at m=4096): the extra (K, W) f32 slot write+read
    # through VMEM costs more than the stage overlap recovers (docs/PERF.md).
    grid = (nt,)
    c0_idx = lambda t: (t // 8, 0)                              # noqa: E731
    fix_idx = lambda t: (t, 0)                                  # noqa: E731
    toep_idx = lambda t: (t, 0)                                 # noqa: E731
    out_idx = lambda t: (t, 0)                                  # noqa: E731
    kernel = functools.partial(_kernel_spectra, plan=plan, tile_k=K,
                               nfixed=halo, dma_tables=not interpret)
    dft_re, dft_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, W), c0_idx,
                         memory_space=pltpu.VMEM),            # c0 row pairs x8
            pl.BlockSpec((K, nfix), fix_idx,
                         memory_space=pltpu.VMEM),            # fix cols
            pl.BlockSpec((K, K), toep_idx,
                         memory_space=pltpu.VMEM),            # toep hi
            pl.BlockSpec((K, K), toep_idx,
                         memory_space=pltpu.VMEM),            # toep lo
            table_spec, table_spec,                           # dmf f32
            table_spec,                                       # stacked B bf16
        ],
        out_shape=(jax.ShapeDtypeStruct((M, m), odt),) * 2,
        out_specs=(pl.BlockSpec((K, m), out_idx,
                                memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=None if interpret else DIM_SEMANTICS),
        interpret=interpret,
    )(c0, fix, toep_hi, toep_lo, dmf_re, dmf_im, b_all)

    new_state = State(
        offset=jnp.mod(state.offset + M, n2).astype(state.offset.dtype),
        delayline=new_delayline,
        accumulator=acc_out.astype(state.accumulator.dtype),
    )
    if layout == "planar":
        return new_state, (dft_re, dft_im)
    return new_state, jnp.stack([dft_re, dft_im], axis=-1)


def _conv_pick_tiles(m: int, out_bytes: int) -> tuple[int, int] | None:
    """(tile_k, super_r) for the super-tiled kernel under the VMEM budget,
    or None if no configuration fits (plan_supported reports such plans
    False so api.sdft routes to the XLA path; a direct
    forward_block_pallas call raises).

    Preference order is the measured optimum per output element type
    (docs/PERF.md round-4 sweep: f32 -> K=96/R=4, bf16 -> K=64/R=8).
    Budget model (bytes): resident tables 20*K*W (two f32 dmf planes + the
    (3K, 2W) bf16 split stack), the (R*K, 2W) f32 dots intermediate, and the
    double-buffered output staging 2 planes * R*K*m * out_bytes * 2.
    """
    W = _round_up(m, 128) + 2 * PAD
    prefs = ((96, 4),) if out_bytes == 4 else ((64, 8),)
    for K, R in prefs + ((64, 4), (64, 2), (64, 1), (32, 2), (32, 1)):
        est = 20 * K * W + 8 * R * K * W + 4 * R * K * m * out_bytes
        if est <= 80 * 1024 * 1024:
            return K, R
    return None


@functools.partial(jax.jit,
                   static_argnums=(0, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def _launch_spectra_conv(plan: Plan, state: State, samples, tables,
                         interpret: bool = False, tile_k: int = CONV_TILE_K,
                         super_r: int = CONV_SUPER_R, layout: str = "packed",
                         out_dtype: str | None = None,
                         fold_conv: bool = True, lean: bool = False,
                         direct: bool = False, power: bool = False,
                         dmf_shadow: bool = False, dots_bf16: bool = False):
    """Forward spectra via the conv-folded hoisted-Toeplitz kernel.

    Same hoisting strategy as _launch_spectra_toeplitz (all sequential
    quantities become dense batched XLA ops; the grid is a stateless map)
    with two structural changes:

      * the window convolution is folded into the contraction table
        (_spectra_tables_conv), so the kernel carries NO stencil — the
        per-tile carry is applied in the convolved domain through the
        launcher-computed rows E0 = c0*C0, S_h = c_h*(C0>>h + C0<<h),
        T_h = c_h*(C0>>h - C0<<h) and the phasor columns phi_h;
      * ``super_r`` tiles are emitted per grid step with ONE
        (R*K, 3K) @ (3K, 2W) contraction, so the Toeplitz depth K (the
        MXU work per sample) shrinks without multiplying per-step
        overheads.
    """
    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    (M,) = samples.shape
    K = tile_k
    R = super_r
    halo = WINDOW_HALO[plan.window]
    MP = _round_up(m, 128)
    if direct:
        (fine_re, fine_im, dmf_re, dmf_im, b_c1, b_c2, phi,
         *coarse) = tables
    else:
        (fine_re, fine_im, dmf_re, dmf_im, b_c1, phi, *coarse) = tables
        b_c2 = None

    (delta, dt, nt, new_delayline, c0_re, c0_im, acc_out, fix
     ) = _spectra_prologue(plan, state, samples, K, fine_re, fine_im, coarse)

    # carry rows: fold_conv packs the convolved-domain rows
    # [E0_re, E0_im, (S_h_re, S_h_im, T_h_re, T_h_im) for h=1..halo] per
    # tile; the unfolded kernel needs only (c0_re, c0_im).  The per-tile
    # stride is padded so R*stride rows (one grid block) stay divisible
    # by 8 (the f32 sublane tile).
    import math as _math

    wgt = plan.analysis_weight
    taps = [np.float32(c * wgt) for c in WINDOW_TAPS[plan.window]]
    if fold_conv or direct:   # convolved-domain carry rows (E0, S_h, T_h)
        rows = [taps[0] * c0_re, taps[0] * c0_im]
        for h in range(1, halo + 1):
            cp_re = jnp.pad(c0_re[:, h:], ((0, 0), (0, h)))     # C0[i+h]
            cp_im = jnp.pad(c0_im[:, h:], ((0, 0), (0, h)))
            cm_re = jnp.pad(c0_re[:, :-h], ((0, 0), (h, 0)))    # C0[i-h]
            cm_im = jnp.pad(c0_im[:, :-h], ((0, 0), (h, 0)))
            rows += [taps[h] * (cp_re + cm_re), taps[h] * (cp_im + cm_im),
                     taps[h] * (cp_re - cm_re), taps[h] * (cp_im - cm_im)]
    else:
        rows = [c0_re, c0_im]
    nrows = len(rows)
    req = 8 // _math.gcd(R, 8)
    stride = -(-nrows // req) * req
    rows += [jnp.zeros_like(c0_re)] * (stride - nrows)
    if direct:
        # the direct kernel works on the m-window (no pad columns)
        rows = [rr[:, PAD:PAD + MP] for rr in rows]
    CW = MP if direct else W
    crows = jnp.stack(rows, axis=1).reshape(nt * stride, CW)

    # pad the per-tile streams to whole super-steps (zero tiles are inert:
    # their junk output rows fall beyond M and the partial final out block)
    nts = -(-nt // R)
    ntp = nts * R
    if ntp != nt:
        crows = jnp.pad(crows, ((0, (ntp - nt) * stride), (0, 0)))
        fix = jnp.pad(fix, ((0, (ntp - nt) * K), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, (ntp - nt) * K)))
    toep_hi, toep_lo = _toeplitz_blocks(delta, ntp, K)

    odt = jnp.dtype(out_dtype) if out_dtype else jnp.float32
    if odt != jnp.float32 and layout != "planar" and not power:
        raise ValueError("non-f32 spectra require layout='planar'")
    if power and halo:
        # the kernel emits |dft|^2 directly; pre-square the Hermitian
        # top-edge fix columns (order: [re x halo | im x halo])
        fpow = (fix[:, :halo] * fix[:, :halo]
                + fix[:, halo:] * fix[:, halo:])
        fix = jnp.concatenate([fpow, jnp.zeros_like(fpow)], axis=-1)

    nfix = fix.shape[-1]
    # manual ping-pong output DMA measured IDENTICAL to Mosaic's automatic
    # out-block pipelining (docs/PERF.md round-4: the kernel is VMEM-bound,
    # not store-bound) and its ANY-space outputs do not vmap — keep the
    # machinery for re-measurement but ship the automatic path
    manual_out = False
    if interpret:
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
        out_specs = (pl.BlockSpec((R * K, m), lambda t: (t, 0),
                                  memory_space=pltpu.VMEM),) * 2
    else:
        table_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # HBM; the kernel
        ddt = jnp.bfloat16 if lean else jnp.float32
        if direct:
            scratch = [                                # DMAs at t==0
                pltpu.VMEM((K, MP), ddt),              # dmf re (m-window)
                pltpu.VMEM((K, MP), ddt),              # dmf im
                pltpu.VMEM((3 * K, MP), jnp.bfloat16),  # conv B re
                pltpu.VMEM((3 * K, MP), jnp.bfloat16),  # conv B im
                pltpu.SemaphoreType.DMA((4,)),
            ]
        else:
            scratch = [                                # DMAs at t==0
                pltpu.VMEM((K, W), ddt),               # dmf re
                pltpu.VMEM((K, W), ddt),               # dmf im
                # shape from the table itself: the roofline probe widens
                # b_conv with junk columns to inflate ONLY the dots temp
                pltpu.VMEM(tuple(b_c1.shape), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((3,)),
            ]
        if manual_out:
            scratch += [
                pltpu.VMEM((2 * R * K, m), odt),       # out stage re (x2)
                pltpu.VMEM((2 * R * K, m), odt),       # out stage im
                pltpu.SemaphoreType.DMA((2, 2)),       # (slot, plane)
            ]
            # outputs stay in HBM; the kernel ping-pong-stages and DMAs
            # them itself (see _kernel_spectra_conv manual_out docstring)
            out_specs = (pl.BlockSpec(memory_space=pltpu.ANY),) * 2
        else:
            out_specs = (pl.BlockSpec((R * K, m), lambda t: (t, 0),
                                      memory_space=pltpu.VMEM),) * 2
        if dmf_shadow:
            scratch += [pltpu.VMEM((R * K, W), jnp.float32),
                        pltpu.VMEM((R * K, W), jnp.float32)]
    kernel = functools.partial(_kernel_spectra_conv, plan=plan, tile_k=K,
                               super_r=R, nfixed=halo, crow_stride=stride,
                               fold_conv=fold_conv, manual_out=manual_out,
                               n_out=M, n_steps=nts, lean=lean,
                               direct=direct, power=power,
                               dma_tables=not interpret,
                               dmf_shadow=dmf_shadow and not interpret,
                               dots_bf16=dots_bf16)
    table_inputs = ((dmf_re, dmf_im, b_c1, b_c2) if direct
                    else (dmf_re, dmf_im, b_c1))
    n_outs = 1 if power else 2
    outs = pl.pallas_call(
        kernel,
        grid=(nts,),
        in_specs=[
            pl.BlockSpec((R * stride, CW), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),        # carry rows
            pl.BlockSpec((R * K, nfix), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),        # fix cols
            pl.BlockSpec((R * K, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),        # toep hi
            pl.BlockSpec((R * K, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),        # toep lo
            pl.BlockSpec((K, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),        # phi columns
        ] + [table_spec] * len(table_inputs),
        out_shape=(jax.ShapeDtypeStruct((M, m), odt),) * n_outs,
        out_specs=out_specs[:n_outs],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=None if interpret else DIM_SEMANTICS,
            has_side_effects=True),
        interpret=interpret,
    )(crows, fix, toep_hi, toep_lo, phi, *table_inputs)

    new_state = State(
        offset=jnp.mod(state.offset + M, n2).astype(state.offset.dtype),
        delayline=new_delayline,
        accumulator=acc_out.astype(state.accumulator.dtype),
    )
    if power:
        return new_state, outs[0]
    dft_re, dft_im = outs
    if layout == "planar":
        return new_state, (dft_re, dft_im)
    return new_state, jnp.stack([dft_re, dft_im], axis=-1)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7, 8, 9))
def _launch(plan: Plan, state: State, samples, emit_dfts: bool, emit_y: bool,
            interpret: bool = False, cumsum_mode: str = "mxu2",
            tile_k: int = TILE_K, layout: str = "packed",
            out_dtype: str | None = None):
    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    (M,) = samples.shape
    # blocks that are not a whole number of tiles are zero-padded in the
    # delta domain: zero deltas leave the carried accumulator untouched, so
    # only the junk spectra rows (masked off by the partial final output
    # block) and the padded y tail (sliced below) ever see them
    Mp = _round_up(M, tile_k)
    nt = Mp // tile_k

    samples = samples.astype(jnp.float32)
    line = jnp.concatenate([state.delayline.astype(jnp.float32), samples])
    delta = (samples - line[:M]).reshape(1, M)
    if Mp != M:
        delta = jnp.pad(delta, ((0, 0), (0, Mp - M)))
    new_delayline = line[M:].astype(plan.precision.td_dtype)

    # acc planar (2, W) with zero pads; state.accumulator packed (m, 2).
    # The kernel relies on the left pad staying the exact conjugate mirror of
    # the interior (see the guard comment in _kernel), so seed the halo
    # columns of a carried-in accumulator accordingly.
    acc_in = jnp.zeros((2, W), jnp.float32)
    acc_in = acc_in.at[:, PAD:PAD + m].set(state.accumulator.T.astype(jnp.float32))
    for g in range(1, WINDOW_HALO[plan.window] + 1):
        acc_in = acc_in.at[0, PAD - g].set(acc_in[0, PAD + g])
        acc_in = acc_in.at[1, PAD - g].set(-acc_in[1, PAD + g])

    # synthesis row (2, W), zero pads
    tw = synthesis_twiddles(plan)
    synth = jnp.zeros((2, W), jnp.float32)
    synth = synth.at[0, PAD:PAD + m].set(jnp.real(tw).astype(jnp.float32))
    synth = synth.at[1, PAD:PAD + m].set(jnp.imag(tw).astype(jnp.float32))

    offset = jnp.mod(state.offset.astype(jnp.int32), n2).reshape(1, 1)

    # spectra element type: float32 (parity default) or bfloat16 — halving
    # the O(M*m) HBM write, the dominant cost of the forward path (the
    # spectra are consumed as log-magnitude spectrograms far more often than
    # re-synthesized; bf16's ~3 decimal digits are transparent there)
    odt = jnp.dtype(out_dtype) if out_dtype else jnp.float32

    out_shapes = []
    out_specs = []
    if emit_dfts:
        out_shapes += [jax.ShapeDtypeStruct((M, m), odt)] * 2
        out_specs += [pl.BlockSpec((tile_k, m), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)] * 2
    if emit_y:
        out_shapes += [jax.ShapeDtypeStruct((1, Mp), jnp.float32)]
        out_specs += [pl.BlockSpec((1, Mp), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)]
    # acc_out revisited every step, written at the last one
    out_shapes += [jax.ShapeDtypeStruct((2, W), jnp.float32)]
    out_specs += [pl.BlockSpec((2, W), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)]

    if odt != jnp.float32 and layout != "planar":
        raise ValueError("non-f32 spectra require layout='planar' (packing "
                         "would re-read the spectra and defeat the purpose)")

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # offset (1,1)
        pl.BlockSpec((1, Mp), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),            # delta (full)
        pl.BlockSpec((2, W), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),            # acc_in
        pl.BlockSpec((2, W), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),            # synth row
    ]
    inputs = [offset, delta, acc_in, synth]
    kernel = functools.partial(_kernel, plan=plan, emit_dfts=emit_dfts,
                               emit_y=emit_y, cumsum_mode=cumsum_mode,
                               tile_k=tile_k)
    scratch = [
        pltpu.VMEM((tile_k, W), jnp.float32),  # fine_re
        pltpu.VMEM((tile_k, W), jnp.float32),  # fine_im
        pltpu.VMEM((tile_k, W), jnp.float32),  # demod_fine re
        pltpu.VMEM((tile_k, W), jnp.float32),  # demod_fine im
        pltpu.VMEM((2, W), jnp.float32),       # acc carry
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_shape=tuple(out_shapes),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    outs = list(outs)
    dfts = y = None
    if emit_dfts:
        dft_re, dft_im = outs[0], outs[1]
        # "planar" hands back the kernel's native (re, im) pair with zero
        # extra HBM traffic; "packed" interleaves to the (M, m, 2) boundary
        # layout, which costs one more full read+write of the spectra.
        if layout == "planar":
            dfts = (dft_re, dft_im)
        else:
            dfts = jnp.stack([dft_re, dft_im], axis=-1)
        outs = outs[2:]
    if emit_y:
        y = outs[0].reshape(Mp)[:M].astype(plan.precision.td_dtype)
        outs = outs[1:]
    acc_out = outs[0]

    new_state = State(
        offset=jnp.mod(state.offset + M, n2).astype(state.offset.dtype),
        delayline=new_delayline,
        accumulator=acc_out[:, PAD:PAD + m].T,
    )
    return new_state, dfts, y


def _toepconv_config(plan: Plan, out_dtype, tile_k, super_r, fold_conv,
                     direct, lean=False):
    """Resolve the super-tiled kernel's (K, R, tables) for an output
    element type — shared by forward_block_pallas and forward_block_power
    so the tiling heuristics and table selection cannot drift apart."""
    m = plan.dftsize
    odt_bytes = 2 if out_dtype == "bfloat16" else 4
    pick = _conv_pick_tiles(m, odt_bytes)
    if pick is None:
        # No VMEM-feasible configuration: refuse loudly rather than
        # silently falling back to toephoist (which has no ROI support
        # and its own VMEM hazard).  plan_supported reports this case
        # False, so api dispatch routes to XLA instead.
        raise ValueError(
            f"dftsize {m} has no VMEM-feasible spectra-"
            "kernel tiling; use the XLA path (plan_supported is False)")
    auto_k, auto_r = pick
    K = tile_k if tile_k is not None else auto_k
    R = super_r if super_r is not None else (auto_r if tile_k is None else 1)
    if (K, R) != pick:
        # a user-specified configuration gets the same VMEM-budget check
        # as the auto pick — a loud ValueError beats an opaque Mosaic
        # VMEM allocation failure deep in compilation (ADVICE r4 #3)
        W = _round_up(m, 128) + 2 * PAD
        est = 20 * K * W + 8 * R * K * W + 4 * R * K * m * odt_bytes
        if est > 80 * 1024 * 1024:
            raise ValueError(
                f"spectra-kernel tiling tile_k={K}, super_r={R} needs "
                f"~{est / 2**20:.0f} MB of VMEM at dftsize {m} "
                "(budget 80 MB); lower tile_k/super_r or leave them unset")
    if direct:
        tables = (_spectra_tables_direct(plan, K, lean)
                  + _coarse_rows_host(plan, K))
    else:
        tables = (_spectra_tables_conv(plan, K, fold_conv, lean)
                  + _coarse_rows_host(plan, K))
    return K, R, tables


def forward_block_pallas(plan: Plan, state: State, samples, interpret=False,
                         cumsum_mode="toepconv", tile_k=None,
                         layout="packed", out_dtype=None, super_r=None,
                         fold_conv=False, direct=False):
    """Fused forward analysis.

    Returns (state, dfts) with dfts packed (M, m, 2), or — with
    ``layout="planar"`` — a (re, im) pair of (M, m) arrays, the kernel's
    native output with no interleaving pass (the fast path for
    magnitude/spectrogram consumers that read the planes independently).
    ``out_dtype="bfloat16"`` (planar only) additionally halves the O(M*m)
    spectra write — the forward path's roofline; the internal scan stays
    exact f32, only the emitted planes are rounded.

    ``cumsum_mode`` selects the kernel: "toepconv" (default) is the
    super-tiled hoisted-Toeplitz kernel (_kernel_spectra_conv; measured
    optimum, ROI-capable, with the fold_conv/direct variants for A/B);
    "toephoist" is the round-3 single-tile kernel (_kernel_spectra); the
    in-kernel scan variants ("mxu2"/"mxu3"/"vpu"/"mxu_f32") remain for
    the fused round trip and A/B measurement.
    """
    if cumsum_mode not in ("toepconv", "toephoist", "mxu2", "mxu3", "vpu",
                           "mxu_f32"):
        raise ValueError(f"unknown cumsum_mode {cumsum_mode!r}")
    if cumsum_mode == "toephoist" and (
            plan.roi is not None
            or not _toephoist_vmem_ok(plan.dftsize,
                                      tile_k or SPECTRA_TILE_K)):
        # ROI folds into the toepconv tables; large dftsizes whose
        # toephoist tables would exceed the VMEM budget (ADVICE r3 #2)
        # take the auto-sized toepconv configuration instead
        cumsum_mode = "toepconv"
        tile_k = None
    if cumsum_mode == "toepconv":
        K, R, tables = _toepconv_config(plan, out_dtype, tile_k, super_r,
                                        fold_conv, direct)
        return _launch_spectra_conv(plan, state, samples, tables,
                                    interpret, K, R, layout, out_dtype,
                                    fold_conv, False, direct)
    if cumsum_mode == "toephoist":
        if tile_k is None:
            tile_k = SPECTRA_TILE_K  # measured optimum for this kernel
        tables = (_spectra_tables(plan, tile_k)
                  + _coarse_rows_host(plan, tile_k))
        return _launch_spectra_toeplitz(plan, state, samples, tables,
                                        interpret, tile_k, layout, out_dtype)
    if tile_k is None:
        tile_k = TILE_K
    new_state, dfts, _ = _launch(plan, state, samples, True, False, interpret,
                                 cumsum_mode, tile_k, layout, out_dtype)
    return new_state, dfts


def forward_block_power(plan: Plan, state: State, samples, interpret=False,
                        out_dtype=None, tile_k=None, super_r=None,
                        fold_conv=False, direct=False):
    """Fused forward analysis emitting the POWER spectrum |dft|^2 only —
    one (M, m) plane instead of the (re, im) pair, halving the output
    write (the path's roofline, docs/PERF.md) for spectrogram/magnitude
    consumers.  ``out_dtype="bfloat16"`` halves it again.  The internal
    scan stays exact f32; squaring happens at the store."""
    K, R, tables = _toepconv_config(plan, out_dtype, tile_k, super_r,
                                    fold_conv, direct)
    return _launch_spectra_conv(plan, state, samples, tables, interpret,
                                K, R, "planar", out_dtype, fold_conv,
                                False, direct, True)


def roundtrip_block_fused(plan: Plan, state: State, samples, interpret=False,
                          cumsum_mode="mxu2", tile_k=TILE_K):
    """Fused analysis + synthesis; spectra never touch HBM.
    Returns (state, samples_out (M,))."""
    new_state, _, y = _launch(plan, state, samples, False, True, interpret,
                              cumsum_mode, tile_k)
    return new_state, y


def forward_and_y_pallas(plan: Plan, state: State, samples, interpret=False,
                        cumsum_mode="mxu2", tile_k=TILE_K, layout="packed"):
    """Fused analysis emitting both spectra and synthesized samples."""
    return _launch(plan, state, samples, True, True, interpret, cumsum_mode,
                   tile_k, layout)
