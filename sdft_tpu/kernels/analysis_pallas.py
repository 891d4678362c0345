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
#: Toeplitz depth / rows-per-grid-step for the super-tiled spectra kernel
#: (see _kernel_spectra_conv).  The MXU work per sample is proportional to
#: CONV_TILE_K alone; CONV_SUPER_R tiles share one grid step to amortize
#: per-step overheads without adding MXU work.
CONV_TILE_K = 64
CONV_SUPER_R = 4
#: Grid dimension semantics for every kernel in this module.  NOT a knob:
#: "parallel" measured no different on v5e (docs/PERF.md round-4) and is
#: UNSAFE in principle — the kernels DMA their tables into persistent VMEM
#: scratch at t == 0, a loop-carried dependency that out-of-order execution
#: would break.
_DIM_SEMANTICS = ("arbitrary",)


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
        if plan.roi is not None:
            # ROI accumulate mask folded into the fine tables (the
            # in-kernel form of _acc_mask_host): out-of-ROI bins are never
            # accumulated, pad columns mirror their interior bin
            first, last = plan.roi
            bm = jnp.where(iw < 0, -iw,
                           jnp.where(iw >= m, 2 * m - 2 - iw, iw))
            rmask = ((bm >= first) & (bm < last)).astype(jnp.float32)
            fre = fre * rmask
            fim = fim * rmask
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
    if plan.roi is not None and emit_dfts:
        # ROI output mask (the final `out * roi` of the XLA paths): bins
        # outside the ROI would otherwise carry window-conv bleed from
        # their in-ROI neighbors.  The y-leg below is unaffected either
        # way (synthesis_twiddles folds the same mask).
        first, last = plan.roi
        ob = lax.broadcasted_iota(jnp.int32, (1, m), 1)
        omask = ((ob >= first) & (ob < last)).astype(jnp.float32)
        out_re = out_re * omask
        out_im = out_im * omask

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

            def colbit(col):
                # ROI bit of a rewritten top column (static; the toepconv
                # kernel's colmask analogue)
                return np.float32(
                    1.0 if plan.roi is None
                    or plan.roi[0] <= col < plan.roi[1] else 0.0)

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
                gr = colbit(m - 2) * (c0 * a1r + c1 * (a2r + a0r)
                                      + c2 * (a3r + a1r))
                gi = colbit(m - 2) * (c0 * a1i + c1 * (a2i + a0i)
                                      + c2 * (a3i - a1i))
                dft_re_ref[:, m - 2:m - 1] = gr.astype(dft_re_ref.dtype)
                dft_im_ref[:, m - 2:m - 1] = gi.astype(dft_im_ref.dtype)
            fr = colbit(m - 1) * fr
            fi = colbit(m - 1) * fi
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


@functools.lru_cache(maxsize=None)
def _spectra_tables_conv(plan: Plan, K: int):
    """Device tables for the super-tiled spectra kernel
    (_kernel_spectra_conv): (fine_re, fine_im, dmf_re, dmf_im, b_conv).

      * fine planes fine[k, i] = T_i^k: launcher-side totals GEMM +
        top-edge fix machinery,
      * dmf planes dmf[k, i] = T_i^(-(k+1)): the carry demodulation in
        the kernel,
      * b_conv: bf16 hi/lo split of dmf stacked (3K, 2W) for the single
        deep contraction [thi | thi | tlo] @ [hi; lo; hi] (one 3K-deep
        dot measured ~10% faster end-to-end than three K-deep dots).

    Built once on the host with exact integer phases mod 2m (f64 -> f32)
    and converted under ensure_compile_time_eval (safe to first-fetch
    inside a trace); passed into the jitted launcher as ARGUMENTS, not
    embedded literals.  ROI folds entirely into the tables (masked
    columns with DC-mirrored pads — _acc_mask_host).
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

    ad = (np.pi / m) * (((k[:, None] + 1) * i[None, :]) % n2)
    dre = (np.cos(ad) * mask).astype(np.float32)
    dim = (np.sin(ad) * mask).astype(np.float32)

    b_hi_re, b_lo_re = _bf16_split_host(dre)
    b_hi_im, b_lo_im = _bf16_split_host(dim)
    b_re = np.concatenate([b_hi_re, b_lo_re, b_hi_re], axis=0)
    b_im = np.concatenate([b_hi_im, b_lo_im, b_hi_im], axis=0)
    b_conv = np.concatenate([b_re, b_im], axis=1)       # (3K, 2W)

    with jax.ensure_compile_time_eval():
        return tuple(jnp.asarray(a, d) for a, d in
                     ((fine_re, jnp.float32), (fine_im, jnp.float32),
                      (dre, jnp.float32), (dim, jnp.float32),
                      (b_conv, jnp.bfloat16)))


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


def _kernel_spectra_conv(crows_ref, fix_ref, toep_hi_ref, toep_lo_ref,
                         *refs, plan: Plan, tile_k: int,
                         super_r: int, nfixed: int, crow_stride: int,
                         power: bool = False, dma_tables: bool = True):
    """Super-tiled stateless spectra step: R tiles of K samples per step,
    ONE (R*K, 3K) @ (3K, 2W) bf16-split contraction — the Toeplitz depth K
    (MXU work per sample) is decoupled from the R*K samples each grid step
    emits, so per-step overheads amortize without adding MXU work.  The
    per-tile carry is c0 o dmf and the window stencil runs in-kernel
    (crows carry 2 rows per tile: c0_re, c0_im); the top ``nfixed``
    Hermitian-guarded output columns are overwritten from
    launcher-precomputed fix columns.  ``power`` emits |dft|^2 as a single
    plane (squared at the store).

    Retired variants (round-5 pruning; measurements in docs/PERF.md):
    the conv-folded table + rank-1 carry ("fold_conv", slower in f32,
    equal in bf16), the per-plane direct-store kernel ("direct", no
    gain — Mosaic does not fuse the matmul store), manual ping-pong
    output DMA ("manual_out", identical to Mosaic's automatic
    pipelining), bf16 tables ("lean") and the round-5 traffic probes
    (falsified the VMEM-bandwidth roofline: bytes price at <= 0.06
    ns/KB).  The grid must run in-order ("arbitrary" dimension
    semantics): the t == 0 table DMA into persistent scratch is a
    loop-carried dependency that "parallel" scheduling would break.
    """
    K = tile_k
    R = super_r
    m = plan.dftsize
    halo = WINDOW_HALO[plan.window]
    wgt = plan.analysis_weight
    c0t, c1t, c2t = (np.float32(c * wgt) for c in WINDOW_TAPS[plan.window])
    W = _round_up(m, 128) + 2 * PAD

    t = pl.program_id(0)
    n_outs = 1 if power else 2
    if dma_tables:
        hbm_tables = refs[:3]
        dft_re_ref = refs[3]
        dft_im_ref = None if power else refs[4]
        scratch_tables = refs[3 + n_outs:6 + n_outs]
        sems = refs[6 + n_outs]
        dmf_re, dmf_im, b_conv = scratch_tables

        @pl.when(t == 0)
        def _load_tables():
            for idx in range(3):
                pltpu.make_async_copy(hbm_tables[idx], scratch_tables[idx],
                                      sems.at[idx]).start()
            for idx in range(3):
                pltpu.make_async_copy(hbm_tables[idx], scratch_tables[idx],
                                      sems.at[idx]).wait()
    else:
        dmf_re, dmf_im, b_conv = refs[:3]
        dft_re_ref = refs[3]
        dft_im_ref = None if power else refs[4]

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
        return jnp.dot(A_r, b_conv[:], preferred_element_type=jnp.float32)

    def vpu_store(r, dsub):
        base = r * crow_stride
        rows = slice(r * K, (r + 1) * K)
        c_re = crows_ref[base + 0:base + 1, :]
        c_im = crows_ref[base + 1:base + 2, :]
        aux_re = dsub[:, :W].astype(jnp.float32) + (c_re * mre
                                                    - c_im * mim)
        aux_im = dsub[:, W:2 * W].astype(jnp.float32) + (c_re * mim
                                                         + c_im * mre)
        out_re = conv(aux_re)
        out_im = conv(aux_im)
        if plan.roi is not None:
            # conv spill past the ROI edge reads as zero (in-kernel iota:
            # pallas kernels cannot capture array constants)
            first, last = plan.roi
            ib2 = lax.broadcasted_iota(jnp.int32, (1, m), 1)
            roi_row = ((ib2 >= first) & (ib2 < last)).astype(jnp.float32)
            out_re = out_re * roi_row
            out_im = out_im * roi_row
        if power:
            dft_re_ref[rows, :] = (out_re * out_re
                                   + out_im * out_im).astype(
                dft_re_ref.dtype)
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
    if nfixed:
        # Hermitian top-edge columns precomputed in the launcher (the
        # power path's fix columns arrive pre-squared)
        dft_re_ref[:, m - nfixed:m] = (
            fix_ref[:, :nfixed].astype(dft_re_ref.dtype))
        if not power:
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


_CONV_VMEM_BUDGET = 80 * 1024 * 1024


def _conv_vmem_bytes(m: int, K: int, R: int, out_bytes: int) -> int:
    """VMEM bytes of a (tile_k=K, super_r=R) super-tiled configuration:
    resident tables 20*K*W (two f32 dmf planes + the (3K, 2W) bf16 split
    stack), the (R*K, 2W) f32 dots intermediate, and the double-buffered
    output staging 2 planes * R*K*m * out_bytes * 2.  The ONE budget
    model — _conv_pick_tiles (auto pick) and _toepconv_config (user
    overrides) must price configurations identically."""
    W = _round_up(m, 128) + 2 * PAD
    return 20 * K * W + 8 * R * K * W + 4 * R * K * m * out_bytes


def _conv_pick_tiles(m: int, out_bytes: int) -> tuple[int, int] | None:
    """(tile_k, super_r) for the super-tiled kernel under the VMEM budget,
    or None if no configuration fits (plan_supported reports such plans
    False so api.sdft routes to the XLA path; a direct
    forward_block_pallas call raises).

    Preference order is the measured optimum per output element type
    (docs/PERF.md round-4 sweep: f32 -> K=96/R=4, bf16 -> K=64/R=8).
    """
    prefs = ((96, 4),) if out_bytes == 4 else ((64, 8),)
    for K, R in prefs + ((64, 4), (64, 2), (64, 1), (32, 2), (32, 1)):
        if _conv_vmem_bytes(m, K, R, out_bytes) <= _CONV_VMEM_BUDGET:
            return K, R
    return None


@functools.partial(jax.jit,
                   static_argnums=(0, 4, 5, 6, 7, 8, 9))
def _launch_spectra_conv(plan: Plan, state: State, samples, tables,
                         interpret: bool = False, tile_k: int = CONV_TILE_K,
                         super_r: int = CONV_SUPER_R, layout: str = "packed",
                         out_dtype: str | None = None,
                         power: bool = False):
    """Forward spectra via the super-tiled hoisted-Toeplitz kernel.

    The launcher computes every sequential quantity with dense batched
    XLA ops over all tiles at once (per-tile totals via one GEMM, the
    rotated prefix carry c0, the next accumulator, the Hermitian top-edge
    fix columns — see _spectra_prologue), leaving the Pallas grid a
    stateless map; ``super_r`` tiles are emitted per grid step with ONE
    (R*K, 3K) @ (3K, 2W) contraction, so the Toeplitz depth K (the MXU
    work per sample) shrinks without multiplying per-step overheads.
    """
    m = plan.dftsize
    n2 = 2 * m
    W = _round_up(m, 128) + 2 * PAD
    (M,) = samples.shape
    K = tile_k
    R = super_r
    halo = WINDOW_HALO[plan.window]
    (fine_re, fine_im, dmf_re, dmf_im, b_c1, *coarse) = tables

    (delta, dt, nt, new_delayline, c0_re, c0_im, acc_out, fix
     ) = _spectra_prologue(plan, state, samples, K, fine_re, fine_im, coarse)

    # carry rows (c0_re, c0_im) per tile; the per-tile stride is padded so
    # R*stride rows (one grid block) stay divisible by 8 (the f32 sublane
    # tile).
    import math as _math

    rows = [c0_re, c0_im]
    nrows = len(rows)
    req = 8 // _math.gcd(R, 8)
    stride = -(-nrows // req) * req
    rows += [jnp.zeros_like(c0_re)] * (stride - nrows)
    crows = jnp.stack(rows, axis=1).reshape(nt * stride, W)

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
    # NOTE manual ping-pong output DMA measured IDENTICAL to Mosaic's
    # automatic out-block pipelining (docs/PERF.md round-4) — the
    # machinery was retired in round 5 with the other rejected variants
    if interpret:
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    else:
        table_spec = pl.BlockSpec(memory_space=pl.ANY)  # HBM; the kernel
        scratch = [                                # DMAs at t==0
            pltpu.VMEM((K, W), jnp.float32),           # dmf re
            pltpu.VMEM((K, W), jnp.float32),           # dmf im
            pltpu.VMEM((3 * K, 2 * W), jnp.bfloat16),  # stacked conv B
            pltpu.SemaphoreType.DMA((3,)),
        ]
    out_specs = (pl.BlockSpec((R * K, m), lambda t: (t, 0),
                              memory_space=pltpu.VMEM),) * 2
    kernel = functools.partial(_kernel_spectra_conv, plan=plan, tile_k=K,
                               super_r=R, nfixed=halo, crow_stride=stride,
                               power=power, dma_tables=not interpret)
    table_inputs = (dmf_re, dmf_im, b_c1)
    n_outs = 1 if power else 2
    outs = pl.pallas_call(
        kernel,
        grid=(nts,),
        in_specs=[
            pl.BlockSpec((R * stride, W), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),        # carry rows
            pl.BlockSpec((R * K, nfix), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),        # fix cols
            pl.BlockSpec((R * K, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),        # toep hi
            pl.BlockSpec((R * K, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),        # toep lo
        ] + [table_spec] * len(table_inputs),
        out_shape=(jax.ShapeDtypeStruct((M, m), odt),) * n_outs,
        out_specs=out_specs[:n_outs],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=None if interpret else _DIM_SEMANTICS,
            has_side_effects=True),
        interpret=interpret,
    )(crows, fix, toep_hi, toep_lo, *table_inputs)

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


def _toepconv_config(plan: Plan, out_dtype, tile_k, super_r):
    """Resolve the super-tiled kernel's (K, R, tables) for an output
    element type — shared by forward_block_pallas and forward_block_power
    so the tiling heuristics and table selection cannot drift apart."""
    m = plan.dftsize
    odt_bytes = 2 if out_dtype == "bfloat16" else 4
    pick = _conv_pick_tiles(m, odt_bytes)
    if pick is None:
        # No VMEM-feasible configuration: refuse loudly.  plan_supported
        # reports this case False, so api dispatch routes to XLA instead.
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
        est = _conv_vmem_bytes(m, K, R, odt_bytes)
        if est > _CONV_VMEM_BUDGET:
            raise ValueError(
                f"spectra-kernel tiling tile_k={K}, super_r={R} needs "
                f"~{est / 2**20:.0f} MB of VMEM at dftsize {m} "
                f"(budget {_CONV_VMEM_BUDGET // 2**20} MB); lower "
                "tile_k/super_r or leave them unset")
    return K, R, _spectra_tables_conv(plan, K) + _coarse_rows_host(plan, K)


def forward_block_pallas(plan: Plan, state: State, samples, interpret=False,
                         cumsum_mode="toepconv", tile_k=None,
                         layout="packed", out_dtype=None, super_r=None):
    """Fused forward analysis.

    Returns (state, dfts) with dfts packed (M, m, 2), or — with
    ``layout="planar"`` — a (re, im) pair of (M, m) arrays, the kernel's
    native output with no interleaving pass (the fast path for
    magnitude/spectrogram consumers that read the planes independently).
    ``out_dtype="bfloat16"`` (planar only) additionally halves the O(M*m)
    spectra write; the internal scan stays exact f32, only the emitted
    planes are rounded.

    ``cumsum_mode`` selects the kernel: "toepconv" (default) is the
    super-tiled hoisted-Toeplitz kernel (_kernel_spectra_conv — the
    shipped spectra path, ROI-capable); the in-kernel scan variants
    ("mxu2"/"mxu3"/"vpu"/"mxu_f32") remain for the fused round trip and
    A/B measurement.  The round-3 "toephoist" kernel and the fold_conv/
    direct/manual_out/lean A/B variants were retired in round 5 — every
    measurement rejected them (docs/PERF.md round-5 pruning note).
    """
    if cumsum_mode not in ("toepconv", "mxu2", "mxu3", "vpu", "mxu_f32"):
        raise ValueError(f"unknown cumsum_mode {cumsum_mode!r}")
    if cumsum_mode == "toepconv":
        K, R, tables = _toepconv_config(plan, out_dtype, tile_k, super_r)
        return _launch_spectra_conv(plan, state, samples, tables,
                                    interpret, K, R, layout, out_dtype)
    if tile_k is None:
        tile_k = TILE_K
    new_state, dfts, _ = _launch(plan, state, samples, True, False, interpret,
                                 cumsum_mode, tile_k, layout, out_dtype)
    return new_state, dfts


def forward_block_power(plan: Plan, state: State, samples, interpret=False,
                        out_dtype=None, tile_k=None, super_r=None):
    """Fused forward analysis emitting the POWER spectrum |dft|^2 only —
    one (M, m) plane instead of the (re, im) pair, halving the output
    write for spectrogram/magnitude consumers.  ``out_dtype="bfloat16"``
    halves it again.  The internal scan stays exact f32; squaring happens
    at the store."""
    K, R, tables = _toepconv_config(plan, out_dtype, tile_k, super_r)
    return _launch_spectra_conv(plan, state, samples, tables, interpret,
                                K, R, "planar", out_dtype, True)


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
