"""Time the hoisted-Toeplitz launcher's XLA prologue alone (no pallas call):
chained-marginal over blocks, fetching a scalar of the prologue outputs."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from sdft_tpu import FAST_PRECISION, Plan, init_state
from sdft_tpu.kernels.analysis_pallas import (
    PAD, _coarse_rows_host, _phase_rows_W, _round_up, _spectra_tables,
    _toeplitz_blocks)
from sdft_tpu.windows import WINDOW_HALO, WINDOW_TAPS

M_BINS, BLOCK, K = 4096, 65536, 128
K_LO, K_HI = 8, 136


def prologue(plan, state, samples, tables):
    m = plan.dftsize
    W = _round_up(m, 128) + 2 * PAD
    (M,) = samples.shape
    Mp = _round_up(M, K)
    nt = Mp // K
    halo = WINDOW_HALO[plan.window]
    hiP = lax.Precision.HIGHEST
    fine_re, fine_im = tables[0], tables[1]

    samples = samples.astype(jnp.float32)
    line = jnp.concatenate([state.delayline.astype(jnp.float32), samples])
    delta = (samples - line[:M]).reshape(1, M)
    new_delayline = line[M:]
    dt = delta.reshape(nt, K)

    s_re = jnp.dot(dt, fine_re, precision=hiP, preferred_element_type=jnp.float32)
    s_im = jnp.dot(dt, fine_im, precision=hiP, preferred_element_type=jnp.float32)
    row_re, row_im = _phase_rows_W(plan, state.offset, nt, K,
                                   (jnp.asarray(CO_RE), jnp.asarray(CO_IM)))
    rt_re = row_re * s_re - row_im * s_im
    rt_im = row_re * s_im + row_im * s_re
    inc_re = jnp.cumsum(rt_re, axis=0)
    inc_im = jnp.cumsum(rt_im, axis=0)
    pre_re = jnp.concatenate([jnp.zeros_like(inc_re[:1]), inc_re[:-1]], axis=0)
    pre_im = jnp.concatenate([jnp.zeros_like(inc_im[:1]), inc_im[:-1]], axis=0)
    c0_re = pre_re * row_re + pre_im * row_im
    c0_im = pre_im * row_re - pre_re * row_im
    c0 = jnp.concatenate([jnp.stack([c0_re, c0_im], axis=1),
                          jnp.zeros((nt, 6, W), jnp.float32)], axis=1
                         ).reshape(nt * 8, W)
    # cheap per-column fixes
    ncol = 2 * halo
    sl = slice(PAD + m - ncol, PAD + m)
    f_re = fine_re[:, sl]
    f_im = fine_im[:, sl]
    b_re = fine_re[1, sl]
    b_im = -fine_im[1, sl]
    v_re = dt[:, :, None] * f_re[None, :, :]
    v_im = dt[:, :, None] * f_im[None, :, :]
    cum_re = jnp.cumsum(v_re, axis=1) + c0_re[:, None, sl]
    cum_im = jnp.cumsum(v_im, axis=1) + c0_im[:, None, sl]
    cf_re = cum_re * f_re[None] + cum_im * f_im[None]
    cf_im = cum_im * f_re[None] - cum_re * f_im[None]
    ac_re = cf_re * b_re - cf_im * b_im
    ac_im = cf_re * b_im + cf_im * b_re
    toep_hi, toep_lo = _toeplitz_blocks(delta, nt, K)
    new_state = state.__class__(offset=state.offset + M,
                                delayline=new_delayline,
                                accumulator=state.accumulator)
    # full-array reductions: corner fetches let XLA dead-code-eliminate the
    # expensive expansions and undercount the prologue
    out = (jnp.sum(c0) + jnp.sum(ac_re) + jnp.sum(ac_im)
           + jnp.sum(toep_hi.astype(jnp.float32))
           + jnp.sum(toep_lo.astype(jnp.float32)))
    return new_state, out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    plan = Plan(M_BINS, window="hann", precision=FAST_PRECISION)
    state = init_state(plan)
    tables = tuple(jnp.asarray(a) for a in _spectra_tables(plan, K))
    global CO_RE, CO_IM
    CO_RE, CO_IM = _coarse_rows_host(plan, K)
    xs = jax.jit(lambda: jax.random.normal(jax.random.key(0), (K_HI, BLOCK),
                                           jnp.float32))()

    @functools.partial(jax.jit, static_argnums=2)
    def many(st, xs, k):
        def body(s, x):
            s2, o = prologue(plan, s, x, tables)
            return s2, o
        st, os_ = lax.scan(body, st, xs[:k])
        return jnp.sum(os_)

    def timed(k):
        float(many(state, xs, k))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(many(state, xs, k))
            best = min(best, time.perf_counter() - t0)
        return best
    t_lo, t_hi = timed(K_LO), timed(K_HI)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    print(f"prologue: {per*1e3:.3f} ms/block (signal {(t_hi-t_lo)/t_hi:.0%})")


if __name__ == "__main__":
    main()
