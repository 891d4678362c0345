"""split4 MXU mode: accuracy vs HIGHEST/f64-oracle + 8-channel throughput
sweep (VERDICT r2 #8: chase the ~1G samples/s exact-f32 arithmetic bound)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from sdft_tpu import Plan, Precision, init_state
from sdft_tpu.ops.lti import roundtrip_block_lti

M_BINS, BLOCK, C = 4096, 32768, 8
K_LO, K_HI = 8, 136

P_HI = Precision("float32", "float32", mxu="highest")
P_S4 = Precision("float32", "float32", mxu="split4")


def accuracy():
    rng = np.random.default_rng(3)
    x = np.clip(rng.standard_normal(BLOCK), -3, 3).astype(np.float32) / 2
    ys = {}
    for name, prec in (("highest", P_HI), ("split4", P_S4)):
        plan = Plan(M_BINS, window="hann", precision=prec)
        st = init_state(plan)
        st, y = roundtrip_block_lti(plan, st, x)
        ys[name] = np.asarray(jax.device_get(y), np.float64)
        accs = np.asarray(st.accumulator, np.float64)
        if name == "highest":
            acc_hi = accs
        else:
            print(f"acc diff split4 vs highest: "
                  f"{np.abs(accs - acc_hi).max():.3e}")
    print(f"y diff split4 vs highest: "
          f"{np.abs(ys['split4'] - ys['highest']).max():.3e}")
    from sdft_tpu.oracle import NativeSDFT
    eng = NativeSDFT(M_BINS, "hann", td_bits=64)
    d = eng.sdft(x.astype(np.float64))
    y_ref = eng.isdft(d)
    for name in ("highest", "split4"):
        print(f"y diff {name} vs f64 oracle: "
              f"{np.abs(ys[name] - y_ref).max():.3e}")


def bench():
    def chain(step):
        @functools.partial(jax.jit, static_argnums=2)
        def many(state, xs, k):
            def body(st, x):
                st, y = step(st, x)
                return st, jnp.sum(y * y)
            st, s = lax.scan(body, state, xs[:k])
            return jnp.sum(s)
        return many

    xs = jax.jit(lambda: jax.random.normal(jax.random.key(0), (K_HI, C, BLOCK),
                                           jnp.float32))()
    for name, prec in (("highest", P_HI), ("split4", P_S4)):
        plan = Plan(M_BINS, window="hann", precision=prec)
        for kt in (512, 1024, 2048):
            st = init_state(plan, channels=C)
            many = chain(lambda s, x: roundtrip_block_lti(plan, s, x, kt))
            def timed(k):
                float(many(st, xs, k))
                best = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    float(many(st, xs, k))
                    best = min(best, time.perf_counter() - t0)
                return best
            t_lo, t_hi = timed(K_LO), timed(K_HI)
            per = (t_hi - t_lo) / (K_HI - K_LO)
            print(f"{name} k_tile={kt}: {per*1e3:.3f} ms/block "
                  f"(signal {(t_hi-t_lo)/t_hi:.0%}) -> "
                  f"{C*BLOCK/per:,.0f} aggregate samples/s", flush=True)


if __name__ == "__main__":
    if "bench" in sys.argv:
        bench()
    else:
        accuracy()
