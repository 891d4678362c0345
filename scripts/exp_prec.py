"""Ad-hoc accuracy probe: f32 LTI/hopped on TPU vs f64 oracle, for MXU
accumulation modes 'highest' (exact f32) and 'high' (3-pass bf16 split).

    python scripts/exp_prec.py [m] [hop] [max_samples] [modes]
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from sdft_tpu import Plan, Precision, init_state  # noqa: E402
from sdft_tpu.cplx import to_complex  # noqa: E402
from sdft_tpu.io.wav import read_wav  # noqa: E402
from sdft_tpu.ops.lti import roundtrip_block_lti, sdft_hopped  # noqa: E402
from sdft_tpu.oracle import NativeSDFT  # noqa: E402


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    hop = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9
    modes = sys.argv[4].split(",") if len(sys.argv) > 4 else ["highest", "high"]
    x, sr = read_wav("/root/reference/test/test.wav")
    size = (min(x.size, cap) // hop) * hop
    x = x[:size].astype(np.float32)
    block = hop * max(1, 4096 // hop)
    print(f"backend={jax.default_backend()} m={m} hop={hop} n={size}")

    eng = NativeSDFT(m, "hann", td_bits=64)
    hops = size // hop
    dfts_ref = np.empty((hops, m), np.complex128)
    y_ref = np.empty(size)
    for h in range(hops):
        d = eng.sdft(x[h * hop:(h + 1) * hop].astype(np.float64))
        dfts_ref[h] = d[0]
        y_ref[h * hop:(h + 1) * hop] = eng.isdft(d)

    from sdft_tpu import refresh

    for mode in modes:
        for do_refresh in (False, True):
            plan = Plan(m, window="hann",
                        precision=Precision("float32", "float32", mxu=mode))
            state = init_state(plan)
            ys = []
            ds = []
            for i in range(0, size, block):
                blk = x[i:i + block]
                _, hd = sdft_hopped(plan, state, blk, hop)
                state, y = roundtrip_block_lti(plan, state, blk)
                if do_refresh:
                    state = refresh(plan, state)
                ys.append(np.asarray(y))
                ds.append(to_complex(np.asarray(hd)))
            y = np.concatenate(ys)
            d = np.concatenate(ds)
            derr = np.abs(d - dfts_ref).max()
            yerr = np.abs(y - y_ref).max()
            print(f"mxu={mode:8s} refresh={int(do_refresh)}: "
                  f"dft max err {derr:.3e}   wav max err {yerr:.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
