"""Ad-hoc probe: Mosaic compile time of the fused Pallas kernel by variant.

VERDICT r1 weak#2: forward_block_pallas took 443 s to compile at m=512,
M=2048.  This times `.lower().compile()` for one variant per invocation
(compile caches are per-process, so run each variant as its own process):

    python scripts/exp_compile.py <variant> [m] [M]

variants: full (emit dfts, hann), boxcar (no guard writes), y (emit y only),
vpu (cumsum_mode=vpu), k64/k256 (tile_k), nolimit (no vmem_limit param).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from sdft_tpu import FAST_PRECISION, Plan, init_state  # noqa: E402
from sdft_tpu.kernels import analysis_pallas as ap  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    M = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    window = "boxcar" if variant == "boxcar" else "hann"
    plan = Plan(m, window=window, precision=FAST_PRECISION)
    state = init_state(plan)
    x = np.zeros(M, np.float32)

    kw = dict(emit_dfts=True, emit_y=False, cumsum_mode="mxu2",
              tile_k=ap.TILE_K, layout="packed")
    if variant == "y":
        kw.update(emit_dfts=False, emit_y=True)
    elif variant == "vpu":
        kw.update(cumsum_mode="vpu")
    elif variant.startswith("k"):
        kw.update(tile_k=int(variant[1:]))

    print(f"variant={variant} m={m} M={M} backend={jax.default_backend()}",
          flush=True)
    t0 = time.perf_counter()
    lowered = jax.jit(
        ap._launch,
        static_argnums=(0, 3, 4, 5, 6, 7, 8),
    ).lower(plan, state, x, kw["emit_dfts"], kw["emit_y"], False,
            kw["cumsum_mode"], kw["tile_k"], kw["layout"])
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"trace/lower {t1 - t0:.1f}s   compile {t2 - t1:.1f}s", flush=True)


if __name__ == "__main__":
    main()
