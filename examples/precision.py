"""Precision-tier tour: the reference's TD/FD dtype matrix on TPU terms.

The reference exposes float/double/long-double FD tiers via template
parameters (c/src/sdft/sdft.h:21-37,101-125).  This framework mirrors
them as `Precision` configurations and adds the TPU-native extended tier:

  * float32 fast path       — the throughput configuration (~2e-8..5e-7)
  * float32 + refresh       — drift-free endless streams (default chains)
  * float32x2 (double-word) — f64-class spectra WITHOUT float64 hardware
  * float64                 — CPU parity mode (x64)

Each tier's forward spectra are compared against the float64 scan path on
a short noise stream.  Run on CPU (x64) the float32x2 row shows its true
~1e-13 class; on TPU the f64 reference itself resolves to f32 (no f64
unit), so the printed residuals are f32-reference-limited — the footer
says so, and the real on-chip 1e-13-class gate lives in
tests/test_tpu.py::test_extended_twofloat_tier_on_tpu against the f64
native oracle.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import jax

# honor JAX_PLATFORMS even under the hosted TPU plugin, which overrides the
# env var at import time (config wins while no backend is initialized)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
# a real f64 reference needs x64; the TPU runtime has no f64 (its x64
# rewriter aborts on complex128), so only CPU backends get the flag —
# same policy as the CLI's parity mode
try:
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
except Exception:
    pass

import numpy as np


def main():
    from sdft_tpu import Plan, Precision, df_to_float64, init_state, sdft
    from sdft_tpu.ops.analysis import sdft_block

    m, M = 512, 2048
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal(M), -2, 2).astype(np.float32) / 2

    # float64 reference (resolves to f32 off-x64 platforms; the printed
    # residual then shows ~0 by construction and the tier table says so)
    plan64 = Plan(m, window="hann", precision=Precision("float64", "float64"))
    _, d64 = sdft_block(plan64, init_state(plan64), x.astype(np.float64))
    want = np.asarray(d64, np.float64)
    scale = np.abs(want).max()

    rows = []

    plan32 = Plan(m, window="hann", precision=Precision("float32", "float32"))
    _, d32 = sdft(plan32, init_state(plan32), x)
    rows.append(("float32 fast path", np.asarray(d32, np.float64)))

    planx2 = Plan(m, window="hann",
                  precision=Precision("float32", "float32x2"))
    _, dx2 = sdft(planx2, init_state(planx2), x)
    got = df_to_float64((np.asarray(dx2[..., 0]), np.asarray(dx2[..., 1])))
    rows.append(("float32x2 double-word", got))

    print(f"m={m}, {M} samples, backend={jax.default_backend()}")
    print(f"{'tier':24s} max |err| / scale")
    for name, got in rows:
        err = np.abs(got - want).max() / scale
        print(f"{name:24s} {err:.3e}")
    x64 = bool(jax.config.jax_enable_x64)
    print(f"(reference tier: float64 scan path; x64 {'on' if x64 else 'off'}"
          f"{'' if x64 else ' — f64 resolves to f32 here'})")


if __name__ == "__main__":
    main()
