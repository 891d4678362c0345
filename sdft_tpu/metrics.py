"""Quality metrics for sliding-DFT round trips.

The reference's only quantitative quality metric is round-trip SNR in dB
after removing the algorithmic synthesis delay (reference:
python/examples/latency.py:50-57), computed as

    SNR = 10 * log10( mean(x^2) / mean((y - x)^2) )

where ``y`` is the synthesized signal aligned to the input ``x`` by dropping
the first ``(m - 1) * latency`` samples (python/examples/latency.py:30).
This module makes that formula a first-class, importable utility so tests,
examples, benchmarks and the crosscheck harness all gate on the identical
definition (SURVEY.md §5: metrics/observability).
"""

from __future__ import annotations

import numpy as np

from .plan import Plan

__all__ = ["snr_db", "roundtrip_snr_db", "align_roundtrip"]


def snr_db(x, y) -> float:
    """Signal-to-noise ratio of ``y`` against reference ``x``, in dB.

    ``x`` and ``y`` must already be aligned and equal-length; use
    :func:`align_roundtrip` / :func:`roundtrip_snr_db` for synthesized
    signals that carry the algorithmic delay.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.shape != y.shape:
        raise ValueError(f"shape mismatch: {x.shape} vs {y.shape}")
    err = np.mean(np.square(y - x))
    if err == 0:
        return float("inf")
    return float(10.0 * np.log10(np.mean(np.square(x)) / err))


def align_roundtrip(x, y, delay: int) -> tuple[np.ndarray, np.ndarray]:
    """Trim the pair so ``y[delay:]`` lines up with ``x[:-delay]``
    (python/examples/latency.py:52-54).  Works on (..., n) batches."""
    x = np.asarray(x)
    y = np.asarray(y)
    n = x.shape[-1]
    if not 0 <= delay < n:
        raise ValueError(f"delay {delay} out of range for length {n}")
    if delay == 0:
        return x, y
    return x[..., : n - delay], y[..., delay:]


def roundtrip_snr_db(x, y, plan: Plan | None = None, *,
                     delay: int | None = None) -> float:
    """Round-trip SNR with the plan's synthesis delay removed.

    Args:
      x: original samples (..., n).
      y: synthesized samples (..., n), delayed by ``(m - 1) * latency``.
      plan: source of the delay (``plan.synthesis_delay``); alternatively
        pass ``delay`` explicitly.
    """
    if delay is None:
        if plan is None:
            raise ValueError("pass either plan or delay")
        delay = plan.synthesis_delay
    xa, ya = align_roundtrip(x, y, delay)
    return snr_db(xa, ya)
