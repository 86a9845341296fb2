"""Profiling helpers — the observability analogue (SURVEY.md §5).

The reference's profiling story is its Google-Benchmark suite plus
Debug-only VLOG; the TPU-native equivalents here are:

  * trace(path): context manager around jax.profiler.trace — captures a
    TensorBoard-loadable device trace of everything run inside it.
  * ntt_cost(n, q_bits, ...): analytic per-transform op/byte counts for
    the limb NTT, for roofline sanity checks against measured times.
"""

from __future__ import annotations

import contextlib
import math


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into `log_dir`."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def ntt_cost(n: int, q_bits: int = 60, approx_mulhi: bool = True) -> dict:
    """Analytic cost model of one forward transform on the limb kernels.

    Counts native 32-bit vector multiplies and the HBM bytes of the fused
    kernel (one read + one write of the 2x32-bit planes). Useful to place
    a measured time on the compute/memory roofline.
    """
    butterflies = (n // 2) * int(math.log2(n))
    if q_bits < 30:
        # single-limb path: shoup mulhi32 (4) + 2 mullo (2)
        muls_per_bfly = 6
    else:
        # 2-limb: approx mulhi64 (12) or exact (16), + 2 mullo64 (6 each)
        muls_per_bfly = (12 if approx_mulhi else 16) + 12
    planes = 1 if q_bits < 30 else 2
    return {
        "butterflies": butterflies,
        "mul32_total": butterflies * muls_per_bfly,
        "hbm_bytes_fused": 2 * n * 4 * planes,   # read + write once
        "hbm_bytes_staged": 2 * n * 4 * planes * int(math.log2(n)),
    }
