"""Shared measurement protocol for every TPU benchmark in this repo.

Encodes the three hard-won tunnel rules (BASELINE.md "Measurement
hazard", round-3 addendum):
  1. block_until_ready UNDER-BLOCKS on this tunnel; the only reliable
     completion barrier is a D2H fetch of one output element.
  2. A timed call carries ~40-60 ms fixed cost (dispatch + sync +
     fetch); per-op numbers must either amortize it (>= ~0.5 s device
     work) or cancel it with chain-length DIFFERENTIALS
     (T(k2) - T(k1)) / (k2 - k1).
  3. All work must be chained inside ONE dispatch via lax.scan
     (dependent u32-multiply programs permanently degrade the tunnel's
     dispatch pipelining; async dispatch timings lie in both
     directions).

benchmarks/bench_suite.py carries its own (equivalent) amortizing
implementation for the committed rows; the probes and A/Bs use this
module so no probe can regress to a bare block_until_ready again
(VERDICT round 3, Weak #1).
"""

import time

import numpy as np


def fetch(out):
    """Completion barrier: block_until_ready THEN a D2H fetch of one
    element (the fetch is what actually waits on this tunnel)."""
    import jax
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0] if leaf.ndim else leaf)


def timed_median(fn, args, reps=3):
    """Median wall time of fn(*args) ending in a D2H fetch barrier.
    Includes the ~40-60 ms fixed tunnel cost — use chain_rate (a
    differential) or subtract a calibrated null round for per-op use."""
    out = fn(*args)
    fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def make_chain(step, k):
    """jit(x -> x after k dependent applications of step) via lax.scan.
    step may return any pytree matching its input."""
    import jax

    def run(x):
        return jax.lax.scan(lambda c, _: (step(c), None), x, None,
                            length=k)[0]

    return jax.jit(run)


def chain_rate(step, x, ops_per_step, k1=256, k2=4096, reps=3):
    """Ops/second by chain-length differential — immune to both the
    fixed dispatch cost and tunnel under-blocking.

    Times a k1-long and a k2-long scan of `step` (each a single
    dispatch, fetch-barriered) and returns
      ops_per_step * (k2 - k1) / (T(k2) - T(k1)).
    """
    t1 = timed_median(make_chain(step, k1), (x,), reps)
    t2 = timed_median(make_chain(step, k2), (x,), reps)
    if t2 <= t1:
        return float("nan")
    return ops_per_step * (k2 - k1) / (t2 - t1)
