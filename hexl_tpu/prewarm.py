"""Compilation-cache prewarming for production deployments.

Several regimes have steep cold-compile costs on the current toolchain
(measured, see docs/ROADMAP.md): the MXU four-step path at small N
(~400-530 s), the fused Pallas kernel at N=2^16 (~8 min), the staged XLA
body at N=2^20 (~4 min/direction). The persistent JAX compilation cache
(JAX_COMPILATION_CACHE_DIR) makes every later process start warm — this
module populates it ahead of serving so no production request ever eats a
cold compile.

Usage:
    import hexl_tpu
    hexl_tpu.prewarm([(1 << 14, 60), (1 << 15, 50)], batch=256)

Each config compiles the forward and inverse staged transforms at the
strict and lazy mod-factor signatures (the four entry points the
composites chain) and executes one tiny step so the executable lands in
the cache. Extra regimes (pallas / mxu) are opt-in via `backends`.
"""

from __future__ import annotations

import os
import time
from typing import Iterable, Sequence, Tuple

import numpy as np


def _ensure_cache_env():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/hexl_tpu_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def prewarm(configs: Iterable[Tuple[int, int]], batch: int = 1,
            backends: Sequence[str] = ("xla",), verbose: bool = True):
    """Compile the NTT entry points for each (degree, q_or_q_bits) config.

    configs: iterable of (n, q) — q is taken as a modulus when it looks
             like one (> 2^20), else as a bit-width for generate_primes.
    batch:   leading batch dimension to compile for (shape-specific).
    backends: subset of {"xla", "pallas", "mxu"}.

    Returns a list of (n, q, backend, seconds) compile records.
    """
    _ensure_cache_env()
    import jax

    from . import nt
    from .limb import to_limbs
    from .ntt import get_plan, jnp_ntt

    records = []
    rng = np.random.default_rng(0)
    for n, q_spec in configs:
        q = (int(q_spec) if int(q_spec) > (1 << 20)
             else int(nt.generate_primes(1, int(q_spec), True,
                                         ntt_size=n)[0]))
        plan = get_plan(n, q)
        x = to_limbs(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
        for backend in backends:
            t0 = time.perf_counter()
            if backend == "xla":
                for imf, omf in ((1, 1), (4, 4)):
                    out = jax.jit(
                        lambda v, a=imf, b=omf: jnp_ntt.fwd_ntt(
                            v, plan, a, b))(x)
                    jax.block_until_ready(out)
                for imf, omf in ((1, 1), (2, 2)):
                    out = jax.jit(
                        lambda v, a=imf, b=omf: jnp_ntt.inv_ntt(
                            v, plan, a, b))(x)
                    jax.block_until_ready(out)
            elif backend == "pallas":
                from .ntt import pallas_ntt
                if n <= pallas_ntt.PALLAS_MAX_N_FWD:
                    out = pallas_ntt.fwd_ntt(x, plan, 1, 1)
                    jax.block_until_ready((out.hi, out.lo))
                if n <= pallas_ntt.PALLAS_MAX_N_INV:
                    out = pallas_ntt.inv_ntt(x, plan, 1, 1)
                    jax.block_until_ready((out.hi, out.lo))
            elif backend == "mxu":
                from .ntt import mxu_ntt
                mplan = mxu_ntt.get_mxu_plan(n, q)
                out = mxu_ntt.fwd_ntt_mxu(x, mplan, 1, 1)
                jax.block_until_ready((out.hi, out.lo))
                out = mxu_ntt.inv_ntt_mxu(x, mplan, 1, 1)
                jax.block_until_ready((out.hi, out.lo))
            else:
                raise ValueError(f"unknown backend {backend!r}")
            dt = time.perf_counter() - t0
            records.append((n, q, backend, dt))
            if verbose:
                print(f"prewarm: n=2^{n.bit_length()-1} q={q} "
                      f"[{backend}] {dt:.1f}s", flush=True)
    return records
