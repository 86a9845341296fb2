"""Negacyclic NTT over Z_q[X]/(X^N + 1) — public engine API.

Usage parity with the reference NTT class (hexl/include/hexl/ntt/ntt.hpp):

    ntt = NTT(degree=4096, modulus=q)
    y = ntt.forward(x, input_mod_factor=1, output_mod_factor=1)
    x = ntt.inverse(y, input_mod_factor=1, output_mod_factor=1)

Output of `forward` is in bit-reversed order (position-for-position identical
to the reference, including lazy output ranges). Inputs may be host numpy
uint64 arrays or device `limb.U64` pytrees of shape (..., N) — batched over
leading axes (the natural TPU formulation: a batch of RNS polynomials is one
(num_primes, N) call... per prime since q is static per plan).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from .. import config
from ..limb import U64, from_limbs, to_limbs
from . import jnp_ntt
from . import plan as _plan_mod
from .plan import NttPlan, check_arguments, clear_plan_cache, get_plan

__all__ = ["NTT", "NttPlan", "get_plan", "clear_plan_cache",
           "check_arguments", "RnsNTT", "get_rns_plan"]

from .rns import RnsNTT, get_rns_plan  # noqa: E402


def _use_32bit(plan) -> bool:
    return plan.rows is not None and getattr(plan, "bit_shift", 64) == 32


@functools.lru_cache(maxsize=None)
def _jitted_fwd_for_plan(plan, imf: int, omf: int, use_pallas: bool,
                         _cfg=None):
    # _cfg = config.trace_config(): the staged bodies read the radix and
    # approx-mulhi switches at trace time, so env toggles must retrace.
    if _use_32bit(plan):
        from . import ntt32
        import jax.numpy as jnp
        fn32 = ntt32.fwd_ntt32_pallas if use_pallas else ntt32.fwd_ntt32
        return jax.jit(lambda x: U64(
            jnp.zeros_like(x.lo), fn32(x.lo, plan, imf, omf)))
    if use_pallas:
        from . import pallas_ntt
        return jax.jit(lambda x: pallas_ntt.fwd_ntt(x, plan, imf, omf))
    return jax.jit(lambda x: jnp_ntt.fwd_ntt(x, plan, imf, omf))


@functools.lru_cache(maxsize=None)
def _jitted_inv_for_plan(plan, imf: int, omf: int, use_pallas: bool,
                         _cfg=None):
    if _use_32bit(plan):
        from . import ntt32
        import jax.numpy as jnp
        fn32 = ntt32.inv_ntt32_pallas if use_pallas else ntt32.inv_ntt32
        return jax.jit(lambda x: U64(
            jnp.zeros_like(x.lo), fn32(x.lo, plan, imf, omf)))
    if use_pallas:
        from . import pallas_ntt
        return jax.jit(lambda x: pallas_ntt.inv_ntt(x, plan, imf, omf))
    return jax.jit(lambda x: jnp_ntt.inv_ntt(x, plan, imf, omf))


# The jitted-transform caches hold strong references to plan objects;
# flush them together with the plan cache so repeated clear/rebuild cycles
# (or ad-hoc NttPlan construction) don't leak compiled functions + tables.
_plan_mod.register_clear_hook(_jitted_fwd_for_plan.cache_clear)
_plan_mod.register_clear_hook(_jitted_inv_for_plan.cache_clear)


class NTT:
    """Per-(N, q) transform engine; construction precomputes twiddles."""

    def __init__(self, degree: int, modulus: int, device=None):
        """device: optional jax.Device/Sharding for the twiddle tables —
        the allocator-injection analogue (NTT::AllocatorAdapter)."""
        self.plan = get_plan(degree, modulus, device=device)
        self.degree = degree
        self.modulus = modulus

    @property
    def root(self) -> int:
        """Minimal primitive 2N-th root of unity used by this engine."""
        return self.plan.root

    def _dispatch(self, x, fwd: bool, imf: int, omf: int):
        from ..utils import check as _chk
        if _chk.debug_enabled():
            _chk.check_bounds(
                x, imf * self.modulus,
                f"{'forward' if fwd else 'inverse'} NTT input")
        host = not isinstance(x, U64)
        x_l = to_limbs(np.asarray(x, dtype=np.uint64)) if host else x
        use_pallas = config.use_pallas() and self.plan.rows is not None
        fn = (_jitted_fwd_for_plan if fwd else _jitted_inv_for_plan)(
            self.plan, imf, omf, use_pallas, config.trace_config())
        out = fn(x_l)
        return from_limbs(out) if host else out

    def forward(self, x, input_mod_factor: int = 1,
                output_mod_factor: int = 1):
        """Forward NTT; input < IMF*q (IMF in {1,2,4}), bit-reversed output
        in [0, q) for OMF=1 or [0, 4q) for OMF=4."""
        return self._dispatch(x, True, input_mod_factor, output_mod_factor)

    def inverse(self, x, input_mod_factor: int = 1,
                output_mod_factor: int = 1):
        """Inverse NTT; bit-reversed input < IMF*q (IMF in {1,2}), output
        in [0, q) for OMF=1 or [0, 2q) for OMF=2."""
        return self._dispatch(x, False, input_mod_factor, output_mod_factor)

    # Table accessors (parity with the reference engine's getters).
    def root_of_unity_powers(self) -> np.ndarray:
        return self.plan.rop

    def inv_root_of_unity_powers(self) -> np.ndarray:
        return self.plan.irop
