"""Portable XLA (jnp) element-wise modular kernels on U64 limb pairs.

These are the 'native path' of the framework: shape-polymorphic, trace under
jit on any backend, and serve as the dispatch fallback the Pallas kernels are
tested bit-exactly against. Semantics match the reference library's public
eltwise ops one-for-one (reference: hexl/eltwise/*.cpp); all moduli and mod
factors are static Python ints baked into the trace.

All functions take and return `limb.U64` pytrees. Values are u64 carried as
2x32-bit limbs; see hexl_tpu.limb for the arithmetic vocabulary.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

from .. import nt
from ..limb import (U64, add64, cond_sub64_half, const64, ge64, gt64, le64,
                    lt64,
                    mult_mod_barrett, mult_mod_barrett_approx, mul64_wide,
                    mullo64, mulhi64, montgomery_reduce_u128,
                    barrett_reduce_u64, barrett_reduce_u64_approx,
                    reduce_mod_lazy64, select64, shoup_mul_lazy,
                    shoup_mul_lazy_approx, sub64, eq64)

ScalarOrU64 = Union[int, U64]

# CMPINT predicate names (reference: hexl/include/hexl/util/util.hpp:16-25)
_CMP_FNS = {
    "eq": lambda a, b: eq64(a, b),
    "lt": lambda a, b: lt64(a, b),
    "le": lambda a, b: le64(a, b),
    "false": lambda a, b: jnp.zeros(a.lo.shape, dtype=bool),
    "ne": lambda a, b: ~eq64(a, b),
    "nlt": lambda a, b: ge64(a, b),
    "nle": lambda a, b: gt64(a, b),
    "true": lambda a, b: jnp.ones(a.lo.shape, dtype=bool),
}


def _approx() -> bool:
    """Approximate-mulhi quotients in the eltwise Barrett/Shoup bodies:
    same dispatch rule as the NTT butterflies (config.approx_butterflies —
    TPU backend only, HEXL_TPU_DISABLE_APPROX kill switch). Fully-reduced
    outputs are bit-identical either way; OMF=2 lazy outputs agree mod q."""
    from .. import config as _config
    return _config.approx_butterflies()


def _as_u64_operand(b: ScalarOrU64) -> U64:
    if isinstance(b, U64):
        return b
    return const64(int(b))


def compare(cmp: str, a: U64, bound: ScalarOrU64):
    try:
        fn = _CMP_FNS[cmp]
    except KeyError:
        raise ValueError(f"unknown cmp {cmp!r}") from None
    return fn(a, _as_u64_operand(bound))


def add_mod(a: U64, b: ScalarOrU64, modulus: int) -> U64:
    """(a + b) mod q; inputs in [0, q). Vector-vector or vector-scalar."""
    s = add64(a, _as_u64_operand(b))
    return cond_sub64_half(s, const64(modulus))  # s < 2q


def sub_mod(a: U64, b: ScalarOrU64, modulus: int) -> U64:
    """(a - b) mod q; inputs in [0, q). Vector-vector or vector-scalar."""
    d = add64(sub64(a, _as_u64_operand(b)), const64(modulus))
    return cond_sub64_half(d, const64(modulus))  # d < 2q


def mult_mod(a: U64, b: U64, modulus: int, input_mod_factor: int = 1) -> U64:
    """(a * b) mod q; inputs < IMF*q, IMF in {1,2,4}; output in [0, q)."""
    if input_mod_factor not in (1, 2, 4):
        raise ValueError("input_mod_factor must be 1, 2 or 4")
    x = reduce_mod_lazy64(a, modulus, input_mod_factor)
    y = reduce_mod_lazy64(b, modulus, input_mod_factor)
    if _approx():
        return mult_mod_barrett_approx(x, y, modulus)
    return mult_mod_barrett(x, y, modulus)


def fma_mod(arg1: U64, arg2: int, arg3: Optional[U64], modulus: int,
            input_mod_factor: int = 1) -> U64:
    """(arg1 * arg2 + arg3) mod q via Shoup multiplication by the scalar.

    arg2 is a host scalar (its Barrett factor is precomputed at trace time);
    arg1/arg3 < IMF*q with IMF in {1,2,4,8}; q < 2^61. Output in [0, q).
    """
    if input_mod_factor not in (1, 2, 4, 8):
        raise ValueError("input_mod_factor must be 1, 2, 4 or 8")
    a2 = nt.reduce_mod(int(arg2), modulus, input_mod_factor)
    a2_precon = nt.barrett_factor(a2, 64, modulus)
    return fma_mod_preconned(arg1, const64(a2), const64(a2_precon), arg3,
                             modulus, input_mod_factor)


def fma_mod_preconned(arg1: U64, w: U64, wp: U64, arg3: Optional[U64],
                      modulus: int, input_mod_factor: int = 1) -> U64:
    """fma_mod with the scalar already reduced and Shoup-preconditioned
    (w = arg2 mod q, wp = floor(w << 64 / q)) — lets dispatchers pass the
    scalar as a traced operand so one compile serves every scalar value."""
    x = reduce_mod_lazy64(arg1, modulus, input_mod_factor)
    if _approx():
        prod = shoup_mul_lazy_approx(x, w, wp, modulus,
                                     const64(2 * modulus))
    else:
        prod = shoup_mul_lazy(x, w, wp, modulus)
    prod = cond_sub64_half(prod, const64(modulus))  # prod < 2q
    if arg3 is None:
        return prod
    a3 = reduce_mod_lazy64(arg3, modulus, input_mod_factor)
    return add_mod(prod, a3, modulus)


def reduce_mod(a: U64, modulus: int, input_mod_factor: int,
               output_mod_factor: int) -> U64:
    """Range-change op; IMF in {2, 4, modulus}, OMF in {1, 2}."""
    if output_mod_factor not in (1, 2):
        raise ValueError("output_mod_factor must be 1 or 2")
    if input_mod_factor == output_mod_factor:
        return a
    if input_mod_factor == modulus:
        q_barr = nt.barrett_factor(1, 64, modulus)
        br = barrett_reduce_u64_approx if _approx() else barrett_reduce_u64
        red = br(a, modulus, q_barr, output_mod_factor)
        return select64(ge64(a, const64(modulus)), red, a)
    if input_mod_factor == 2:
        return cond_sub64_half(a, const64(modulus))
    if input_mod_factor == 4:
        if output_mod_factor == 1:
            return reduce_mod_lazy64(a, modulus, 4)
        return cond_sub64_half(a, const64(2 * modulus))
    raise ValueError("input_mod_factor must be 2, 4, or == modulus")


def cmp_add(a: U64, cmp: str, bound: ScalarOrU64,
            diff: ScalarOrU64) -> U64:
    """result = cmp(a, bound) ? a + diff : a (wrapping, no reduction)."""
    mask = compare(cmp, a, bound)
    return select64(mask, add64(a, _as_u64_operand(diff)), a)


def cmp_sub_mod(a: U64, modulus: int, cmp: str, bound: ScalarOrU64,
                diff: ScalarOrU64) -> U64:
    """result = cmp(a, bound) ? (a mod q - diff) mod q : a mod q.

    Predicate evaluated on the unreduced input; diff < q.
    """
    mask = compare(cmp, a, bound)
    q_barr = nt.barrett_factor(1, 64, modulus)
    br = barrett_reduce_u64_approx if _approx() else barrett_reduce_u64
    red = br(a, modulus, q_barr, 1)
    sub = cond_sub64_half(
        add64(sub64(red, _as_u64_operand(diff)), const64(modulus)),
        const64(modulus))
    return select64(mask, sub, red)


# --- Montgomery family (reference: eltwise-reduce-mod-avx512.hpp:155-350) ---

def montgomery_form_in(a: U64, modulus: int, r: int = 64) -> U64:
    """a * R mod q (enter Montgomery form), a in [0, q)."""
    R_mod_q = (1 << r) % modulus
    if _approx():
        return mult_mod_barrett_approx(a, const64(R_mod_q), modulus)
    return mult_mod_barrett(a, const64(R_mod_q), modulus)


def montgomery_form_out(a: U64, modulus: int, r: int = 64) -> U64:
    """a * R^-1 mod q (leave Montgomery form)."""
    inv = nt.hensel_lemma_2adic_root(r, modulus)
    from ..limb import U128, zeros64
    t = U128(hi=zeros64(a.lo.shape), lo=a)
    return montgomery_reduce_u128(t, modulus, r, inv)


def montgomery_mult_reduce(a: U64, b: U64, modulus: int, r: int = 64) -> U64:
    """REDC(a*b): returns a*b*R^-1 mod q for a, b in [0, q)."""
    inv = nt.hensel_lemma_2adic_root(r, modulus)
    t = mul64_wide(a, b)
    return montgomery_reduce_u128(t, modulus, r, inv)
