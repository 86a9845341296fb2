"""Single-limb element-wise kernels for small moduli (the DQ-32 regime).

The reference keeps a dedicated arithmetic regime for q < 2^30, its
best-performance bound on the DQ path (README.md:202-204, 32-bit
preconditioning in hexl/ntt/ntt-internal.cpp:113-139). Here the analogue
is: all values < IMF*q fit one uint32 plane, so every op runs on a single
u32 array with native 32-bit wraparound — roughly 4x fewer lane ops than
the 2x32-limb bodies (jnp_kernels.py).

Dispatch contract (ops.py): these bodies are selected when
input_mod_factor * modulus < 2^32. Inputs still travel as U64 pytrees for
API uniformity; only the .lo plane is read and the .hi result plane is
zero (valid because in-range inputs have hi == 0; out-of-range inputs are
undefined behavior in release, matching the reference).

Barrett quotient analysis for mult_mod (single mulhi variant of the
generalized Barrett in eltwise-mult-mod-internal.hpp:118-186, re-derived
for 32-bit lanes): with n = bits(q), c1 = floor(prod / 2^(n-2)) < 2^(n+2)
<= 2^32 and mu = floor(2^(n+30) / q) < 2^31,
    q_hat = floor(c1 * mu / 2^32) >= floor(prod/q) - 3,
so Z = prod - q_hat*q lands in [0, 4q) (< 2^32) and two conditional
subtracts restore [0, q).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..limb import U64, umul32_hi, umul32_wide

_U32 = jnp.uint32


def _lift(lo) -> U64:
    return U64(jnp.zeros_like(lo), lo)


def _cond_sub32(x, q: int):
    qq = np.uint32(q)
    return jnp.where(x >= qq, x - qq, x)


def _reduce_lazy32(x, modulus: int, input_mod_factor: int):
    if input_mod_factor >= 8:
        x = _cond_sub32(x, 4 * modulus)
    if input_mod_factor >= 4:
        x = _cond_sub32(x, 2 * modulus)
    if input_mod_factor >= 2:
        x = _cond_sub32(x, modulus)
    return x


def add_mod32(a: U64, b, modulus: int) -> U64:
    """(a + b) mod q on one u32 plane; inputs in [0, q), q < 2^31."""
    b_lo = b.lo if isinstance(b, U64) else jnp.asarray(b, _U32)
    return _lift(_cond_sub32(a.lo + b_lo, modulus))


def sub_mod32(a: U64, b, modulus: int) -> U64:
    """(a - b) mod q on one u32 plane; inputs in [0, q), q < 2^31."""
    b_lo = b.lo if isinstance(b, U64) else jnp.asarray(b, _U32)
    return _lift(_cond_sub32(a.lo + np.uint32(modulus) - b_lo, modulus))


def _barrett_prod32(prod_hi, prod_lo, modulus: int, n_bits: int):
    """Reduce a < 2^(2n) product (as u32 hi/lo) to [0, 2q)."""
    shift = n_bits - 2
    if shift == 0:
        c1 = prod_lo
    elif shift < 32:
        c1 = (prod_lo >> shift) | (prod_hi << (32 - shift))
    else:
        c1 = prod_hi >> (shift - 32)
    mu = (1 << (n_bits + 30)) // modulus
    # q_hat = floor(c1 * mu / 2^32); mu < 2^31 so the high half suffices.
    q_hat = umul32_hi(c1, np.uint32(mu))
    z = prod_lo - q_hat * np.uint32(modulus)   # mod 2^32; true Z < 4q
    return _cond_sub32(z, 2 * modulus)


def mult_mod32(a: U64, b: U64, modulus: int,
               input_mod_factor: int = 1) -> U64:
    """(a * b) mod q; inputs < IMF*q with IMF*q < 2^32; output [0, q)."""
    n_bits = modulus.bit_length()
    x = _reduce_lazy32(a.lo, modulus, input_mod_factor)
    y = _reduce_lazy32(b.lo, modulus, input_mod_factor)
    hi, lo = umul32_wide(x, y)
    z = _barrett_prod32(hi, lo, modulus, n_bits)
    return _lift(_cond_sub32(z, modulus))


def fma_mod32_preconned(arg1: U64, w, wp, arg3: Optional[U64],
                        modulus: int, input_mod_factor: int = 1) -> U64:
    """(arg1 * w + arg3) mod q via 32-bit Shoup multiplication.

    w = scalar mod q (u32), wp = floor(w << 32 / q) (u32), both traced
    operands. arg1/arg3 < IMF*q with IMF*q < 2^32.
    """
    x = _reduce_lazy32(arg1.lo, modulus, input_mod_factor)
    w_lo = w.lo if isinstance(w, U64) else jnp.asarray(w, _U32)
    wp_lo = wp.lo if isinstance(wp, U64) else jnp.asarray(wp, _U32)
    q_hat = umul32_hi(x, wp_lo)
    r = x * w_lo - q_hat * np.uint32(modulus)   # [0, 2q)
    r = _cond_sub32(r, modulus)
    if arg3 is None:
        return _lift(r)
    a3 = _reduce_lazy32(arg3.lo, modulus, input_mod_factor)
    return _lift(_cond_sub32(r + a3, modulus))


def reduce_mod32(a: U64, modulus: int, input_mod_factor: int,
                 output_mod_factor: int) -> U64:
    """Range-change op on one u32 plane; IMF in {2, 4, modulus}."""
    if output_mod_factor not in (1, 2):
        raise ValueError("output_mod_factor must be 1 or 2")
    if input_mod_factor == output_mod_factor:
        return _lift(a.lo)
    if input_mod_factor == modulus:
        # Full reduction from [0, 2^32): Barrett on the 32-bit value.
        n_bits = modulus.bit_length()
        z = _barrett_prod32(jnp.zeros_like(a.lo), a.lo, modulus, n_bits)
        if output_mod_factor == 1:
            z = _cond_sub32(z, modulus)
        return _lift(z)
    if input_mod_factor == 2:
        return _lift(_cond_sub32(a.lo, modulus))
    if input_mod_factor == 4:
        z = _cond_sub32(a.lo, 2 * modulus)
        if output_mod_factor == 1:
            z = _cond_sub32(z, modulus)
        return _lift(z)
    raise ValueError("input_mod_factor must be 2, 4, or == modulus")


# The Montgomery family stays on the 64-bit bodies in the dispatcher even
# for small q: its public semantics are defined in terms of R = 2^64
# (form_in/out/mult_reduce would silently change meaning under R = 2^32).
