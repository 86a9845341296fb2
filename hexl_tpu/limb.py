"""2x32-bit limb arithmetic — the TPU analogue of the AVX-512 primitive layer.

TPU VPUs have no 64-bit integer datapath, so every 64-bit value is carried as
a pair of uint32 arrays ``U64(hi, lo)``. All helpers here are pure jnp on
uint32, so they trace identically under ``jax.jit`` and inside Pallas kernels
(this file is the vocabulary both the XLA fallback kernels and the Pallas
kernels are written in — the role hexl/util/avx512-util.hpp plays in the
reference, re-derived for 32-bit lanes).

Exactness notes:
  * uint32 multiply on the VPU wraps mod 2^32 (verified on v5e);
    32x32 -> 64 products are assembled from four 16x16 partial products.
  * All carry chains use the standard (sum < addend) borrow/carry trick.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_MASK16 = np.uint32(0xFFFF)
_U32 = jnp.uint32


class U64(NamedTuple):
    """A 64-bit unsigned integer as two uint32 arrays (hi, lo)."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return self.lo.shape


class U128(NamedTuple):
    """A 128-bit unsigned integer as two U64s (hi, lo)."""

    hi: U64
    lo: U64


# ---------------------------------------------------------------------------
# Host conversion
# ---------------------------------------------------------------------------

def to_limbs(x) -> U64:
    """numpy uint64 array -> U64 limb pair (host-side)."""
    a = np.asarray(x, dtype=np.uint64)
    return U64(
        hi=jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
        lo=jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


def from_limbs(x: U64) -> np.ndarray:
    """U64 limb pair -> numpy uint64 array (host-side)."""
    hi = np.asarray(x.hi).astype(np.uint64)
    lo = np.asarray(x.lo).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


def const64(value: int, shape=()) -> U64:
    """Broadcastable U64 constant from a Python int."""
    value = int(value)
    if not 0 <= value < (1 << 64):
        raise ValueError("value out of uint64 range")
    return U64(
        hi=jnp.full(shape, (value >> 32) & 0xFFFFFFFF, dtype=_U32),
        lo=jnp.full(shape, value & 0xFFFFFFFF, dtype=_U32),
    )


def zeros64(shape=()) -> U64:
    return U64(jnp.zeros(shape, _U32), jnp.zeros(shape, _U32))


# ---------------------------------------------------------------------------
# 32-bit building blocks
# ---------------------------------------------------------------------------

def add32_carry(a, b):
    """(a + b) mod 2^32 and the carry-out bit (as uint32)."""
    s = a + b
    return s, (s < a).astype(_U32)


def umul32_wide(a, b):
    """Full 32x32 -> 64 product as (hi32, lo32) via 16-bit partials."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # carry column at bit 16
    mid = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)  # <= 3*(2^16-1): fits
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    lo = (mid << 16) | (ll & _MASK16)
    return hi, lo


def umul32_hi(a, b):
    """High 32 bits of the 32x32 product."""
    return umul32_wide(a, b)[0]


# ---------------------------------------------------------------------------
# 64-bit ops on U64
# ---------------------------------------------------------------------------

def add64(x: U64, y: U64) -> U64:
    """(x + y) mod 2^64."""
    lo, c = add32_carry(x.lo, y.lo)
    return U64(x.hi + y.hi + c, lo)


def add64_small(x: U64, k) -> U64:
    """(x + k) mod 2^64 for a uint32 k."""
    lo = x.lo + k
    return U64(x.hi + (lo < x.lo).astype(_U32), lo)


def sub64(x: U64, y: U64) -> U64:
    """(x - y) mod 2^64."""
    lo = x.lo - y.lo
    borrow = (x.lo < y.lo).astype(_U32)
    return U64(x.hi - y.hi - borrow, lo)


def eq64(x: U64, y: U64):
    return (x.hi == y.hi) & (x.lo == y.lo)


def lt64(x: U64, y: U64):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def ge64(x: U64, y: U64):
    return ~lt64(x, y)


def le64(x: U64, y: U64):
    return lt64(x, y) | eq64(x, y)


def gt64(x: U64, y: U64):
    return ~le64(x, y)


def select64(mask, x: U64, y: U64) -> U64:
    """mask ? x : y, elementwise."""
    return U64(jnp.where(mask, x.hi, y.hi), jnp.where(mask, x.lo, y.lo))


def cond_sub64(x: U64, q: U64) -> U64:
    """x >= q ? x - q : x — the small-mod min-trick analogue."""
    d = sub64(x, q)
    return select64(ge64(x, q), d, x)


_SIGN32 = np.uint32(0x80000000)


def cond_sub64_half(x: U64, c: U64) -> U64:
    """x >= c ? x - c : x, REQUIRING x < c + 2^63 and c <= 2^63.

    Every lazy-reduction conditional subtract in this library is a range
    HALVER (x < 2c with c a small multiple of q < 2^62), which satisfies
    the contract, so the wrapped difference d = x - c mod 2^64 lands in
    [0, 2^63) exactly when x >= c and in [2^63, 2^64) otherwise: one
    sign-bit test replaces the three-comparison 64-bit >= of cond_sub64
    (8 lane ops vs 13). Bit-identical to cond_sub64 under the contract.
    """
    d = sub64(x, c)
    neg = d.hi >= _SIGN32
    return U64(jnp.where(neg, x.hi, d.hi), jnp.where(neg, x.lo, d.lo))


def reduce_mod_lazy64(x: U64, modulus: int, input_mod_factor: int) -> U64:
    """x mod q given x < input_mod_factor*q, by conditional subtraction.

    Each step is a range halver (x < 2c), so the sign-test subtract
    applies; IMF=8 additionally requires q < 2^61 (the reference's own
    bound for 8q to fit 64 bits, eltwise-fma-mod.cpp)."""
    if input_mod_factor not in (1, 2, 4, 8):
        raise ValueError("input_mod_factor must be 1, 2, 4 or 8")
    if input_mod_factor >= 8:
        x = cond_sub64_half(x, const64(4 * modulus))
    if input_mod_factor >= 4:
        x = cond_sub64_half(x, const64(2 * modulus))
    if input_mod_factor >= 2:
        x = cond_sub64_half(x, const64(modulus))
    return x


def shr64(x: U64, s: int) -> U64:
    """Logical right shift by a static amount s in [0, 64)."""
    if s == 0:
        return x
    if s < 32:
        lo = (x.lo >> s) | (x.hi << (32 - s))
        return U64(x.hi >> s, lo)
    if s == 32:
        return U64(jnp.zeros_like(x.hi), x.hi)
    return U64(jnp.zeros_like(x.hi), x.hi >> (s - 32))


def shl64(x: U64, s: int) -> U64:
    """Logical left shift by a static amount s in [0, 64)."""
    if s == 0:
        return x
    if s < 32:
        hi = (x.hi << s) | (x.lo >> (32 - s))
        return U64(hi, x.lo << s)
    if s == 32:
        return U64(x.lo, jnp.zeros_like(x.lo))
    return U64(x.lo << (s - 32), jnp.zeros_like(x.lo))


# ---------------------------------------------------------------------------
# 64-bit multiplies
# ---------------------------------------------------------------------------

def mul64_wide(x: U64, y: U64) -> U128:
    """Full 64x64 -> 128 product (schoolbook over uint32 limbs)."""
    p00h, p00l = umul32_wide(x.lo, y.lo)
    p01h, p01l = umul32_wide(x.lo, y.hi)
    p10h, p10l = umul32_wide(x.hi, y.lo)
    p11h, p11l = umul32_wide(x.hi, y.hi)
    # Column at bit 32: p00h + p01l + p10l, carries feed bit 64.
    c32a, k1 = add32_carry(p00h, p01l)
    c32, k2 = add32_carry(c32a, p10l)
    # Column at bit 64: p01h + p10h + p11l + carries (sum < 3*2^32 + 2: needs
    # its own carries into bit 96).
    c64a, k3 = add32_carry(p01h, p10h)
    c64b, k4 = add32_carry(c64a, p11l)
    c64, k5 = add32_carry(c64b, k1 + k2)  # k1+k2 <= 2, no overflow
    # Column at bit 96
    c96 = p11h + k3 + k4 + k5
    return U128(hi=U64(c96, c64), lo=U64(c32, p00l))


def mullo64(x: U64, y: U64) -> U64:
    """(x * y) mod 2^64 — cheaper than the full product.

    The low half comes from the native wrapping u32 multiply (1 op)
    rather than the 16-bit partial-product assembly (3 ops); the high
    half still needs the exact carry of x.lo*y.lo, i.e. its wide hi."""
    p00h, _ = umul32_wide(x.lo, y.lo)
    hi = p00h + x.lo * y.hi + x.hi * y.lo
    return U64(hi, x.lo * y.lo)


def mulhi64(x: U64, y: U64) -> U64:
    """High 64 bits of the 128-bit product."""
    return mul64_wide(x, y).hi


def hi32_approx(a, b) -> jnp.ndarray:
    """~high 32 bits of the 32x32 product a*b, error in [0, 2].

    Drops the carry of the middle 16-bit column (the `mid >> 16` term of
    umul32_wide, which is at most 2), so the result is the true high half
    minus 0, 1 or 2. 3 lane multiplies instead of 4 and no low-half
    assembly — the building block of mulhi64_approx6."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    return a1 * b1 + ((a0 * b1) >> 16) + ((a1 * b0) >> 16)


def mulhi64_approx6(x: U64, y: U64) -> U64:
    """floor(x*y / 2^64) - e with e in [0, 6] — the lean quotient mulhi.

    Drops, relative to the exact mulhi64:
      * the whole bit-32 column (p00.hi + p01.lo + p10.lo): its carry into
        bit 64 is at most 2;
      * the middle-column carries inside the two cross partials (via
        hi32_approx): at most 2 each.
    Every dropped term is nonnegative, so the computed quotient is <= the
    true one; a Shoup product using it lands in [0, (2+6)q) and needs a
    4q then 2q conditional-subtract chain (valid for q < 2^61 so 8q fits
    in 64 bits). 10 lane multiplies vs mulhi64's 16 and ~30 fewer
    assembly ops — measured +19% butterfly throughput on v5e over the
    e<=1 mulhi64_approx."""
    p01h = hi32_approx(x.lo, y.hi)
    p10h = hi32_approx(x.hi, y.lo)
    p11h, p11l = umul32_wide(x.hi, y.hi)
    s, k1 = add32_carry(p01h, p10h)
    c64, k2 = add32_carry(s, p11l)
    return U64(p11h + k1 + k2, c64)


def mulhi64_approx2(x: U64, y: U64) -> U64:
    """floor(x*y / 2^64) - e with e in [0, 2].

    Drops exactly the bit-32 column (p00.hi + p01.lo + p10.lo, whose
    carry into bit 64 is at most 2) but keeps the cross-partial high
    halves exact: 12 lane multiplies vs mulhi64's 16 and approx6's 10.
    The tighter error bound buys butterflies a whole conditional
    subtract relative to e<=6 (raw Shoup range [0,4q) instead of
    [0,8q)); whether +2 multiplies for -1 halver wins is
    toolchain-dependent — see benchmarks/butterfly_variants_ab.py."""
    p01h = umul32_hi(x.lo, y.hi)
    p10h = umul32_hi(x.hi, y.lo)
    p11h, p11l = umul32_wide(x.hi, y.hi)
    s, k1 = add32_carry(p01h, p10h)
    c64, k2 = add32_carry(s, p11l)
    return U64(p11h + k1 + k2, c64)


def mulhi64_approx(x: U64, y: U64) -> U64:
    """High 64 bits of x*y, possibly 1 too small (error <= 1).

    Drops the lo*lo partial product (whose only effect on the high half is
    a carry of at most 1), saving 4 of the 16 lane multiplies. The caller
    must absorb the +q slack this injects into a Shoup product — see
    shoup_mul_lazy_approx. (Same trick as the reference's
    _mm512_hexl_mulhi_approx_epi, avx512-util.hpp:153-185.)
    """
    p01h, p01l = umul32_wide(x.lo, y.hi)
    p10h, p10l = umul32_wide(x.hi, y.lo)
    p11h, p11l = umul32_wide(x.hi, y.hi)
    c32, k12 = add32_carry(p01l, p10l)
    del c32  # only its carry feeds the high half
    c64a, k3 = add32_carry(p01h, p10h)
    c64b, k4 = add32_carry(c64a, p11l)
    c64, k5 = add32_carry(c64b, k12)
    c96 = p11h + k3 + k4 + k5
    return U64(c96, c64)


def shoup_mul_lazy_approx(x: U64, w: U64, w_precon: U64, modulus: int,
                          two_q: U64) -> U64:
    """Shoup multiply via approximate mulhi; output in [0, 2q).

    q_hat may be 1 too small, putting the raw result in [0, 3q); one
    conditional subtract of 2q restores the lazy range. Values agree with
    the exact form mod q but not bit-for-bit in the lazy range (matching
    the reference's AVX512-64 path semantics)."""
    q_hat = mulhi64_approx(x, w_precon)
    q = const64(modulus)
    r = sub64(mullo64(x, w), mullo64(q_hat, q))
    return cond_sub64_half(r, two_q)  # r < 3q < 2*(2q): halver contract


def add128(x: U128, y: U128) -> U128:
    """(x + y) mod 2^128 — for lazy key-switch accumulation."""
    lo_lo, c0 = add32_carry(x.lo.lo, y.lo.lo)
    lo_hi_a, c1 = add32_carry(x.lo.hi, y.lo.hi)
    lo_hi, c2 = add32_carry(lo_hi_a, c0)
    hi_lo_a, c3 = add32_carry(x.hi.lo, y.hi.lo)
    hi_lo, c4 = add32_carry(hi_lo_a, c1 + c2)
    hi_hi = x.hi.hi + y.hi.hi + c3 + c4
    return U128(hi=U64(hi_hi, hi_lo), lo=U64(lo_hi, lo_lo))


def shr128_to64(x: U128, s: int) -> U64:
    """(x >> s) truncated to 64 bits, static s in [0, 128)."""
    if s == 0:
        return x.lo
    if s < 64:
        a = shr64(x.lo, s)
        b = shl64(x.hi, 64 - s)
        return U64(a.hi | b.hi, a.lo | b.lo)
    if s == 64:
        return x.hi
    return shr64(x.hi, s - 64)


# ---------------------------------------------------------------------------
# Modular primitives (the Shoup / Barrett vocabulary)
# ---------------------------------------------------------------------------

def shoup_mul_lazy(x: U64, w: U64, w_precon: U64, modulus: int) -> U64:
    """(x * w) mod q with output in [0, 2q): Harvey/Shoup multiplication.

    w_precon = floor(w << 64 / q); requires w < q. The 64-bit wraparound of
    x*w - q_hat*q is exact because the true value lies in [0, 2q).
    """
    q_hat = mulhi64(x, w_precon)
    q = const64(modulus)
    return sub64(mullo64(x, w), mullo64(q_hat, q))


def barrett_reduce_u64(x: U64, modulus: int, q_barr: int,
                       output_mod_factor: int = 1) -> U64:
    """x mod q via q_barr = floor(2^64/q); OMF=2 leaves result in [0,2q)."""
    q_hat = mulhi64(x, const64(q_barr))
    r = sub64(x, mullo64(q_hat, const64(modulus)))
    if output_mod_factor == 1:
        r = cond_sub64_half(r, const64(modulus))  # r < 2q
    return r


def barrett_reduce_u64_approx(x: U64, modulus: int, q_barr: int,
                              output_mod_factor: int = 1) -> U64:
    """barrett_reduce_u64 with the quotient mulhi approximated.

    The <=1 quotient error widens the raw range from [0,2q) to [0,3q)
    (exact mod 2^64 while q < 2^62); one extra conditional subtract of 2q
    restores the OMF=2 contract. Agrees with barrett_reduce_u64 mod q.
    """
    q_hat = mulhi64_approx(x, const64(q_barr))
    r = sub64(x, mullo64(q_hat, const64(modulus)))
    r = cond_sub64_half(r, const64(2 * modulus))  # r < 3q < 4q
    if output_mod_factor == 1:
        r = cond_sub64_half(r, const64(modulus))
    return r


def mult_mod_barrett(x: U64, y: U64, modulus: int) -> U64:
    """(x * y) mod q for x, y in [0, q), q < 2^62, output in [0, q).

    Generalized Barrett with beta=-2, alpha=62 (single mulhi quotient):
      n   = bits(q); mu = floor(2^(n+62) / q)
      c1  = floor(x*y / 2^(n-2))        (fits in 64 bits)
      qh  = floor(c1 * mu / 2^64)
      Z   = (x*y - qh*q) mod 2^64       in [0, 2q)
    (behavioral reference: hexl/eltwise/eltwise-mult-mod-internal.hpp.)
    """
    n_bits = modulus.bit_length()
    if modulus >= (1 << 62):
        raise ValueError("modulus must be < 2^62")
    shift = n_bits - 2
    mu = (1 << (n_bits + 62)) // modulus
    prod = mul64_wide(x, y)
    c1 = shr128_to64(prod, shift)
    q_hat = mulhi64(c1, const64(mu))
    z = sub64(prod.lo, mullo64(q_hat, const64(modulus)))
    return cond_sub64_half(z, const64(modulus))  # z < 2q


def mult_mod_barrett_approx(x: U64, y: U64, modulus: int) -> U64:
    """mult_mod_barrett with the quotient mulhi approximated (4 fewer
    lane multiplies of the 38 the exact form issues).

    q_hat may be 1 too small, widening the pre-reduction range from
    [0,2q) to [0,3q) — still exact mod 2^64 for q < 2^62 — absorbed by
    one extra conditional subtract. Agrees with mult_mod_barrett mod q.
    (Same approx-mulhi trade as the reference's AVX512-64 kernels,
    avx512-util.hpp:153-185.)
    """
    n_bits = modulus.bit_length()
    if modulus >= (1 << 62):
        raise ValueError("modulus must be < 2^62")
    shift = n_bits - 2
    mu = (1 << (n_bits + 62)) // modulus
    prod = mul64_wide(x, y)
    c1 = shr128_to64(prod, shift)
    q_hat = mulhi64_approx(c1, const64(mu))
    z = sub64(prod.lo, mullo64(q_hat, const64(modulus)))
    z = cond_sub64_half(z, const64(2 * modulus))  # z < 3q < 4q
    return cond_sub64_half(z, const64(modulus))


def mult_mod_barrett_traced(x: U64, y: U64, q: U64, two_q: U64, mu: U64,
                            shift: int, approx: bool) -> U64:
    """mult_mod_barrett(_approx) with the modulus constants as traced,
    broadcastable operands (q, 2q, mu = floor(2^(bits(q)+62)/q)).

    `shift` = bits(q) - 2 is static, so one compiled body serves every
    modulus of a given bit width — the lever that lets RNS composites
    (dyadic multiply) run their whole modulus stack as ONE (M, n) kernel
    instead of M unrolled (n,) kernels. Same math and lazy ranges as the
    static-constant forms above; bit-identical outputs."""
    prod = mul64_wide(x, y)
    c1 = shr128_to64(prod, shift)
    if approx:
        q_hat = mulhi64_approx(c1, mu)
        z = sub64(prod.lo, mullo64(q_hat, q))
        z = cond_sub64_half(z, two_q)  # z < 3q < 4q
    else:
        q_hat = mulhi64(c1, mu)
        z = sub64(prod.lo, mullo64(q_hat, q))  # z < 2q
    return cond_sub64_half(z, q)


def add_mod_traced(a: U64, b: U64, q: U64) -> U64:
    """(a + b) mod q for inputs in [0, q), q as a traced operand."""
    return cond_sub64_half(add64(a, b), q)


def montgomery_reduce_u128(t: U128, modulus: int, r: int, inv_mod: int) -> U64:
    """REDC: t * R^-1 mod q for R = 2^r (r == 64 here), t in [0, R*q).

    inv_mod satisfies q*inv_mod ≡ -1 mod R. Output in [0, q).
    """
    if r != 64:
        raise NotImplementedError("limb REDC currently supports r == 64")
    m = mullo64(t.lo, const64(inv_mod))
    mq = mul64_wide(m, const64(modulus))
    # t + m*q is divisible by 2^64; result is the high half plus carry.
    lo_sum = add64(t.lo, mq.lo)
    carry = lt64(lo_sum, t.lo).astype(_U32)
    s = add64(t.hi, mq.hi)
    s = add64_small(s, carry)
    return cond_sub64_half(s, const64(modulus))  # s < 2q


def coerce_limbs(x):
    """Coerce one operand to U64 limb form: (U64, was_host).

    Multi-operand public ops must coerce EACH operand independently so
    host numpy and device-resident U64 arguments can be mixed; results
    return to numpy iff any input came from the host.
    """
    if isinstance(x, U64):
        return x, False
    return to_limbs(np.asarray(x, dtype=np.uint64)), True
