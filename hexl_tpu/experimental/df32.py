"""Double-float (2x float32) arithmetic for the FFT-like transform on TPU.

The reference's FFT-like runs in complex<double> (fft-like-native.cpp);
TPU has no native f64 vector datapath, so a single complex64 transform
carries only a 24-bit mantissa. This module implements error-free
Dekker/Knuth double-float arithmetic on pairs of f32 planes — ~48
effective mantissa bits — used by FFTLike when the backend lacks f64.

All error-free transforms avoid FMA (TPU XLA may or may not contract);
two_prod uses the Dekker 12-bit split, which is exact in pure IEEE f32
multiply/add. Reference precision model: CheckClose tolerance testing
(test/experimental/fft-like/test-fft-like.cpp).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_SPLITTER = np.float32(4097.0)  # 2^12 + 1


class DF(NamedTuple):
    """hi + lo with |lo| <= ulp(hi)/2 (non-overlapping double-float)."""
    hi: jnp.ndarray
    lo: jnp.ndarray


class CDF(NamedTuple):
    """Complex double-float."""
    re: DF
    im: DF


def df_from_f64(x) -> DF:
    """Host conversion: split float64 into two non-overlapping f32."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def df_to_f64(x: DF) -> np.ndarray:
    return np.asarray(x.hi, dtype=np.float64) + \
        np.asarray(x.lo, dtype=np.float64)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _norm(s, e) -> DF:
    hi = s + e
    return DF(hi, e - (hi - s))


def df_add(x: DF, y: DF) -> DF:
    s, e = _two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return _norm(s, e)


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_mul(x: DF, y: DF) -> DF:
    p, e = _two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return _norm(p, e)


def df_scale(x: DF, s: DF) -> DF:
    return df_mul(x, s)


def cdf_add(x: CDF, y: CDF) -> CDF:
    return CDF(df_add(x.re, y.re), df_add(x.im, y.im))


def cdf_sub(x: CDF, y: CDF) -> CDF:
    return CDF(df_sub(x.re, y.re), df_sub(x.im, y.im))


def cdf_scale(x: CDF, s: DF) -> CDF:
    """Multiply a complex double-float by a real double-float."""
    return CDF(df_mul(x.re, s), df_mul(x.im, s))


def cdf_mul(x: CDF, y: CDF) -> CDF:
    re = df_sub(df_mul(x.re, y.re), df_mul(x.im, y.im))
    im = df_add(df_mul(x.re, y.im), df_mul(x.im, y.re))
    return CDF(re, im)


class WS(NamedTuple):
    """DF with the Dekker split of `hi` precomputed (shi + slo == hi).

    The split (3 ops) is exact in f32, so precomputing it — once per
    twiddle-table slice instead of once per butterfly product — changes
    no results, only op count. Used by the FFT-like stage loops where
    one (m, 1) twiddle slice multiplies a whole (batch, m, gap) block.
    """
    hi: jnp.ndarray
    lo: jnp.ndarray
    shi: jnp.ndarray
    slo: jnp.ndarray


class CWS(NamedTuple):
    """Complex WS (presplit twiddle)."""
    re: WS
    im: WS


def df_presplit(x: DF) -> WS:
    shi, slo = _split(x.hi)
    return WS(x.hi, x.lo, shi, slo)


def cdf_presplit(x: CDF) -> CWS:
    return CWS(df_presplit(x.re), df_presplit(x.im))


def _mul_ps(x: DF, x_shi, x_slo, w: WS):
    """x*w with both splits in hand; UNNORMALIZED (hi, err) pair."""
    p = x.hi * w.hi
    e = ((x_shi * w.shi - p) + x_shi * w.slo + x_slo * w.shi) \
        + x_slo * w.slo
    return p, e + (x.hi * w.lo + x.lo * w.hi)


def cdf_mul_ps(x: CDF, w: CWS) -> CDF:
    """x*w with w's splits precomputed and x's shared across the four
    real products; partial products stay unnormalized until the final
    combine. Error stays within ~1 ulp of cdf_mul (the sums it skips
    renormalizing are exact two_sum outputs)."""
    xr_shi, xr_slo = _split(x.re.hi)
    xi_shi, xi_slo = _split(x.im.hi)
    prr, err = _mul_ps(x.re, xr_shi, xr_slo, w.re)
    pii, eii = _mul_ps(x.im, xi_shi, xi_slo, w.im)
    pri, eri = _mul_ps(x.re, xr_shi, xr_slo, w.im)
    pir, eir = _mul_ps(x.im, xi_shi, xi_slo, w.re)
    sr, er = _two_sum(prr, -pii)
    si, ei = _two_sum(pri, pir)
    return CDF(_norm(sr, er + (err - eii)),
               _norm(si, ei + (eri + eir)))


def cdf_from_complex128(x) -> CDF:
    x = np.asarray(x, dtype=np.complex128)
    return CDF(df_from_f64(x.real), df_from_f64(x.imag))


def cdf_to_complex128(x: CDF) -> np.ndarray:
    return df_to_f64(x.re) + 1j * df_to_f64(x.im)
