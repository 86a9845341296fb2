"""FFT-like transform for CKKS encode/decode (complex roots of X^N + 1).

Radix-2 complex transform over the 2N-th complex roots of unity with
bit-reversed twiddle tables and the same scale-fusing behavior as the
reference (hexl/experimental/fft-like/fft-like.cpp:36-134,
fft-like-native.cpp): with a scalar, the forward output is (1/scalar) x
FFT, the inverse is (scalar/N) x unnormalized inverse, so the pair
round-trips.

Precision note: tables are built in float64 on the host; the transform runs
in complex128 on CPU and complex64 on TPU (no native f64 datapath; the
reference's tolerance-based CheckClose testing model applies —
test-fft-like.cpp). A double-float (2x f32) path is a planned upgrade.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config, nt


def _build_tables(n: int):
    """Bit-reversed complex root tables (matches the reference layout)."""
    bits = nt.log2_exact(n)
    k = np.arange(2 * n)
    roots = np.exp(2j * np.pi * k / (2 * n))
    rev = np.array([nt.reverse_bits(i, bits) for i in range(n)])
    fwd = np.zeros(n, dtype=np.complex128)
    fwd[1:] = roots[rev[1:]]
    inv = np.zeros(n, dtype=np.complex128)
    inv[1:] = np.conj(roots[(rev[np.arange(1, n) - 1] + 1)])
    return fwd, inv


def _stage_loop_fwd(x, table, n, scalar):
    m = 1
    gap = n >> 1
    while m < n:
        v = x.reshape(x.shape[:-1] + (m, 2, gap))
        xs = v[..., 0, :]
        ys = v[..., 1, :]
        w = table[m:2 * m][:, None]
        if gap == 1 and scalar is not None:
            w = w * scalar
            xs = xs * scalar
        t = ys * w
        x = jnp.stack([xs + t, xs - t], axis=-2).reshape(x.shape)
        m <<= 1
        gap >>= 1
    return x


def _stage_loop_inv(x, table, n, scalar):
    root_index = 1
    gap = 1
    m = n >> 1
    stop = 0 if scalar is None else 1
    while m > stop:
        v = x.reshape(x.shape[:-1] + (m, 2, gap))
        xs = v[..., 0, :]
        ys = v[..., 1, :]
        w = table[root_index:root_index + m][:, None]
        root_index += m
        x = jnp.stack([xs + ys, (xs - ys) * w], axis=-2).reshape(x.shape)
        m >>= 1
        gap <<= 1
    if stop == 1:
        half = n >> 1
        xs = x[..., :half]
        ys = x[..., half:]
        w = table[root_index] * scalar
        x = jnp.concatenate([(xs + ys) * scalar, (xs - ys) * w], axis=-1)
    return x


class FFTLike:
    """Complex FFT-variant engine for degree-n vectors (n a power of 2)."""

    def __init__(self, degree: int, scalar: float | None = None):
        if not nt.is_power_of_two(degree):
            raise ValueError("degree must be a power of two")
        if degree <= 8:
            raise ValueError("degree should be bigger than 8")
        self.n = degree
        self.scalar = scalar
        self.scale = scalar / degree if scalar is not None else None
        self.inv_scale = 1.0 / scalar if scalar is not None else None
        fwd, inv = _build_tables(degree)
        x64 = bool(jax.config.jax_enable_x64)
        self._ctype = (jnp.complex128
                       if x64 and config.default_backend() != "tpu"
                       else jnp.complex64)
        self.fwd_table = jnp.asarray(fwd, dtype=self._ctype)
        self.inv_table = jnp.asarray(inv, dtype=self._ctype)

    @functools.cached_property
    def _fwd_jit(self):
        n, scal = self.n, self.inv_scale
        table = self.fwd_table
        return jax.jit(lambda x: _stage_loop_fwd(x, table, n, scal))

    @functools.cached_property
    def _inv_jit(self):
        n, scal = self.n, self.scale
        table = self.inv_table
        return jax.jit(lambda x: _stage_loop_inv(x, table, n, scal))

    def forward(self, x):
        """Forward transform to bit-reversed order; x shape (..., n)."""
        return self._fwd_jit(jnp.asarray(x, dtype=self._ctype))

    def inverse(self, x):
        """Inverse transform from bit-reversed order; x shape (..., n)."""
        return self._inv_jit(jnp.asarray(x, dtype=self._ctype))

    def build_floating_points(self, plain, threshold, decryption_modulus,
                              inv_scale):
        """CRT-compose multi-word integers to scaled complex doubles.

        plain: (mod_size, n) uint64 CRT limbs (little-endian words) of the
        composed value; values >= threshold (also mod_size words) are
        interpreted as negative (value - decryption_modulus). Runs on the
        host in float64 (parity with BuildFloatingPointsAVX512,
        fft-like-avx512.cpp).
        """
        plain = np.asarray(plain, dtype=np.uint64)
        mod_size, n = plain.shape
        thr = 0
        dec = 0
        for w in range(mod_size):
            thr |= int(threshold[w]) << (64 * w)
            dec |= int(decryption_modulus[w]) << (64 * w)
        out = np.zeros(n, dtype=np.complex128)
        for i in range(n):
            v = 0
            for w in range(mod_size):
                v |= int(plain[w, i]) << (64 * w)
            if v >= thr:
                v -= dec
            out[i] = float(v) * inv_scale
        return out
