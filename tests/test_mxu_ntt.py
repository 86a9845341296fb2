"""MXU (matmul four-step) NTT vs the bit-exact host oracle.

Runs on the CPU backend (conftest forces it); bf16 digit matmuls are
exact there too (XLA upcasts to f32, and every integer involved is below
2^24), so outputs must agree with ref.py mod q, and bit-for-bit for
OMF=1 outputs in [0, q).
"""

import numpy as np
import pytest

from hexl_tpu import nt, ref
from hexl_tpu.limb import from_limbs, to_limbs
from hexl_tpu.ntt import mxu_ntt


def _rand(n, q, imf, rng):
    return rng.integers(0, imf * q, size=n, dtype=np.uint64)


def _oracle_tables(n, q, root):
    rop, irop, _ = ref.root_of_unity_powers(n, q, root)
    return rop, ref.precon64(rop, q), irop, ref.precon64(irop, q)


def _oracle_fwd(x, n, q, root, imf=1, omf=1):
    rop, prop, _, _ = _oracle_tables(n, q, root)
    return ref.fwd_ntt_radix2(x, q, rop, prop, imf, omf)


def _oracle_inv(x, n, q, root, imf=1, omf=1):
    _, _, irop, pirop = _oracle_tables(n, q, root)
    return ref.inv_ntt_radix2(x, q, irop, pirop, imf, omf)


CASES = [
    (256, 29),
    (1024, 29),
    (1024, 49),
    (1024, 52),   # regression: q in (2^52, 2^53) overflowed _mulmod_scalar
    (1024, 60),
    (4096, 49),
    (4096, 62),
    (16384, 49),
    (16384, 60),
]


def test_mulmod_scalar_53bit_regression():
    """q in (2^52, 2^53) used to take the uint64 fast path whose
    two-product sum (< 2^12 * q) wraps mod 2^64, silently corrupting
    every weight/twiddle table built for 53-bit moduli."""
    q = nt.generate_primes(1, 52, True, 1024)[0]
    assert (1 << 52) < q < (1 << 53)
    rng = np.random.default_rng(53)
    a = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64)
    for c in (q - 2, q - 1, (q >> 1) + 1):
        got = mxu_ntt._mulmod_scalar(a, c, q)
        want = ((a.astype(object) * (int(c) % q)) % q).astype(np.uint64)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,bits", CASES)
def test_fwd_matches_oracle(n, bits):
    q = nt.generate_primes(1, bits, True, n)[0]
    plan = mxu_ntt.get_mxu_plan(n, q)
    rng = np.random.default_rng(n + bits)
    x = _rand(n, q, 1, rng)
    want = _oracle_fwd(x, n, q, plan.root)
    got = from_limbs(mxu_ntt.fwd_ntt_mxu(to_limbs(x), plan, 1, 1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,bits", [(1024, 49), (4096, 60), (16384, 49)])
def test_fwd_lazy_ranges(n, bits):
    q = nt.generate_primes(1, bits, True, n)[0]
    plan = mxu_ntt.get_mxu_plan(n, q)
    rng = np.random.default_rng(7 * n + bits)
    for imf in (1, 2, 4):
        x = _rand(n, q, imf, rng)
        want = _oracle_fwd(x % q, n, q, plan.root)
        got = from_limbs(mxu_ntt.fwd_ntt_mxu(to_limbs(x), plan, imf, 4))
        assert got.max() < 4 * q
        np.testing.assert_array_equal(got % q, want)


@pytest.mark.parametrize("n,bits", CASES)
def test_inv_matches_oracle(n, bits):
    q = nt.generate_primes(1, bits, True, n)[0]
    plan = mxu_ntt.get_mxu_plan(n, q)
    rng = np.random.default_rng(3 * n + bits)
    xhat = _rand(n, q, 1, rng)
    want = _oracle_inv(xhat, n, q, plan.root)
    got = from_limbs(mxu_ntt.inv_ntt_mxu(to_limbs(xhat), plan, 1, 1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,bits", [(1024, 49), (4096, 62)])
def test_inv_lazy_ranges(n, bits):
    q = nt.generate_primes(1, bits, True, n)[0]
    plan = mxu_ntt.get_mxu_plan(n, q)
    rng = np.random.default_rng(11 * n + bits)
    for imf in (1, 2):
        xhat = _rand(n, q, imf, rng)
        want = _oracle_inv(xhat % q, n, q, plan.root)
        got = from_limbs(mxu_ntt.inv_ntt_mxu(to_limbs(xhat), plan, imf, 2))
        assert got.max() < 2 * q
        np.testing.assert_array_equal(got % q, want)


@pytest.mark.parametrize("n,bits", [(1024, 49), (16384, 60)])
def test_roundtrip_batched(n, bits):
    q = nt.generate_primes(1, bits, True, n)[0]
    plan = mxu_ntt.get_mxu_plan(n, q)
    rng = np.random.default_rng(n * 13 + bits)
    x = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    fwd = from_limbs(mxu_ntt.fwd_ntt_mxu(to_limbs(x), plan, 1, 1))
    back = from_limbs(mxu_ntt.inv_ntt_mxu(to_limbs(fwd), plan, 1, 1))
    np.testing.assert_array_equal(back, x)


def test_pallas_fused_recombine_interpret(monkeypatch):
    """The Pallas fold+twiddle / fold+Barrett kernels (interpret mode on
    CPU) must agree bit-for-bit with the XLA recombination path."""
    import hexl_tpu.config as config
    n, bits = 4096, 49
    q = nt.generate_primes(1, bits, True, n)[0]
    plan = mxu_ntt.get_mxu_plan(n, q)
    rng = np.random.default_rng(31)
    x = rng.integers(0, q, size=(4, n), dtype=np.uint64)
    plain_f = from_limbs(mxu_ntt.fwd_ntt_mxu(to_limbs(x), plan, 1, 1))
    plain_i = from_limbs(mxu_ntt.inv_ntt_mxu(to_limbs(x), plan, 1, 1))
    monkeypatch.setattr(mxu_ntt, "_use_fused_recombine", lambda: True)
    fused_f = from_limbs(mxu_ntt.fwd_ntt_mxu(to_limbs(x), plan, 1, 1))
    fused_i = from_limbs(mxu_ntt.inv_ntt_mxu(to_limbs(x), plan, 1, 1))
    np.testing.assert_array_equal(fused_f, plain_f)
    np.testing.assert_array_equal(fused_i, plain_i)
