"""Example app: one mini-program per public op (parity with the reference's
example/example.cpp:146-157), plus the end-to-end RNS poly-mult pipeline.

Run:  python examples/example.py          (uses the attached backend)
      JAX_PLATFORMS=cpu python examples/example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hexl_tpu import nt, ref
from hexl_tpu.eltwise import (eltwise_add_mod, eltwise_cmp_add,
                              eltwise_cmp_sub_mod, eltwise_fma_mod,
                              eltwise_mult_mod, eltwise_reduce_mod,
                              eltwise_sub_mod)
from hexl_tpu.ntt import NTT


def check_equal(got, expected, what):
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(expected, dtype=np.uint64))
    print(f"Done running {what}")


def example_add_mod():
    q = 10
    # q=10 isn't prime — eltwise ops only need q > 1, like the reference.
    a = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.uint64)
    b = np.array([1, 3, 5, 7, 9, 2, 4, 6], dtype=np.uint64)
    check_equal(eltwise_add_mod(a, b, q), (a + b) % q, "ExampleAddMod")


def example_add_mod_scalar():
    q = 10
    a = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.uint64)
    check_equal(eltwise_add_mod(a, 3, q), (a + 3) % q,
                "ExampleAddModScalar")


def example_sub_mod():
    q = 10
    a = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.uint64)
    b = np.array([1, 3, 5, 7, 2, 2, 2, 2], dtype=np.uint64)
    check_equal(eltwise_sub_mod(a, b, q), (a.astype(int) - b) % q,
                "ExampleSubMod")


def example_cmp_add():
    a = np.arange(1, 9, dtype=np.uint64)
    out = eltwise_cmp_add(a, "true", 0, 10)
    check_equal(out, a + 10, "ExampleCmpAdd")


def example_cmp_sub_mod():
    q = 10
    a = np.arange(1, 9, dtype=np.uint64)
    exp = ref.eltwise_cmp_sub_mod(a, q, "nle", 4, 5)
    check_equal(eltwise_cmp_sub_mod(a, q, "nle", 4, 5), exp,
                "ExampleCmpSubMod")


def example_fma_mod():
    q = 101
    a = np.arange(1, 9, dtype=np.uint64)
    c = np.arange(9, 17, dtype=np.uint64)
    check_equal(eltwise_fma_mod(a, 3, c, q, 1), (a * 3 + c) % q,
                "ExampleFMAMod")


def example_mult_mod():
    q = 769
    a = np.arange(1, 9, dtype=np.uint64)
    b = np.arange(11, 19, dtype=np.uint64)
    check_equal(eltwise_mult_mod(a, b, q, 1), (a * b) % q,
                "ExampleMultMod")


def example_reduce_mod():
    q = 0xFFFFFFFFFFC0001
    a = np.array([q + 1, 2 * q + 2, 3 * q + 3, 0, 5, q - 1], dtype=np.uint64)
    check_equal(eltwise_reduce_mod(a, q, q, 1), a % np.uint64(q),
                "ExampleReduceMod")


def example_ntt():
    n = 4096
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    y = ntt.forward(x, 1, 1)
    back = ntt.inverse(y, 1, 1)
    check_equal(back, x, "ExampleNTT (roundtrip)")


def example_poly_mult_pipeline():
    """RNS polynomial multiply: per-prime FwdNTT -> mult-mod -> InvNTT."""
    n = 4096
    num_primes = 4
    primes = nt.generate_primes(num_primes, 45, True, ntt_size=n)
    rng = np.random.default_rng(1)
    a = rng.integers(0, min(primes), size=n, dtype=np.uint64)
    b = rng.integers(0, min(primes), size=n, dtype=np.uint64)
    for q in primes:
        ntt = NTT(n, q)
        fa = ntt.forward(a % np.uint64(q), 1, 1)
        fb = ntt.forward(b % np.uint64(q), 1, 1)
        c = ntt.inverse(eltwise_mult_mod(fa, fb, q), 1, 1)
        assert c.shape == (n,)
    print("Done running ExamplePolyMultPipeline "
          f"({num_primes} primes x N={n})")


def example_rns_ntt():
    """Stacked multi-modulus NTT: one fused transform over an RNS basis."""
    from hexl_tpu.ntt import RnsNTT
    n, k = 4096, 3
    moduli = nt.generate_primes(k, 45, True, ntt_size=n)
    rns = RnsNTT(n, moduli)
    rng = np.random.default_rng(5)
    x = np.stack([rng.integers(0, q, n, np.uint64) for q in moduli])
    back = rns.inverse(rns.forward(x))
    np.testing.assert_array_equal(np.asarray(back), x)
    print(f"Done running ExampleRnsNTT ({k} primes stacked, N={n})")


def example_fft_like():
    """CKKS-style encode/decode with the FFT-like transform."""
    from hexl_tpu.experimental import FFTLike
    n, scale = 1024, 2.0 ** 40
    fft = FFTLike(n, scale)
    rng = np.random.default_rng(2)
    x = rng.normal(size=n) + 1j * rng.normal(size=n)
    dec = np.asarray(fft.forward(np.asarray(fft.inverse(x))))
    rel = np.max(np.abs(dec - x)) / np.max(np.abs(x))
    assert rel < 1e-5, rel  # ~1e-15 on f64/double-float paths
    print(f"Done running ExampleFFTLike (precision={fft.precision}, "
          f"roundtrip rel err {rel:.1e})")


def example_dyadic_multiply():
    """BFV/CKKS ciphertext x ciphertext in NTT form over an RNS basis."""
    from hexl_tpu.experimental import dyadic_multiply
    n, M = 1024, 2
    moduli = nt.generate_primes(M, 40, True, ntt_size=n)
    rng = np.random.default_rng(3)
    x = np.stack([np.stack([rng.integers(0, q, n, np.uint64)
                            for q in moduli]) for _ in range(2)])
    y = np.stack([np.stack([rng.integers(0, q, n, np.uint64)
                            for q in moduli]) for _ in range(2)])
    out = dyadic_multiply(x, y, moduli)
    assert out.shape == (3, M, n)
    print("Done running ExampleDyadicMultiply")


def example_key_switch():
    """CKKS key switch at a small config (reference: example has no
    key-switch program; this demos the deepest composite pipeline —
    stacked inverse/forward NTT groups, 128-bit lazy accumulation,
    mod-down with the +qk/2 trick)."""
    from hexl_tpu.experimental import key_switch

    n, ds, kc = 1 << 10, 2, 2
    kms = rns = ds + 1
    moduli = nt.generate_primes(kms, 40, True, ntt_size=n)
    qk = moduli[-1]
    rng = np.random.default_rng(5)
    t_target = np.stack([rng.integers(0, q, n, np.uint64)
                         for q in moduli[:ds]])
    keys = rng.integers(0, min(moduli), size=(ds, kc, kms, n),
                        dtype=np.uint64)
    for j in range(ds):
        for k in range(kc):
            for m_i, q in enumerate(moduli):
                keys[j, k, m_i] %= np.uint64(q)
    msf = [nt.inverse_mod(qk % q, q) for q in moduli[:ds]]
    result = np.stack([np.stack([rng.integers(0, q, n, np.uint64)
                                 for q in moduli[:ds]])
                       for _ in range(kc)])
    out = np.asarray(key_switch(result, t_target, n, ds, kms, rns, kc,
                                moduli, keys, msf))
    for k in range(kc):
        for j in range(ds):
            assert out[k, j].max() < moduli[j], "output not reduced"
    print(f"Done running ExampleKeySwitch (n={n}, ds={ds}, kc={kc})")


def example_large_degree():
    """Hierarchical two-kernel path for degrees above the VMEM ceiling."""
    n = 1 << 15
    q = nt.generate_primes(1, 60, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(4)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    back = ntt.inverse(ntt.forward(x))
    np.testing.assert_array_equal(np.asarray(back), x)
    print(f"Done running ExampleLargeDegree (N=2^15)")


if __name__ == "__main__":
    example_add_mod()
    example_add_mod_scalar()
    example_sub_mod()
    example_cmp_add()
    example_cmp_sub_mod()
    example_fma_mod()
    example_mult_mod()
    example_reduce_mod()
    example_ntt()
    example_poly_mult_pipeline()
    example_rns_ntt()
    example_fft_like()
    example_dyadic_multiply()
    example_key_switch()
    example_large_degree()
    print("All examples passed.")
