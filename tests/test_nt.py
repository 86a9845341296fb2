"""Host number-theory tests (parity with reference test-number-theory.cpp)."""

import pytest

from hexl_tpu import nt


def test_is_power_of_two():
    assert nt.is_power_of_two(1)
    assert nt.is_power_of_two(1024)
    assert not nt.is_power_of_two(0)
    assert not nt.is_power_of_two(1025)


def test_reverse_bits():
    assert nt.reverse_bits(0, 0) == 0
    assert nt.reverse_bits(1, 1) == 1
    assert nt.reverse_bits(1, 4) == 8
    assert nt.reverse_bits(0b1011, 4) == 0b1101
    assert nt.reverse_bits(1, 64) == 1 << 63


def test_inverse_mod():
    for q in (7, 97, 0xFFFFFFFFFFC0001):
        for x in (1, 2, 3, q - 1, 12345 % q or 1):
            inv = nt.inverse_mod(x, q)
            assert (x * inv) % q == 1
    with pytest.raises(ValueError):
        nt.inverse_mod(0, 7)


def test_pow_mod():
    assert nt.pow_mod(2, 10, 1000) == 24
    assert nt.pow_mod(5, 0, 7) == 1


def test_is_prime():
    primes = [2, 3, 5, 7, 13, 97, 281474976710897, 0xFFFFFFFFFFC0001,
              4194353, 769, 113, 73, 16417]
    composites = [0, 1, 4, 9, 1024, 281474976710896,
                  (1 << 61) - 2, 3 * 5 * 7 * 11]
    for p in primes:
        assert nt.is_prime(p), p
    for c in composites:
        assert not nt.is_prime(c), c


def test_generate_primes():
    primes = nt.generate_primes(10, 45, True, ntt_size=4096)
    assert len(primes) == 10
    for q in primes:
        assert nt.is_prime(q)
        assert q % (2 * 4096) == 1
        assert (1 << 45) < q < (1 << 46)
    assert primes == sorted(primes)

    big = nt.generate_primes(2, 60, False, ntt_size=1 << 14)
    assert big[0] > big[1]
    for q in big:
        assert nt.is_prime(q) and q % (1 << 15) == 1


def test_minimal_primitive_root_pinned():
    # Pinned against reference TEST(NTT, Powers): w for N=2 over q=2^60-2^18+1
    # must give root_of_unity_powers[1] == 288794978602139552.
    q = 0xFFFFFFFFFFC0001
    w2 = nt.minimal_primitive_root(4, q)
    assert w2 == 288794978602139552


def test_primitive_root_properties():
    for q, n in [(113, 4), (769, 32), (281474976710897, 8)]:
        w = nt.minimal_primitive_root(2 * n, q)
        assert nt.is_primitive_root(w, 2 * n, q)
        # Minimality: it divides the group; all primitive roots are odd powers
        assert nt.pow_mod(w, 2 * n, q) == 1
        assert nt.pow_mod(w, n, q) == q - 1


def test_barrett_factor():
    q = 769
    assert nt.barrett_factor(1, 64, q) == (1 << 64) // q
    assert nt.barrett_factor(5, 32, q) == (5 << 32) // q
    with pytest.raises(ValueError):
        nt.barrett_factor(q + 1, 64, q)


def test_multiply_mod_lazy():
    q = 0xFFFFFFFFFFC0001
    for x in (0, 1, q - 1, 2 * q - 1, 123456789):
        for y in (1, 2, q - 1, 888888):
            yb = nt.barrett_factor(y, 64, q)
            r = nt.multiply_mod_lazy(x, y, yb, q)
            assert r < 2 * q
            assert r % q == (x * y) % q


def test_barrett_reduce_64():
    q = 999983
    q_barr = nt.barrett_factor(1, 64, q)
    for x in (0, 1, q, 2 * q + 5, (1 << 64) - 1):
        assert nt.barrett_reduce_64(x, q, q_barr) == x % q
        lazy = nt.barrett_reduce_64(x, q, q_barr, output_mod_factor=2)
        assert lazy % q == x % q and lazy < 2 * q


def test_reduce_mod():
    q = 101
    for imf in (1, 2, 4, 8):
        for x in range(0, imf * q, 7):
            assert nt.reduce_mod(x, q, imf) == x % q


def test_hensel_and_montgomery():
    q = 0xFFFFFFFFFFC0001
    r = 64
    inv = nt.hensel_lemma_2adic_root(r, q)
    assert (q * inv + 1) % (1 << r) == 0
    # REDC round-trip: redc(a * R mod q * b * R mod q) == a*b*R mod q
    R = 1 << r
    a, b = 123456789123, 987654321987
    aR = (a * R) % q
    bR = (b * R) % q
    abR = nt.montgomery_reduce(aR * bR, q, r, inv)
    assert abR == (a * b * R) % q
