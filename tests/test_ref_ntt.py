"""Oracle NTT tests: golden vectors ported from reference test-ntt.cpp."""

import numpy as np
import pytest

from hexl_tpu import nt, ref

# (degree, modulus, input, expected) — ported verbatim from the reference
# GTest suite (test/test-ntt.cpp:357-404, INSTANTIATE_TEST_SUITE_P).
GOLDEN = [
    (2, 281474976710897, [0, 0], [0, 0]),
    (2, 0xFFFFFFFFFFC0001, [0, 0], [0, 0]),
    (2, 281474976710897, [1, 0], [1, 1]),
    (2, 281474976710897, [1, 1], [19842761023586, 261632215687313]),
    (2, 0xFFFFFFFFFFC0001, [1, 1],
     [288794978602139553, 864126526004445282]),
    (4, 113, [94, 109, 11, 18], [82, 2, 81, 98]),
    (4, 281474976710897,
     [281474976710765, 49, 281474976710643, 275],
     [12006376116355, 216492038983166, 272441922811203, 62009615510542]),
    (4, 113, [59, 50, 98, 50], [1, 2, 3, 4]),
    (4, 73, [2, 1, 1, 1], [17, 41, 36, 60]),
    (4, 16417, [31, 21, 15, 34], [1611, 14407, 14082, 2858]),
    (4, 4194353, [4127, 9647, 1987, 5410],
     [1478161, 3359347, 222964, 3344742]),
    (8, 4194353, [1, 0, 0, 0, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1]),
    (8, 4194353, [1, 1, 0, 0, 0, 0, 0, 0],
     [132171, 4062184, 2675172, 1519183, 462763, 3731592, 1824324, 2370031]),
    (32, 769,
     [401, 203, 221, 352, 487, 151, 405, 356, 343, 424, 635, 757, 457, 280,
      624, 353, 496, 353, 624, 280, 457, 757, 635, 424, 343, 356, 405, 151,
      487, 352, 221, 203],
     list(range(1, 33))),
]


def _tables(n, q):
    rop, irop, _ = ref.root_of_unity_powers(n, q)
    return rop, ref.precon64(rop, q), irop, ref.precon64(irop, q)


def test_powers_pinned():
    # Reference TEST(NTT, Powers): exact twiddle values for q=2^60-2^18+1.
    q = 0xFFFFFFFFFFC0001
    rop2, _, _ = ref.root_of_unity_powers(2, q)
    assert rop2[0] == 1
    assert rop2[1] == 288794978602139552
    rop4, _, _ = ref.root_of_unity_powers(4, q)
    assert list(rop4[:4]) == [1, 288794978602139552, 178930308976060547,
                              748001537669050592]


@pytest.mark.parametrize("n,q,inp,expected", GOLDEN)
def test_golden_forward(n, q, inp, expected):
    rop, prop, irop, pirop = _tables(n, q)
    x = np.array(inp, dtype=np.uint64)
    # Lazy radix-2 path, IMF=1 OMF=1
    out = ref.fwd_ntt_radix2(x, q, rop, prop, 1, 1)
    np.testing.assert_array_equal(out, np.array(expected, dtype=np.uint64))
    # Lazy path IMF=2 OMF=4, reduced mod q afterwards
    out4 = ref.fwd_ntt_radix2(x, q, rop, prop, 2, 4)
    np.testing.assert_array_equal(out4 % np.uint64(q),
                                  np.array(expected, dtype=np.uint64))
    assert np.all(out4 < np.uint64(4 * q))
    # Textbook reference path
    out_ref = ref.reference_fwd_ntt(x, q, rop)
    np.testing.assert_array_equal(out_ref,
                                  np.array(expected, dtype=np.uint64))


@pytest.mark.parametrize("n,q,inp,expected", GOLDEN)
def test_golden_roundtrip(n, q, inp, expected):
    rop, prop, irop, pirop = _tables(n, q)
    x = np.array(inp, dtype=np.uint64)
    fwd = ref.fwd_ntt_radix2(x, q, rop, prop, 1, 1)
    back = ref.inv_ntt_radix2(fwd, q, irop, pirop, 1, 1)
    np.testing.assert_array_equal(back, x)
    # Textbook inverse also round-trips
    back_ref = ref.reference_inv_ntt(ref.reference_fwd_ntt(x, q, rop), q,
                                     irop)
    np.testing.assert_array_equal(back_ref, x)


@pytest.mark.parametrize("log_n", [1, 2, 3, 5, 7, 9, 11])
@pytest.mark.parametrize("q_bits", [27, 30, 48, 58, 60])
def test_random_cross_impl(log_n, q_bits):
    n = 1 << log_n
    if q_bits <= nt.log2_exact(n):
        pytest.skip("modulus too small for degree")
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    rop, prop, irop, pirop = _tables(n, q)
    rng = np.random.default_rng(log_n * 1000 + q_bits)
    x = rng.integers(0, q, size=n, dtype=np.uint64)

    expected = ref.reference_fwd_ntt(x, q, rop)
    for imf in (1, 2, 4):
        for omf in (1, 4):
            out = ref.fwd_ntt_radix2(x, q, rop, prop, imf, omf)
            np.testing.assert_array_equal(out % np.uint64(q), expected)
            bound = q if omf == 1 else 4 * q
            assert np.all(out < np.uint64(bound))

    for imf in (1, 2):
        for omf in (1, 2):
            inv = ref.inv_ntt_radix2(expected, q, irop, pirop, imf, omf)
            np.testing.assert_array_equal(inv % np.uint64(q), x)
            bound = q if omf == 1 else 2 * q
            assert np.all(inv < np.uint64(bound))


def test_lazy_input_ranges():
    # Inputs in [0, 4q) for the forward transform must give identical
    # results mod q.
    n, q_bits = 64, 50
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    rop, prop, irop, pirop = _tables(n, q)
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    x4 = x + np.uint64(q) * rng.integers(0, 4, size=n, dtype=np.uint64)
    expected = ref.reference_fwd_ntt(x, q, rop)
    out = ref.fwd_ntt_radix2(x4, q, rop, prop, 4, 1)
    np.testing.assert_array_equal(out, expected)

    # Inverse with inputs in [0, 2q)
    y = expected
    y2 = y + np.uint64(q) * rng.integers(0, 2, size=n, dtype=np.uint64)
    inv = ref.inv_ntt_radix2(y2, q, irop, pirop, 2, 1)
    np.testing.assert_array_equal(inv, x)


@pytest.mark.parametrize("log_n", [1, 2, 3, 4, 5, 6, 7, 9])
@pytest.mark.parametrize("q_bits", [30, 50, 60])
def test_radix4_matches_radix2(log_n, q_bits):
    """Radix-4 decomposition is bit-identical to radix-2 (incl. lazy
    ranges) — mirrors the reference's radix-2 vs radix-4 cross tests
    (test/test-ntt.cpp:231-355)."""
    n = 1 << log_n
    if q_bits <= nt.log2_exact(n):
        pytest.skip("modulus too small for degree")
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    rop, prop, irop, pirop = _tables(n, q)
    rng = np.random.default_rng(log_n * 77 + q_bits)
    x = rng.integers(0, q, size=n, dtype=np.uint64)

    for imf in (1, 2, 4):
        for omf in (1, 4):
            r2 = ref.fwd_ntt_radix2(x, q, rop, prop, imf, omf)
            r4 = ref.fwd_ntt_radix4(x, q, rop, prop, imf, omf)
            np.testing.assert_array_equal(r4, r2)

    fwd = ref.fwd_ntt_radix2(x, q, rop, prop, 1, 1)
    for imf in (1, 2):
        for omf in (1, 2):
            r2 = ref.inv_ntt_radix2(fwd, q, irop, pirop, imf, omf)
            r4 = ref.inv_ntt_radix4(fwd, q, irop, pirop, imf, omf)
            np.testing.assert_array_equal(r4, r2)
    # Round trip through radix-4 both ways.
    back = ref.inv_ntt_radix4(ref.fwd_ntt_radix4(x, q, rop, prop, 1, 1),
                              q, irop, pirop, 1, 1)
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("n,q,inp,expected", GOLDEN)
def test_golden_forward_radix4(n, q, inp, expected):
    rop, prop, irop, pirop = _tables(n, q)
    x = np.array(inp, dtype=np.uint64)
    out = ref.fwd_ntt_radix4(x, q, rop, prop, 1, 1)
    np.testing.assert_array_equal(out, np.array(expected, dtype=np.uint64))


def test_negacyclic_convolution_property():
    # NTT-domain pointwise product == negacyclic polynomial product.
    n, q = 16, nt.generate_primes(1, 30, True, ntt_size=16)[0]
    rop, prop, irop, pirop = _tables(n, q)
    rng = np.random.default_rng(7)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    fa = ref.fwd_ntt_radix2(a, q, rop, prop, 1, 1)
    fb = ref.fwd_ntt_radix2(b, q, rop, prop, 1, 1)
    prod = ref.eltwise_mult_mod(fa, fb, q)
    c = ref.inv_ntt_radix2(prod, q, irop, pirop, 1, 1)
    # Schoolbook negacyclic product mod (X^n + 1)
    expected = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = (i + j) % n
            sign = -1 if i + j >= n else 1
            expected[k] = (expected[k] + sign * int(a[i]) * int(b[j])) % q
    np.testing.assert_array_equal(c, expected.astype(np.uint64))
