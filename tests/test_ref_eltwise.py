"""Oracle eltwise tests (parity with reference test-eltwise-*.cpp)."""

import numpy as np
import pytest

from hexl_tpu import nt, ref


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_add_mod_vector_and_scalar():
    q = 769
    a = np.array([0, 1, 768, 400, 300], dtype=np.uint64)
    b = np.array([0, 768, 768, 400, 500], dtype=np.uint64)
    out = ref.eltwise_add_mod(a, b, q)
    np.testing.assert_array_equal(
        out, (a.astype(object) + b.astype(object)) % q)
    out_s = ref.eltwise_add_mod(a, 700, q)
    np.testing.assert_array_equal(out_s, (a.astype(object) + 700) % q)


def test_sub_mod_vector_and_scalar():
    q = 769
    a = np.array([0, 1, 768, 400, 300], dtype=np.uint64)
    b = np.array([0, 768, 768, 400, 500], dtype=np.uint64)
    out = ref.eltwise_sub_mod(a, b, q)
    np.testing.assert_array_equal(
        out, (a.astype(object) - b.astype(object)) % q)
    out_s = ref.eltwise_sub_mod(a, 700, q)
    np.testing.assert_array_equal(out_s, (a.astype(object) - 700) % q)


@pytest.mark.parametrize("q_bits", [20, 30, 45, 50, 60, 61])
@pytest.mark.parametrize("imf", [1, 2, 4])
def test_mult_mod_random(q_bits, imf):
    q = nt.generate_primes(1, q_bits, True)[0]
    if imf * q >= (1 << 63):
        pytest.skip("IMF * q out of 63-bit range")
    rng = _rng(q_bits * 10 + imf)
    a = rng.integers(0, imf * q, size=1000, dtype=np.uint64)
    b = rng.integers(0, imf * q, size=1000, dtype=np.uint64)
    out = ref.eltwise_mult_mod(a, b, q, imf)
    exp = (a.astype(object) * b.astype(object)) % q
    np.testing.assert_array_equal(out, exp.astype(np.uint64))


@pytest.mark.parametrize("imf", [1, 2, 4, 8])
@pytest.mark.parametrize("with_arg3", [True, False])
def test_fma_mod(imf, with_arg3):
    q = nt.generate_primes(1, 50, True)[0]
    rng = _rng(imf)
    a1 = rng.integers(0, imf * q, size=512, dtype=np.uint64)
    a2 = int(rng.integers(0, imf * q))
    a3 = rng.integers(0, imf * q, size=512, dtype=np.uint64) \
        if with_arg3 else None
    out = ref.eltwise_fma_mod(a1, a2, a3, q, imf)
    exp = (a1.astype(object) * a2) % q
    if a3 is not None:
        exp = (exp + a3.astype(object)) % q
    np.testing.assert_array_equal(out, exp.astype(np.uint64))


def test_reduce_mod_cases():
    q = nt.generate_primes(1, 40, True)[0]
    rng = _rng(3)
    # Full Barrett from arbitrary uint64 (input_mod_factor == modulus)
    x = rng.integers(0, 1 << 63, size=256, dtype=np.uint64)
    out = ref.eltwise_reduce_mod(x, q, q, 1)
    np.testing.assert_array_equal(out, x % np.uint64(q))
    out2 = ref.eltwise_reduce_mod(x, q, q, 2)
    np.testing.assert_array_equal(out2 % np.uint64(q), x % np.uint64(q))
    assert np.all(out2 < np.uint64(2 * q))
    # IMF=2 -> OMF=1
    x2 = rng.integers(0, 2 * q, size=256, dtype=np.uint64)
    np.testing.assert_array_equal(
        ref.eltwise_reduce_mod(x2, q, 2, 1), x2 % np.uint64(q))
    # IMF=4 -> OMF in {1,2}
    x4 = rng.integers(0, 4 * q, size=256, dtype=np.uint64)
    np.testing.assert_array_equal(
        ref.eltwise_reduce_mod(x4, q, 4, 1), x4 % np.uint64(q))
    o42 = ref.eltwise_reduce_mod(x4, q, 4, 2)
    np.testing.assert_array_equal(o42 % np.uint64(q), x4 % np.uint64(q))
    assert np.all(o42 < np.uint64(2 * q))
    # IMF == OMF: identity copy
    np.testing.assert_array_equal(ref.eltwise_reduce_mod(x2, q, 2, 2), x2)


@pytest.mark.parametrize("cmp", ref.ALL_CMPS)
def test_cmp_add(cmp):
    rng = _rng(11)
    a = rng.integers(0, 1000, size=300, dtype=np.uint64)
    bound, diff = 500, 7777
    out = ref.eltwise_cmp_add(a, cmp, bound, diff)
    mask = ref.compare(cmp, a, bound)
    exp = np.where(mask, a + np.uint64(diff), a)
    np.testing.assert_array_equal(out, exp)


@pytest.mark.parametrize("cmp", ref.ALL_CMPS)
def test_cmp_sub_mod(cmp):
    q = 999983
    rng = _rng(13)
    a = rng.integers(0, 4 * q, size=300, dtype=np.uint64)
    bound, diff = 2 * q, 12345
    out = ref.eltwise_cmp_sub_mod(a, q, cmp, bound, diff)
    mask = ref.compare(cmp, a, bound)
    red = a % np.uint64(q)
    exp = np.where(mask, (red.astype(object) - diff) % q,
                   red.astype(object)).astype(np.uint64)
    np.testing.assert_array_equal(out, exp)
