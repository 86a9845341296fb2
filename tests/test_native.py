"""Native host library parity tests (C++ vs pure Python)."""

import numpy as np
import pytest

from hexl_tpu import native, nt, ref

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_is_prime_parity():
    vals = [2, 3, 4, 97, 1024, 281474976710897, 0xFFFFFFFFFFC0001,
            (1 << 61) - 1, (1 << 61) - 2, 4194353]
    def py_is_prime(n):
        # Inline pure-Python Miller-Rabin (bypasses the native hook).
        if n < 2:
            return False
        for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            if n == a:
                return True
            if n % a == 0:
                return False
        dd = n - 1
        rr = 0
        while dd % 2 == 0:
            dd //= 2
            rr += 1
        for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            x = pow(a, dd, n)
            if x in (1, n - 1):
                continue
            for _ in range(rr - 1):
                x = pow(x, 2, n)
                if x == n - 1:
                    break
            else:
                return False
        return True

    for v in vals:
        assert native.is_prime(v) == py_is_prime(v), v


def test_generate_primes_parity():
    got = native.generate_primes(5, 45, True, 4096)
    assert got is not None
    for q in got:
        assert nt.is_prime(q) and q % 8192 == 1
    assert got == sorted(got)
    down = native.generate_primes(3, 50, False, 1 << 14)
    assert down == sorted(down, reverse=True)


def test_minimal_root_parity():
    q = 0xFFFFFFFFFFC0001
    assert native.minimal_primitive_root(4, q) == 288794978602139552
    for n, qq in [(8, 4194353), (64, 769)]:
        w = native.minimal_primitive_root(2 * n, qq)
        assert nt.is_primitive_root(w, 2 * n, qq)


def test_root_tables_parity():
    n, q = 256, nt.generate_primes(1, 45, True, ntt_size=256)[0]
    w = nt.minimal_primitive_root(2 * n, q)
    rop, irop, prop, pirop = native.root_tables(n, q, w)
    rop_py, irop_py, _ = ref.root_of_unity_powers(n, q, w)
    np.testing.assert_array_equal(rop, rop_py)
    np.testing.assert_array_equal(irop, irop_py)
    np.testing.assert_array_equal(prop, ref.precon64(rop_py, q))
    np.testing.assert_array_equal(pirop, ref.precon64(irop_py, q))
