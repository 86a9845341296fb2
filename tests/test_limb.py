"""Property tests for the uint32-limb arithmetic layer vs exact host math."""

import jax
import numpy as np
import pytest

from hexl_tpu import limb, nt

MASK64 = (1 << 64) - 1


def _rand_u64(rng, n=256, bits=64):
    return rng.integers(0, 1 << bits, size=n, dtype=np.uint64)


def _pairs(seed=0, n=256):
    rng = np.random.default_rng(seed)
    # Include adversarial edge values.
    edges = np.array(
        [0, 1, 2, 0xFFFFFFFF, 0x100000000, 0xFFFFFFFFFFFFFFFF,
         0x8000000000000000, 0x00000001FFFFFFFF, 0xFFFFFFFF00000000],
        dtype=np.uint64)
    a = np.concatenate([edges, _rand_u64(rng, n)])
    b = np.concatenate([edges[::-1], _rand_u64(rng, n)])
    return a, b


def test_roundtrip_limbs():
    a, _ = _pairs()
    np.testing.assert_array_equal(limb.from_limbs(limb.to_limbs(a)), a)


def test_add_sub64():
    a, b = _pairs(1)
    la, lb = limb.to_limbs(a), limb.to_limbs(b)
    got = limb.from_limbs(jax.jit(limb.add64)(la, lb))
    exp = (a.astype(object) + b.astype(object)) & MASK64
    np.testing.assert_array_equal(got, exp.astype(np.uint64))
    got = limb.from_limbs(jax.jit(limb.sub64)(la, lb))
    exp = (a.astype(object) - b.astype(object)) & MASK64
    np.testing.assert_array_equal(got, exp.astype(np.uint64))


def test_mul64():
    a, b = _pairs(2)
    la, lb = limb.to_limbs(a), limb.to_limbs(b)
    prod = [int(x) * int(y) for x, y in zip(a, b)]
    got_lo = limb.from_limbs(jax.jit(limb.mullo64)(la, lb))
    np.testing.assert_array_equal(
        got_lo, np.array([p & MASK64 for p in prod], dtype=np.uint64))
    got_hi = limb.from_limbs(jax.jit(limb.mulhi64)(la, lb))
    np.testing.assert_array_equal(
        got_hi, np.array([p >> 64 for p in prod], dtype=np.uint64))
    wide = jax.jit(limb.mul64_wide)(la, lb)
    np.testing.assert_array_equal(limb.from_limbs(wide.lo),
                                  got_lo)
    np.testing.assert_array_equal(limb.from_limbs(wide.hi), got_hi)


def test_comparisons_and_select():
    a, b = _pairs(3)
    la, lb = limb.to_limbs(a), limb.to_limbs(b)
    np.testing.assert_array_equal(np.asarray(limb.lt64(la, lb)), a < b)
    np.testing.assert_array_equal(np.asarray(limb.ge64(la, lb)), a >= b)
    np.testing.assert_array_equal(np.asarray(limb.eq64(la, la)),
                                  np.ones_like(a, dtype=bool))
    sel = limb.select64(a < b, la, lb)
    np.testing.assert_array_equal(limb.from_limbs(sel), np.minimum(a, b))


@pytest.mark.parametrize("s", [0, 1, 5, 31, 32, 33, 63])
def test_shifts(s):
    a, _ = _pairs(4)
    la = limb.to_limbs(a)
    np.testing.assert_array_equal(limb.from_limbs(limb.shr64(la, s)), a >> np.uint64(s))
    exp_shl = ((a.astype(object) << s) & MASK64).astype(np.uint64)
    np.testing.assert_array_equal(limb.from_limbs(limb.shl64(la, s)), exp_shl)


@pytest.mark.parametrize("s", [0, 1, 30, 32, 50, 60, 64, 65, 96, 127])
def test_shr128(s):
    a, b = _pairs(5)
    la, lb = limb.to_limbs(a), limb.to_limbs(b)
    wide = limb.mul64_wide(la, lb)
    got = limb.from_limbs(limb.shr128_to64(wide, s))
    exp = np.array(
        [((int(x) * int(y)) >> s) & MASK64 for x, y in zip(a, b)],
        dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)


def test_add128():
    a, b = _pairs(6)
    c, d = _pairs(7)
    p1 = limb.mul64_wide(limb.to_limbs(a), limb.to_limbs(b))
    p2 = limb.mul64_wide(limb.to_limbs(c), limb.to_limbs(d))
    s = jax.jit(limb.add128)(p1, p2)
    got = [(int(limb.from_limbs(s.hi)[i]) << 64) |
           int(limb.from_limbs(s.lo)[i]) for i in range(len(a))]
    exp = [((int(a[i]) * int(b[i]) + int(c[i]) * int(d[i]))
            & ((1 << 128) - 1)) for i in range(len(a))]
    assert got == exp


@pytest.mark.parametrize("q_bits", [5, 20, 30, 45, 50, 59, 61])
def test_shoup_mul_lazy(q_bits):
    q = nt.generate_primes(1, q_bits, True)[0]
    rng = np.random.default_rng(q_bits)
    x = rng.integers(0, 2 * q, size=300, dtype=np.uint64)  # lazy input
    w = int(rng.integers(0, q))
    wp = nt.barrett_factor(w, 64, q)
    got = limb.from_limbs(
        limb.shoup_mul_lazy(limb.to_limbs(x), limb.const64(w),
                            limb.const64(wp), q))
    assert np.all(got < np.uint64(2 * q))
    np.testing.assert_array_equal(got % np.uint64(q),
                                  (x.astype(object) * w % q).astype(np.uint64))


@pytest.mark.parametrize("q_bits", [20, 30, 45, 50, 61])
def test_barrett_reduce_u64(q_bits):
    q = nt.generate_primes(1, q_bits, True)[0]
    q_barr = nt.barrett_factor(1, 64, q)
    rng = np.random.default_rng(q_bits + 100)
    x = rng.integers(0, 1 << 63, size=300, dtype=np.uint64)
    got = limb.from_limbs(limb.barrett_reduce_u64(limb.to_limbs(x), q, q_barr))
    np.testing.assert_array_equal(got, x % np.uint64(q))
    lazy = limb.from_limbs(
        limb.barrett_reduce_u64(limb.to_limbs(x), q, q_barr, 2))
    assert np.all(lazy < np.uint64(2 * q))
    np.testing.assert_array_equal(lazy % np.uint64(q), x % np.uint64(q))


@pytest.mark.parametrize("q_bits", [2, 20, 30, 45, 50, 60, 61])
def test_mult_mod_barrett(q_bits):
    q = nt.generate_primes(1, q_bits, True)[0] if q_bits > 2 else 3
    rng = np.random.default_rng(q_bits + 7)
    x = rng.integers(0, q, size=300, dtype=np.uint64)
    y = rng.integers(0, q, size=300, dtype=np.uint64)
    got = limb.from_limbs(
        jax.jit(lambda a, b: limb.mult_mod_barrett(a, b, q))(
            limb.to_limbs(x), limb.to_limbs(y)))
    exp = (x.astype(object) * y.astype(object) % q).astype(np.uint64)
    np.testing.assert_array_equal(got, exp)


def test_reduce_mod_lazy64():
    q = nt.generate_primes(1, 59, True)[0]
    rng = np.random.default_rng(9)
    for imf in (1, 2, 4, 8):
        x = rng.integers(0, imf * q, size=200, dtype=np.uint64)
        got = limb.from_limbs(
            limb.reduce_mod_lazy64(limb.to_limbs(x), q, imf))
        np.testing.assert_array_equal(got, x % np.uint64(q))


def test_montgomery_reduce():
    q = nt.generate_primes(1, 50, True)[0]
    r = 64
    inv = nt.hensel_lemma_2adic_root(r, q)
    rng = np.random.default_rng(10)
    a = rng.integers(0, q, size=200, dtype=np.uint64)
    b = rng.integers(0, q, size=200, dtype=np.uint64)
    t = limb.mul64_wide(limb.to_limbs(a), limb.to_limbs(b))
    got = limb.from_limbs(limb.montgomery_reduce_u128(t, q, r, inv))
    R_inv = nt.inverse_mod(1 << r, q)
    exp = (a.astype(object) * b.astype(object) * R_inv % q).astype(np.uint64)
    np.testing.assert_array_equal(got, exp)


def test_mulhi64_approx_error_le_1():
    a, b = _pairs(20, 500)
    la, lb = limb.to_limbs(a), limb.to_limbs(b)
    exact = limb.from_limbs(limb.mulhi64(la, lb)).astype(object)
    approx = limb.from_limbs(limb.mulhi64_approx(la, lb)).astype(object)
    diff = exact - approx
    assert np.all((diff == 0) | (diff == 1))


def test_mulhi64_approx6_error_le_6():
    """The lean quotient mulhi may be short by at most 6 (never over)."""
    a, b = _pairs(20, 500)
    la, lb = limb.to_limbs(a), limb.to_limbs(b)
    exact = limb.from_limbs(limb.mulhi64(la, lb)).astype(object)
    approx = limb.from_limbs(limb.mulhi64_approx6(la, lb)).astype(object)
    diff = exact - approx
    assert np.all((diff >= 0) & (diff <= 6))


def test_lean_approx_butterfly_ranges_and_values():
    """The lean approximate Shoup multiply (e<=6, 4q/2q cond-sub chain)
    agrees with the exact form mod q and lands in [0, 2q) for every
    q < LEAN_APPROX_MAX_Q regime boundary."""
    from hexl_tpu.ntt.jnp_ntt import _shoup_approx
    for q_bits in (29, 49, 59, 60):
        q = nt.generate_primes(1, q_bits, True)[0]
        rng = np.random.default_rng(q_bits)
        x = rng.integers(0, 4 * q, size=500, dtype=np.uint64)
        x[:2] = [4 * q - 1, 0]
        w = int(rng.integers(1, q))
        wp = nt.barrett_factor(w, 64, q)
        got = limb.from_limbs(jax.jit(lambda v: _shoup_approx(
            v, limb.const64(w), limb.const64(wp), limb.const64(q),
            limb.const64(2 * q)))(limb.to_limbs(x)))
        assert np.all(got < np.uint64(2 * q))
        np.testing.assert_array_equal(
            got % np.uint64(q), (x.astype(object) * w % q).astype(np.uint64))


def test_cond_sub64_half():
    """The sign-test conditional subtract is bit-identical to cond_sub64
    on its whole contract domain x < 2c (adversarial boundaries: x = 0,
    c-1, c, 2c-1; c up to 2^62 and down to 1)."""
    rng = np.random.default_rng(3)
    for c in [1, 2, (1 << 31) - 1, 1 << 31, (1 << 32) + 5,
              (1 << 59) + 9, (1 << 61) - 1, 1 << 62]:
        x = rng.integers(0, 2 * c, size=500, dtype=np.uint64)
        x[:4] = [0, c - 1, c, 2 * c - 1]
        lx, lc = limb.to_limbs(x), limb.const64(c)
        got = limb.from_limbs(
            jax.jit(lambda v: limb.cond_sub64_half(v, lc))(lx))
        exp = limb.from_limbs(limb.cond_sub64(lx, lc))
        np.testing.assert_array_equal(got, exp)
        np.testing.assert_array_equal(got, np.where(x >= c, x - c, x))


def test_lean16_butterflies_ranges_and_values():
    """The widened-invariant butterflies: forward maps [0,16q) inputs to
    [0,16q) outputs, inverse maps [0,4q) to [0,4q); both agree with the
    textbook butterfly mod q at every regime boundary q < 2^60."""
    from hexl_tpu.ntt.jnp_ntt import (_fwd_butterfly_lean16,
                                      _inv_butterfly_lean4)
    for q_bits in (29, 49, 59, 60):
        q = nt.generate_primes(1, q_bits, True)[0]
        if q >= (1 << 60):
            continue
        rng = np.random.default_rng(q_bits + 1)
        w = int(rng.integers(1, q))
        wp = nt.barrett_factor(w, 64, q)
        args = (limb.const64(w), limb.const64(wp), limb.const64(q),
                limb.const64(2 * q))

        xs = rng.integers(0, 16 * q, size=500, dtype=np.uint64)
        ys = rng.integers(0, 16 * q, size=500, dtype=np.uint64)
        xs[:2], ys[:2] = [16 * q - 1, 0], [0, 16 * q - 1]
        nx, ny = jax.jit(lambda a, b: _fwd_butterfly_lean16(
            a, b, *args))(limb.to_limbs(xs), limb.to_limbs(ys))
        nx, ny = limb.from_limbs(nx), limb.from_limbs(ny)
        assert nx.max() < 16 * q and ny.max() < 16 * q
        wy = ys.astype(object) * w
        np.testing.assert_array_equal(
            nx % np.uint64(q),
            ((xs.astype(object) + wy) % q).astype(np.uint64))
        np.testing.assert_array_equal(
            ny % np.uint64(q),
            ((xs.astype(object) - wy) % q).astype(np.uint64))

        xs = rng.integers(0, 4 * q, size=500, dtype=np.uint64)
        ys = rng.integers(0, 4 * q, size=500, dtype=np.uint64)
        xs[:2], ys[:2] = [4 * q - 1, 0], [0, 4 * q - 1]
        nx, ny = jax.jit(lambda a, b: _inv_butterfly_lean4(
            a, b, *args))(limb.to_limbs(xs), limb.to_limbs(ys))
        nx, ny = limb.from_limbs(nx), limb.from_limbs(ny)
        assert nx.max() < 4 * q and ny.max() < 4 * q
        np.testing.assert_array_equal(
            nx % np.uint64(q),
            ((xs.astype(object) + ys.astype(object)) % q
             ).astype(np.uint64))
        np.testing.assert_array_equal(
            ny % np.uint64(q),
            ((xs.astype(object) - ys.astype(object)) * w % q
             ).astype(np.uint64))


def test_shoup_mul_lazy_approx():
    q = nt.generate_primes(1, 60, True)[0]
    rng = np.random.default_rng(0)
    x = rng.integers(0, 4 * q, size=500, dtype=np.uint64)
    w = int(rng.integers(0, q))
    wp = nt.barrett_factor(w, 64, q)
    got = limb.from_limbs(limb.shoup_mul_lazy_approx(
        limb.to_limbs(x), limb.const64(w), limb.const64(wp), q,
        limb.const64(2 * q)))
    assert np.all(got < np.uint64(2 * q))
    np.testing.assert_array_equal(
        got % np.uint64(q), (x.astype(object) * w % q).astype(np.uint64))


@pytest.mark.parametrize("q_bits", [30, 45, 50, 60, 61])
def test_mult_mod_barrett_approx(q_bits):
    """Fully-reduced output must be bit-identical to the exact form."""
    q = nt.generate_primes(1, q_bits, True)[0]
    rng = np.random.default_rng(q_bits + 77)
    x = rng.integers(0, q, size=400, dtype=np.uint64)
    y = rng.integers(0, q, size=400, dtype=np.uint64)
    x[:3] = [q - 1, q - 1, 0]
    y[:3] = [q - 1, 1, q - 1]
    lx, ly = limb.to_limbs(x), limb.to_limbs(y)
    exact = limb.from_limbs(
        jax.jit(lambda a, b: limb.mult_mod_barrett(a, b, q))(lx, ly))
    approx = limb.from_limbs(
        jax.jit(lambda a, b: limb.mult_mod_barrett_approx(a, b, q))(lx, ly))
    np.testing.assert_array_equal(approx, exact)
    exp = (x.astype(object) * y.astype(object) % q).astype(np.uint64)
    np.testing.assert_array_equal(approx, exp)


@pytest.mark.parametrize("q_bits", [30, 45, 50, 61])
def test_barrett_reduce_u64_approx(q_bits):
    q = nt.generate_primes(1, q_bits, True)[0]
    q_barr = nt.barrett_factor(1, 64, q)
    rng = np.random.default_rng(q_bits + 200)
    # Full uint64 input range including the extreme corners.
    x = rng.integers(0, 1 << 64, size=400, dtype=np.uint64)
    x[:3] = [0xFFFFFFFFFFFFFFFF, 0, q - 1]
    lx = limb.to_limbs(x)
    got = limb.from_limbs(limb.barrett_reduce_u64_approx(lx, q, q_barr))
    np.testing.assert_array_equal(got, x % np.uint64(q))
    lazy = limb.from_limbs(limb.barrett_reduce_u64_approx(lx, q, q_barr, 2))
    assert np.all(lazy < np.uint64(2 * q))
    np.testing.assert_array_equal(lazy % np.uint64(q), x % np.uint64(q))
