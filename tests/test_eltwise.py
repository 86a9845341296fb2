"""Eltwise dispatch-path tests: jnp (and Pallas when on TPU) vs the oracle.

The same public entry points are exercised on whichever backend the session
provides; on CPU runs this covers the portable jnp path, and the separate
TPU bench/CI covers the Pallas path bit-exactly with identical calls.
"""

import numpy as np
import pytest

from hexl_tpu import nt, ref
from hexl_tpu.eltwise import (eltwise_add_mod, eltwise_cmp_add,
                              eltwise_cmp_sub_mod, eltwise_fma_mod,
                              eltwise_montgomery_form_in,
                              eltwise_montgomery_form_out,
                              eltwise_montgomery_mult_reduce,
                              eltwise_mult_mod, eltwise_reduce_mod,
                              eltwise_sub_mod)

SIZES = [1, 7, 128, 1000, 4096]
Q_BITS = [20, 30, 45, 50, 60, 61]


def _rng(*key):
    return np.random.default_rng(abs(hash(key)) % (2**32))


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("q_bits", [30, 60])
def test_add_sub_mod(n, q_bits):
    q = nt.generate_primes(1, q_bits, True)[0]
    rng = _rng("addsub", n, q_bits)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    np.testing.assert_array_equal(eltwise_add_mod(a, b, q),
                                  ref.eltwise_add_mod(a, b, q))
    np.testing.assert_array_equal(eltwise_sub_mod(a, b, q),
                                  ref.eltwise_sub_mod(a, b, q))
    s = int(rng.integers(0, q))
    np.testing.assert_array_equal(eltwise_add_mod(a, s, q),
                                  ref.eltwise_add_mod(a, s, q))
    np.testing.assert_array_equal(eltwise_sub_mod(a, s, q),
                                  ref.eltwise_sub_mod(a, s, q))


@pytest.mark.parametrize("q_bits", Q_BITS)
@pytest.mark.parametrize("imf", [1, 2, 4])
def test_mult_mod(q_bits, imf):
    q = nt.generate_primes(1, q_bits, True)[0]
    if imf * q >= (1 << 63):
        pytest.skip("IMF * q out of range")
    rng = _rng("mult", q_bits, imf)
    a = rng.integers(0, imf * q, size=2048, dtype=np.uint64)
    b = rng.integers(0, imf * q, size=2048, dtype=np.uint64)
    np.testing.assert_array_equal(eltwise_mult_mod(a, b, q, imf),
                                  ref.eltwise_mult_mod(a, b, q, imf))


@pytest.mark.parametrize("imf", [1, 2, 4, 8])
@pytest.mark.parametrize("with_arg3", [True, False])
def test_fma_mod(imf, with_arg3):
    q = nt.generate_primes(1, 59, True)[0]
    rng = _rng("fma", imf, with_arg3)
    a1 = rng.integers(0, imf * q, size=1024, dtype=np.uint64)
    a2 = int(rng.integers(0, imf * q))
    a3 = rng.integers(0, imf * q, size=1024, dtype=np.uint64) \
        if with_arg3 else None
    np.testing.assert_array_equal(
        eltwise_fma_mod(a1, a2, a3, q, imf),
        ref.eltwise_fma_mod(a1, a2, a3, q, imf))


@pytest.mark.parametrize("q_bits", [30, 50, 61])
def test_reduce_mod(q_bits):
    from hexl_tpu import config as _cfg
    q = nt.generate_primes(1, q_bits, True)[0]
    rng = _rng("reduce", q_bits)
    x = rng.integers(0, 1 << 63, size=1024, dtype=np.uint64)
    approx = (_cfg.default_backend() == "tpu"
              and not _cfg.approx_mulhi_disabled())
    for imf, omf in [(q, 1), (q, 2), (2, 1), (4, 1), (4, 2), (2, 2)]:
        xin = x if imf == q else rng.integers(0, imf * q, size=1024,
                                              dtype=np.uint64)
        got = np.asarray(eltwise_reduce_mod(xin, q, imf, omf))
        exp = ref.eltwise_reduce_mod(xin, q, imf, omf)
        if imf == q and omf == 2 and approx:
            # The TPU backend's approximate-quotient Barrett
            # (limb.barrett_reduce_u64_approx) contracts mod-q equality
            # and the [0, 2q) range for lazy outputs, not the exact
            # form's representative (the reference AVX512 lazy-output
            # semantics; ~50% of 30-bit inputs land one q higher).
            # Fully-reduced outputs (omf=1) stay bit-identical below.
            assert np.all(got < np.uint64(2 * q))
            np.testing.assert_array_equal(
                got % np.uint64(q), exp % np.uint64(q),
                err_msg=f"imf={imf} omf={omf} (mod-q)")
        else:
            np.testing.assert_array_equal(
                got, exp, err_msg=f"imf={imf} omf={omf}")


@pytest.mark.parametrize("cmp", ref.ALL_CMPS)
def test_cmp_add(cmp):
    rng = _rng("cmpadd", cmp)
    a = rng.integers(0, 1 << 62, size=777, dtype=np.uint64)
    bound = int(rng.integers(0, 1 << 62))
    diff = int(rng.integers(1, 1 << 60))
    np.testing.assert_array_equal(eltwise_cmp_add(a, cmp, bound, diff),
                                  ref.eltwise_cmp_add(a, cmp, bound, diff))


@pytest.mark.parametrize("cmp", ref.ALL_CMPS)
def test_cmp_sub_mod(cmp):
    q = nt.generate_primes(1, 51, True)[0]
    rng = _rng("cmpsub", cmp)
    a = rng.integers(0, 8 * q, size=777, dtype=np.uint64)
    bound = int(rng.integers(0, 4 * q))
    diff = int(rng.integers(1, q))
    np.testing.assert_array_equal(
        eltwise_cmp_sub_mod(a, q, cmp, bound, diff),
        ref.eltwise_cmp_sub_mod(a, q, cmp, bound, diff))


def test_montgomery_family():
    q = nt.generate_primes(1, 50, True)[0]
    rng = _rng("mont")
    a = rng.integers(0, q, size=512, dtype=np.uint64)
    b = rng.integers(0, q, size=512, dtype=np.uint64)
    a_m = eltwise_montgomery_form_in(a, q)
    np.testing.assert_array_equal(
        a_m, (a.astype(object) * ((1 << 64) % q) % q).astype(np.uint64))
    back = eltwise_montgomery_form_out(a_m, q)
    np.testing.assert_array_equal(back, a)
    # REDC(form_in(a) * form_in(b)) == form_in(a*b)
    b_m = eltwise_montgomery_form_in(b, q)
    ab_m = eltwise_montgomery_mult_reduce(a_m, b_m, q)
    expected = eltwise_montgomery_form_in(
        (a.astype(object) * b.astype(object) % q).astype(np.uint64), q)
    np.testing.assert_array_equal(ab_m, expected)


# --- single-limb (q < 2^30) regime: explicit equivalence vs the 64-bit
# bodies on the same inputs (reference analogue: the DQ-32 regime must
# agree with Native, test-eltwise-*-avx512.cpp pattern) ---

def test_small_q_regime_matches_64bit_bodies():
    import numpy as np
    from hexl_tpu import nt
    from hexl_tpu.eltwise import jnp_kernels as K
    from hexl_tpu.eltwise import jnp_kernels32 as K32
    from hexl_tpu.limb import from_limbs, to_limbs

    q = nt.generate_primes(1, 29, True, ntt_size=1 << 10)[0]
    rng = np.random.default_rng(5)
    for imf in (1, 2, 4):
        a = rng.integers(0, imf * q, size=257, dtype=np.uint64)
        b = rng.integers(0, imf * q, size=257, dtype=np.uint64)
        got = from_limbs(K32.mult_mod32(to_limbs(a), to_limbs(b), q, imf))
        want = from_limbs(K.mult_mod(to_limbs(a), to_limbs(b), q, imf))
        np.testing.assert_array_equal(got, want)
    a = rng.integers(0, q, size=257, dtype=np.uint64)
    b = rng.integers(0, q, size=257, dtype=np.uint64)
    np.testing.assert_array_equal(
        from_limbs(K32.add_mod32(to_limbs(a), to_limbs(b), q)),
        from_limbs(K.add_mod(to_limbs(a), to_limbs(b), q)))
    np.testing.assert_array_equal(
        from_limbs(K32.sub_mod32(to_limbs(a), to_limbs(b), q)),
        from_limbs(K.sub_mod(to_limbs(a), to_limbs(b), q)))
    for imf, omf in ((2, 1), (4, 1), (4, 2)):
        x = rng.integers(0, imf * q, size=257, dtype=np.uint64)
        np.testing.assert_array_equal(
            from_limbs(K32.reduce_mod32(to_limbs(x), q, imf, omf)),
            from_limbs(K.reduce_mod(to_limbs(x), q, imf, omf)))


def test_small_q_fma_matches_64bit():
    import numpy as np
    from hexl_tpu import nt
    from hexl_tpu.eltwise import eltwise_fma_mod

    q = nt.generate_primes(1, 29, True, ntt_size=1 << 10)[0]
    rng = np.random.default_rng(6)
    for imf in (1, 2, 4, 8):
        a = rng.integers(0, imf * q, size=130, dtype=np.uint64)
        c = rng.integers(0, imf * q, size=130, dtype=np.uint64)
        w = int(rng.integers(0, imf * q))
        got = eltwise_fma_mod(a, w, c, q, imf)
        want = (a.astype(object) * (w % q) + c.astype(object)) % q
        np.testing.assert_array_equal(got.astype(object), want)


def test_fused_multi_op_pipeline_pallas_runner(monkeypatch):
    """The generic Pallas runner exists to fuse CHAINS of eltwise ops in
    one VMEM residency (standalone ops default to the XLA body). Exercise
    the dyadic-MAC shape — a*b + c*d mod q — as one fused kernel in
    interpret mode and check it against the big-int oracle."""
    import functools
    import numpy as np
    from jax.experimental import pallas as pl
    from hexl_tpu import nt
    from hexl_tpu.eltwise import jnp_kernels as K
    from hexl_tpu.eltwise import pallas_kernels as P
    from hexl_tpu.limb import from_limbs, to_limbs

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call,
                                             interpret=True))
    q = nt.generate_primes(1, 60, True, ntt_size=1 << 10)[0]
    rng = np.random.default_rng(11)
    a, b, c, d = (rng.integers(0, q, size=(3, 300), dtype=np.uint64)
                  for _ in range(4))

    def mac(x, y, z, w):
        return K.add_mod(K.mult_mod(x, y, q, 1), K.mult_mod(z, w, q, 1), q)

    got = from_limbs(P.run_eltwise(
        mac, tuple(to_limbs(v) for v in (a, b, c, d))))
    want = ((a.astype(object) * b + c.astype(object) * d) % q)
    np.testing.assert_array_equal(got.astype(object), want)
    # Must agree with the XLA-fused composition bit-for-bit.
    xla = from_limbs(mac(*(to_limbs(v) for v in (a, b, c, d))))
    np.testing.assert_array_equal(got, xla)


def test_approx_quotient_bodies_match_exact(monkeypatch):
    """The eltwise kernels trace approximate-mulhi quotients on the TPU
    backend (jnp_kernels._approx). Force that dispatch here on CPU and
    check each affected body is bit-identical to the exact trace (all
    their public output contracts are fully reduced or compared mod q)."""
    from hexl_tpu.eltwise import jnp_kernels as K
    from hexl_tpu.limb import const64, from_limbs, to_limbs

    q = nt.generate_primes(1, 61, True)[0]
    rng = np.random.default_rng(23)
    a = rng.integers(0, q, size=400, dtype=np.uint64)
    b = rng.integers(0, q, size=400, dtype=np.uint64)
    big = rng.integers(0, 1 << 64, size=400, dtype=np.uint64)
    la, lb, lbig = to_limbs(a), to_limbs(b), to_limbs(big)
    w = int(rng.integers(0, q))
    lw = const64(w)
    lwp = const64(nt.barrett_factor(w, 64, q))

    cases = [
        lambda: K.mult_mod(la, lb, q, 1),
        lambda: K.fma_mod_preconned(la, lw, lwp, lb, q, 1),
        lambda: K.reduce_mod(lbig, q, q, 1),
        lambda: K.cmp_sub_mod(lbig, q, "nlt", 1 << 62, int(b[0])),
        lambda: K.montgomery_form_in(la, q),
    ]
    exact = [from_limbs(fn()) for fn in cases]
    monkeypatch.setattr(K, "_approx", lambda: True)
    approx = [from_limbs(fn()) for fn in cases]
    for e, g in zip(exact, approx):
        np.testing.assert_array_equal(g, e)
    # The OMF=2 contract under approx: range holds, values agree mod q.
    lazy = from_limbs(K.reduce_mod(lbig, q, q, 2))
    assert np.all(lazy < np.uint64(2 * q))
    np.testing.assert_array_equal(lazy % np.uint64(q), big % np.uint64(q))
