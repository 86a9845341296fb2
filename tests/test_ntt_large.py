"""Correctness at the large degrees the benchmarks claim (N=2^16..2^20).

VERDICT round 3, Next #4: every (kernel, N) pair in
benchmarks/tpu_results.json must have a matching bit-exactness test.
The engine accepts N up to 2^20 (plan.py:31, parity with
hexl/include/hexl/ntt/ntt.hpp:197); the committed results include rows
at N=2^16 and 2^17 (fwd/inv staged, ntt32 pair, rns poly-mult), so this
file pins those sizes against the NumPy oracle (hexl_tpu/ref.py).

On CPU the staged bodies use exact Harvey butterflies -> outputs are
bit-exact including lazy ranges. On TPU (HEXL_TPU_TEST_PLATFORM=tpu)
the lean approximate butterflies make lazy outputs mod-q-equal within
the declared range (the reference's own AVX512 testing model,
test-ntt-avx512.cpp:377-387); OMF=1 outputs stay bit-exact.

N=2^20 (the documented ceiling) is covered by test_staged_2e20
(~23 s on the CPU mesh; the oracle itself is cheap NumPy).
"""

import numpy as np
import pytest

from hexl_tpu import config, nt, ref
from hexl_tpu.limb import from_limbs, to_limbs
from hexl_tpu.ntt import get_plan, jnp_ntt


def _lazy_exact():
    # Approximate butterflies (TPU backend) change lazy-range values but
    # not residues; the CPU suite runs the exact forms.
    return not config.approx_butterflies()


def _check(got, exp, q, omf_bound, msg):
    got = np.asarray(got)
    if _lazy_exact() or omf_bound == 1:
        np.testing.assert_array_equal(got, exp, err_msg=msg)
    else:
        np.testing.assert_array_equal(got % np.uint64(q),
                                      np.asarray(exp) % np.uint64(q),
                                      err_msg=msg)
        assert got.max() < omf_bound * q, msg


@pytest.mark.parametrize("log_n,q_bits", [(16, 60), (16, 49), (17, 60)])
def test_staged_large_vs_oracle(log_n, q_bits):
    """fwd_ntt / inv_ntt rows at N=2^16, 2^17 (tpu_results.json)."""
    n = 1 << log_n
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    plan = get_plan(n, q)
    rng = np.random.default_rng(log_n * 1000 + q_bits)
    xs = rng.integers(0, q, size=n, dtype=np.uint64)
    x = to_limbs(xs)

    got = from_limbs(jnp_ntt.fwd_ntt(x, plan, 1, 1))
    exp = ref.fwd_ntt_radix2(xs, q, plan.rop, plan.prop, 1, 1)
    np.testing.assert_array_equal(got, exp)

    lazy = from_limbs(jnp_ntt.fwd_ntt(x, plan, 1, 4))
    expl = ref.fwd_ntt_radix2(xs, q, plan.rop, plan.prop, 1, 4)
    _check(lazy, expl, q, 4, f"fwd lazy N=2^{log_n}")

    back = from_limbs(jnp_ntt.inv_ntt(to_limbs(exp), plan, 1, 1))
    np.testing.assert_array_equal(back, xs)
    lazy_i = from_limbs(jnp_ntt.inv_ntt(to_limbs(exp), plan, 1, 2))
    expi = ref.inv_ntt_radix2(exp, q, plan.irop, plan.pirop, 1, 2)
    _check(lazy_i, expi, q, 2, f"inv lazy N=2^{log_n}")


def test_ntt32_2e17_vs_oracle():
    """fwd+inv_ntt32_pair N=2^17 q=29b row (tpu_results.json)."""
    import jax.numpy as jnp

    from hexl_tpu.ntt import ntt32

    n = 1 << 17
    q = nt.generate_primes(1, 29, True, ntt_size=n)[0]
    plan = get_plan(n, q)
    rng = np.random.default_rng(17)
    xs = rng.integers(0, q, size=n, dtype=np.uint64)
    x32 = jnp.asarray(xs.astype(np.uint32))

    f = np.asarray(ntt32.fwd_ntt32(x32, plan, 1, 1)).astype(np.uint64)
    exp = ref.fwd_ntt_radix2(xs, q, plan.rop, plan.prop, 1, 1)
    np.testing.assert_array_equal(f, exp)
    back = np.asarray(ntt32.inv_ntt32(
        jnp.asarray(exp.astype(np.uint32)), plan, 1, 1)).astype(np.uint64)
    np.testing.assert_array_equal(back, xs)


def test_hier_above_pallas_ceiling():
    """Hierarchical path above PALLAS_MAX_N (2^16): N=2^17, interpret
    mode (VERDICT Next #4(c))."""
    import functools

    from jax.experimental import pallas as pl

    from hexl_tpu.ntt import hier

    n = 1 << 17
    q = nt.generate_primes(1, 60, True, ntt_size=n)[0]
    plan = get_plan(n, q)
    rng = np.random.default_rng(3)
    xs = rng.integers(0, q, size=n, dtype=np.uint64)

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = from_limbs(hier.fwd_ntt_hier(to_limbs(xs), plan, 1, 1))
        exp = ref.fwd_ntt_radix2(xs, q, plan.rop, plan.prop, 1, 1)
        np.testing.assert_array_equal(got, exp)
        back = from_limbs(hier.inv_ntt_hier(to_limbs(exp), plan, 1, 1))
        np.testing.assert_array_equal(back, xs)
    finally:
        pl.pallas_call = orig


def test_poly_mult_2e17_vs_oracle():
    """Per-prime pipeline of the rns_poly_mult_4x N=2^17 q=50b row."""
    from hexl_tpu import poly

    n = 1 << 17
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    plan = get_plan(n, q)
    rng = np.random.default_rng(5)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    got = from_limbs(poly._poly_mult_xla(to_limbs(a), to_limbs(b), plan))
    fa = ref.fwd_ntt_radix2(a, q, plan.rop, plan.prop, 1, 1)
    fb = ref.fwd_ntt_radix2(b, q, plan.rop, plan.prop, 1, 1)
    prod = (fa.astype(object) * fb.astype(object) % q).astype(np.uint64)
    exp = ref.inv_ntt_radix2(prod, q, plan.irop, plan.pirop, 1, 1)
    np.testing.assert_array_equal(got, exp)


def test_staged_2e20():
    """The documented degree ceiling (plan.py:31 / ntt.hpp:197)."""
    n = 1 << 20
    q = nt.generate_primes(1, 60, True, ntt_size=n)[0]
    plan = get_plan(n, q)
    rng = np.random.default_rng(20)
    xs = rng.integers(0, q, size=n, dtype=np.uint64)
    got = from_limbs(jnp_ntt.fwd_ntt(to_limbs(xs), plan, 1, 1))
    exp = ref.fwd_ntt_radix2(xs, q, plan.rop, plan.prop, 1, 1)
    np.testing.assert_array_equal(got, exp)
    back = from_limbs(jnp_ntt.inv_ntt(to_limbs(exp), plan, 1, 1))
    np.testing.assert_array_equal(back, xs)
