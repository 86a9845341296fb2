"""Hierarchical (two-kernel) large-N NTT: bit-exact vs the oracle.

Runs the Pallas kernels in interpret mode so the path is covered on the
CPU CI mesh; real-hardware coverage comes from bench/suite runs.
"""

import functools

import numpy as np
import pytest

from hexl_tpu import nt, ref
from hexl_tpu.limb import from_limbs, to_limbs
from hexl_tpu.ntt import get_plan, hier


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call,
                                             interpret=True))


def test_hier_fwd_inv_matches_oracle(interpret_pallas):
    n = 1 << 15
    q = nt.generate_primes(1, 60, True, ntt_size=n)[0]
    plan = get_plan(n, q)
    rng = np.random.default_rng(0)
    xs = rng.integers(0, q, size=n, dtype=np.uint64)
    x = to_limbs(xs)

    got = from_limbs(hier.fwd_ntt_hier(x, plan, 1, 4))
    exp = ref.fwd_ntt_radix2(xs, q, plan.rop, plan.prop, 1, 4)
    np.testing.assert_array_equal(got % np.uint64(q), exp % np.uint64(q))
    assert got.max() < 4 * q

    f = ref.fwd_ntt_radix2(xs, q, plan.rop, plan.prop, 1, 1)
    back = from_limbs(hier.inv_ntt_hier(to_limbs(f), plan, 1, 1))
    np.testing.assert_array_equal(back, xs)
    lazy = from_limbs(hier.inv_ntt_hier(to_limbs(f), plan, 1, 2))
    expi = ref.inv_ntt_radix2(f, q, plan.irop, plan.pirop, 1, 2)
    np.testing.assert_array_equal(lazy % np.uint64(q),
                                  expi % np.uint64(q))


def test_hier_small_degree_falls_back(interpret_pallas):
    # Degrees at or below LOCAL_N route to the staged XLA body.
    n = 1 << 13
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    plan = get_plan(n, q)
    rng = np.random.default_rng(1)
    xs = rng.integers(0, q, size=n, dtype=np.uint64)
    got = from_limbs(hier.fwd_ntt_hier(to_limbs(xs), plan, 1, 1))
    exp = ref.fwd_ntt_radix2(xs, q, plan.rop, plan.prop, 1, 1)
    np.testing.assert_array_equal(got, exp)
