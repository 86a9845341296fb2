"""Sharded NTT tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from hexl_tpu import nt, ref
from hexl_tpu.parallel import DistNTT, make_mesh


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


@pytest.mark.parametrize("d_coeff", [2, 4, 8])
def test_dist_forward_matches_oracle(d_coeff):
    _require_devices(d_coeff)
    n = 1 << 14
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    mesh = make_mesh(d_coeff, 1)
    dntt = DistNTT(n, q, mesh)
    rng = np.random.default_rng(d_coeff)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    got = dntt.forward(x, 1, 1)
    exp = ref.fwd_ntt_radix2(x, q, dntt.plan.rop, dntt.plan.prop, 1, 1)
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_dist_roundtrip_and_lazy():
    _require_devices(4)
    n = 1 << 14
    q = nt.generate_primes(1, 60, True, ntt_size=n)[0]
    mesh = make_mesh(4, 2)
    dntt = DistNTT(n, q, mesh)
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    y = dntt.forward(x, 1, 4)
    exp = ref.fwd_ntt_radix2(x, q, dntt.plan.rop, dntt.plan.prop, 1, 4)
    np.testing.assert_array_equal(np.asarray(y), exp)
    back = dntt.inverse(y % np.uint64(q), 1, 1)
    np.testing.assert_array_equal(np.asarray(back), x)
    # lazy inverse
    inv2 = dntt.inverse(y % np.uint64(q), 1, 2)
    expi = ref.inv_ntt_radix2(y % np.uint64(q), q, dntt.plan.irop,
                              dntt.plan.pirop, 1, 2)
    np.testing.assert_array_equal(np.asarray(inv2), expi)


def test_dist_poly_mult_pipeline():
    """Sharded fwd -> pointwise mult -> sharded inv == oracle pipeline."""
    _require_devices(8)
    n = 1 << 15
    q = nt.generate_primes(1, 45, True, ntt_size=n)[0]
    mesh = make_mesh(8, 1)
    dntt = DistNTT(n, q, mesh)
    rng = np.random.default_rng(1)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    fa = np.asarray(dntt.forward(a, 1, 1))
    fb = np.asarray(dntt.forward(b, 1, 1))
    prod = ref.eltwise_mult_mod(fa, fb, q)
    c = np.asarray(dntt.inverse(prod, 1, 1))
    fa_o = ref.fwd_ntt_radix2(a, q, dntt.plan.rop, dntt.plan.prop, 1, 1)
    fb_o = ref.fwd_ntt_radix2(b, q, dntt.plan.rop, dntt.plan.prop, 1, 1)
    c_o = ref.inv_ntt_radix2(ref.eltwise_mult_mod(fa_o, fb_o, q), q,
                             dntt.plan.irop, dntt.plan.pirop, 1, 1)
    np.testing.assert_array_equal(c, c_o)


def test_dist_fused_poly_mult():
    """DistNTT.poly_mult (one shard_map for fwd x2 -> mult -> inv) matches
    the oracle pipeline."""
    _require_devices(4)
    n = 1 << 13
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    mesh = make_mesh(4, 2)
    dntt = DistNTT(n, q, mesh)
    rng = np.random.default_rng(3)
    a = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    b = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    c = np.asarray(dntt.poly_mult(a, b))
    fa = ref.fwd_ntt_radix2(a, q, dntt.plan.rop, dntt.plan.prop, 1, 4)
    fb = ref.fwd_ntt_radix2(b, q, dntt.plan.rop, dntt.plan.prop, 1, 4)
    exp = ref.inv_ntt_radix2(ref.eltwise_mult_mod(fa, fb, q, 4), q,
                             dntt.plan.irop, dntt.plan.pirop, 1, 1)
    np.testing.assert_array_equal(c, exp)


def test_dist_rns_poly_mult():
    """Per-prime sharded pipeline over a 3-prime RNS basis."""
    from hexl_tpu.parallel import dist_rns_poly_mult
    _require_devices(8)
    n = 1 << 13
    primes = nt.generate_primes(3, 45, True, ntt_size=n)
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(4)
    a = rng.integers(0, min(primes), size=(3, 2, n), dtype=np.uint64)
    b = rng.integers(0, min(primes), size=(3, 2, n), dtype=np.uint64)
    got = dist_rns_poly_mult(a, b, n, primes, mesh)
    for i, q in enumerate(primes):
        plan_rop, plan_irop, _ = ref.root_of_unity_powers(n, q)
        prop = ref.precon64(plan_rop, q)
        pirop = ref.precon64(plan_irop, q)
        fa = ref.fwd_ntt_radix2(a[i], q, plan_rop, prop, 1, 4)
        fb = ref.fwd_ntt_radix2(b[i], q, plan_rop, prop, 1, 4)
        exp = ref.inv_ntt_radix2(ref.eltwise_mult_mod(fa, fb, q, 4), q,
                                 plan_irop, pirop, 1, 1)
        np.testing.assert_array_equal(got[i], exp)


def test_dist_pallas_local_matches_oracle(monkeypatch):
    """The fused-Pallas local-transform path inside shard_map (the real
    TPU configuration) — run in interpret mode on the CPU mesh."""
    import functools
    from jax.experimental import pallas as pl

    from hexl_tpu import config

    _require_devices(4)
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call,
                                             interpret=True))
    monkeypatch.setattr(config, "use_pallas", lambda: True)
    n = 1 << 13
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    mesh = make_mesh(4, 1)
    dntt = DistNTT(n, q, mesh)
    assert dntt._pallas_local_ok
    rng = np.random.default_rng(6)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    # The Pallas butterflies use approximate-mulhi (reference AVX512-64
    # semantics): lazy outputs agree mod q within range, not bit-for-bit
    # — the reference's own AVX512 testing model (reduce % q, check the
    # range; test-ntt-avx512.cpp:377-387).
    got = np.asarray(dntt.forward(x, 1, 4))
    exp = ref.fwd_ntt_radix2(x, q, dntt.plan.rop, dntt.plan.prop, 1, 4)
    np.testing.assert_array_equal(got % np.uint64(q), exp % np.uint64(q))
    assert got.max() < 4 * q
    back = dntt.inverse(got % np.uint64(q), 1, 1)
    np.testing.assert_array_equal(np.asarray(back), x)
    # Fully-reduced outputs are exact.
    c = dntt.poly_mult(x, x)
    fa = ref.fwd_ntt_radix2(x, q, dntt.plan.rop, dntt.plan.prop, 1, 4)
    expc = ref.inv_ntt_radix2(ref.eltwise_mult_mod(fa, fa, q, 4), q,
                              dntt.plan.irop, dntt.plan.pirop, 1, 1)
    np.testing.assert_array_equal(np.asarray(c), expc)


def test_dist_single_shard_coeff_axis():
    """d=1 coeff mesh (e.g. one real chip): no cross stages, the final
    fused stage runs over local halves."""
    n = 1 << 13
    q = nt.generate_primes(1, 45, True, ntt_size=n)[0]
    mesh = make_mesh(1, 1)
    dntt = DistNTT(n, q, mesh)
    rng = np.random.default_rng(7)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    got = dntt.forward(x, 1, 1)
    exp = ref.fwd_ntt_radix2(x, q, dntt.plan.rop, dntt.plan.prop, 1, 1)
    np.testing.assert_array_equal(np.asarray(got), exp)
    back = dntt.inverse(got, 1, 1)
    np.testing.assert_array_equal(np.asarray(back), x)


@pytest.mark.parametrize("slices", [2, 4])
def test_dist_overlap_variant_matches_blocking(slices):
    """The sliced (overlapped) cross phase must agree bit-for-bit with the
    blocking single-exchange variant on the same mesh (VERDICT #4: both
    variants validated on the emulated mesh before a pod shows up)."""
    _require_devices(8)
    n = 1 << 13
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(17)
    x = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    blocking = DistNTT(n, q, mesh, overlap_slices=1)
    overlapped = DistNTT(n, q, mesh, overlap_slices=slices)
    for fn in ("forward", "inverse"):
        a = getattr(blocking, fn)(x)
        b = getattr(overlapped, fn)(x)
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(blocking.poly_mult(x, x),
                                  overlapped.poly_mult(x, x))


def test_dist_dyadic_multiply_matches_single_chip():
    """Coefficient-sharded dyadic ct x ct product == single-chip result
    (element-wise op: sharding must be pure placement, no value change)."""
    _require_devices(8)
    from hexl_tpu.experimental import dyadic_multiply
    from hexl_tpu.parallel import dist_dyadic_multiply, make_mesh

    n, m = 1024, 4
    moduli = nt.generate_primes(m, 40, True, ntt_size=n)
    rng = np.random.default_rng(11)
    x = np.stack([np.stack([rng.integers(0, q, n, np.uint64)
                            for q in moduli]) for _ in range(2)])
    y = np.stack([np.stack([rng.integers(0, q, n, np.uint64)
                            for q in moduli]) for _ in range(2)])
    mesh = make_mesh(4, 2)
    got = dist_dyadic_multiply(x, y, moduli, mesh)
    exp = dyadic_multiply(x, y, moduli)
    np.testing.assert_array_equal(got, exp)


def test_dist_key_switch_matches_single_chip():
    """The mesh-sharded key switch is bit-equal to the single-chip
    composite (same lazy-range chaining, NTTs through DistNTT)."""
    _require_devices(8)
    from hexl_tpu.experimental import key_switch
    from hexl_tpu.parallel import dist_key_switch, make_mesh

    n, ds, kc = 1024, 2, 2
    kms = rns = ds + 1
    moduli = nt.generate_primes(kms, 40, True, ntt_size=n)
    qk = moduli[-1]
    rng = np.random.default_rng(12)
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
    mesh = make_mesh(2, 4)
    got = dist_key_switch(result, t_target, n, ds, kms, rns, kc, moduli,
                          keys, msf, mesh)
    exp = key_switch(result, t_target, n, ds, kms, rns, kc, moduli, keys,
                     msf)
    np.testing.assert_array_equal(got, exp)
