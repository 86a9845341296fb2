"""Stacked multi-modulus (RNS) NTT — bit-exactness vs per-modulus singles.

The stacked path (ntt/rns.py) must be position-for-position identical to
looping single-modulus transforms on both the small-N flat body and the
2D staged body. Fully-reduced outputs are bit-identical everywhere;
LAZY outputs are bit-identical only where the two paths trace the same
butterfly scheme — under the TPU backend's approximate-quotient
butterflies the per-regime dispatch can differ between the stacked
group and a single transform, so lazy outputs are judged mod q within
the contract range there (the reference's own AVX512 lazy-output
testing model, test-ntt-avx512.cpp:377-387; measured on-device: all
values mod-q equal and in range, 2026-08-20).
"""

import numpy as np
import pytest

from hexl_tpu import nt
from hexl_tpu.limb import from_limbs, to_limbs
from hexl_tpu.ntt import RnsNTT, get_plan, jnp_ntt
from hexl_tpu.ntt.rns import RnsNttPlan


def _assert_matches(got, exp, q, omf):
    got = np.asarray(got)
    if omf == 1 or not _approx_lazy():
        np.testing.assert_array_equal(got, exp)
        return
    assert got.max() < np.uint64(omf) * np.uint64(q)
    np.testing.assert_array_equal(got % np.uint64(q), exp % np.uint64(q))


def _approx_lazy():
    from hexl_tpu import config
    return (config.default_backend() == "tpu"
            and not config.approx_mulhi_disabled())


def _basis(n, bit_sizes):
    moduli = []
    for bits in bit_sizes:
        for q in nt.generate_primes(4, bits, True, n):
            if q not in moduli:
                moduli.append(q)
                break
    return moduli


@pytest.mark.parametrize("n", [256, 2048, 8192])
def test_rns_forward_matches_singles(n):
    moduli = _basis(n, [50, 60, 29])
    rns = RnsNTT(n, moduli)
    rng = np.random.default_rng(7)
    x = np.stack([rng.integers(0, q, (2, n), dtype=np.uint64)
                  for q in moduli])
    for imf, omf in ((1, 1), (2, 4), (4, 4)):
        y = rns.forward(x, imf, omf)
        for i, q in enumerate(moduli):
            plan = get_plan(n, q)
            yi = from_limbs(jnp_ntt.fwd_ntt(to_limbs(x[i]), plan, imf, omf))
            _assert_matches(y[i], yi, q, omf)


@pytest.mark.parametrize("n", [256, 2048, 8192])
def test_rns_inverse_matches_singles(n):
    moduli = _basis(n, [50, 60, 29])
    rns = RnsNTT(n, moduli)
    rng = np.random.default_rng(8)
    y = np.stack([rng.integers(0, q, (2, n), dtype=np.uint64)
                  for q in moduli])
    for imf, omf in ((1, 1), (2, 2)):
        z = rns.inverse(y, imf, omf)
        for i, q in enumerate(moduli):
            plan = get_plan(n, q)
            zi = from_limbs(jnp_ntt.inv_ntt(to_limbs(y[i]), plan, imf, omf))
            _assert_matches(z[i], zi, q, omf)


def test_rns_roundtrip():
    n = 2048
    moduli = _basis(n, [45, 50])
    rns = RnsNTT(n, moduli)
    rng = np.random.default_rng(9)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
    back = rns.inverse(rns.forward(x))
    np.testing.assert_array_equal(back, x)


def test_rns_plan_rejects_duplicates():
    n = 1024
    q = nt.generate_primes(1, 45, True, n)[0]
    with pytest.raises(ValueError):
        RnsNttPlan(n, [q, q])


def test_rns_rejects_wrong_basis_axis():
    n = 1024
    moduli = _basis(n, [45, 50])
    rns = RnsNTT(n, moduli)
    bad = np.zeros((3, n), dtype=np.uint64)  # 3 rows for a 2-prime basis
    with pytest.raises(ValueError):
        rns.forward(bad)


def test_rns_debug_bounds(monkeypatch):
    monkeypatch.setenv("HEXL_TPU_DEBUG", "1")
    n = 1024
    moduli = _basis(n, [45, 50])
    rns = RnsNTT(n, moduli)
    bad = np.stack([np.full(n, q, dtype=np.uint64) for q in moduli])
    with pytest.raises(ValueError):
        rns.forward(bad)  # == q is out of range for IMF=1


def test_rns_plan_cache_concurrent_single_instance():
    """Concurrent first-touch of the same (degree, moduli) must yield one
    shared RnsNttPlan (the cache is documented thread-safe; an unlocked
    check-then-set would build duplicate device twiddle stacks)."""
    import threading

    from hexl_tpu.ntt import clear_plan_cache
    from hexl_tpu.ntt.rns import get_rns_plan

    n = 1 << 8
    moduli = tuple(nt.generate_primes(3, 30, True, n))
    clear_plan_cache()
    got = []
    barrier = threading.Barrier(8)

    def grab():
        barrier.wait()
        got.append(get_rns_plan(n, moduli))

    threads = [threading.Thread(target=grab) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(got) == 8
    assert all(p is got[0] for p in got)
