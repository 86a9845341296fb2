"""Debug validation + logging tests (negative tests mirror the reference's
debug-only HEXL_CHECK tests, test-ntt.cpp:21-94)."""

import numpy as np
import pytest

import hexl_tpu.config as config
from hexl_tpu import nt
from hexl_tpu.eltwise import eltwise_add_mod, eltwise_mult_mod
from hexl_tpu.ntt import NTT
from hexl_tpu.utils import check_bounds, vlog


@pytest.fixture
def debug_mode(monkeypatch):
    monkeypatch.setenv("HEXL_TPU_DEBUG", "1")
    yield


def test_checks_are_noops_in_release():
    # Out-of-range input passes through unvalidated (release contract).
    a = np.array([100, 200], dtype=np.uint64)
    eltwise_add_mod(a, a, 7)  # no exception


def test_add_mod_bounds(debug_mode):
    q = 97
    good = np.array([0, 96], dtype=np.uint64)
    bad = np.array([97], dtype=np.uint64)
    eltwise_add_mod(good, good, q)
    with pytest.raises(ValueError):
        eltwise_add_mod(bad, good[:1], q)


def test_mult_mod_bounds(debug_mode):
    q = nt.generate_primes(1, 30, True)[0]
    bad = np.array([2 * q], dtype=np.uint64)
    with pytest.raises(ValueError):
        eltwise_mult_mod(bad, bad, q, 1)
    eltwise_mult_mod(bad, bad, q, 4)  # allowed at IMF=4


def test_ntt_input_bounds(debug_mode):
    n = 64
    q = nt.generate_primes(1, 30, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    bad = np.full(n, 2 * q, dtype=np.uint64)
    with pytest.raises(ValueError):
        ntt.forward(bad, 1, 1)
    ntt.forward(bad, 4, 1)  # fine at IMF=4


def test_check_bounds_u64(debug_mode):
    from hexl_tpu.limb import to_limbs
    x = to_limbs(np.array([5, 6], dtype=np.uint64))
    check_bounds(x, 7, "ok")
    with pytest.raises(ValueError):
        check_bounds(x, 6, "too big")


def test_vlog(monkeypatch, caplog):
    monkeypatch.setenv("HEXL_TPU_VLOG", "3")
    import logging
    with caplog.at_level(logging.INFO, logger="hexl_tpu"):
        vlog(3, "hello %d", 42)
        vlog(5, "hidden")
    assert any("hello 42" in r.message for r in caplog.records)
    assert not any("hidden" in r.message for r in caplog.records)
