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


# --- per-op negative tests (debug-mode coverage parity: every public
# eltwise op validates under HEXL_TPU_DEBUG=1; reference check.hpp usage
# across hexl/eltwise/*.cpp) ---

def test_sub_mod_bounds(debug_mode):
    from hexl_tpu.eltwise import eltwise_sub_mod
    q = 97
    good = np.array([0, 96], dtype=np.uint64)
    bad = np.array([97], dtype=np.uint64)
    eltwise_sub_mod(good, good, q)
    with pytest.raises(ValueError):
        eltwise_sub_mod(bad, good[:1], q)
    with pytest.raises(ValueError):
        eltwise_sub_mod(good, 97, q)  # scalar operand2 >= q


def test_fma_mod_bounds(debug_mode):
    from hexl_tpu.eltwise import eltwise_fma_mod
    q = 101
    good = np.array([0, 100], dtype=np.uint64)
    with pytest.raises(ValueError):
        eltwise_fma_mod(good, 3, None, q, input_mod_factor=3)
    with pytest.raises(ValueError):
        eltwise_fma_mod(np.array([101], dtype=np.uint64), 3, None, q, 1)
    with pytest.raises(ValueError):
        eltwise_fma_mod(good, 101, None, q, 1)  # arg2 out of range
    with pytest.raises(ValueError):
        eltwise_fma_mod(good, 3, np.array([101, 0], dtype=np.uint64), q, 1)
    eltwise_fma_mod(good, 3, good, q, 1)


def test_reduce_mod_args(debug_mode):
    from hexl_tpu.eltwise import eltwise_reduce_mod
    q = 97
    good = np.array([0, 96], dtype=np.uint64)
    with pytest.raises(ValueError):
        eltwise_reduce_mod(good, q, 3, 1)  # bad IMF
    with pytest.raises(ValueError):
        eltwise_reduce_mod(good, q, 2, 2)  # IMF == OMF
    with pytest.raises(ValueError):
        eltwise_reduce_mod(np.array([2 * 97], dtype=np.uint64), q, 2, 1)
    eltwise_reduce_mod(good, q, 2, 1)


def test_cmp_ops_args(debug_mode):
    from hexl_tpu.eltwise import eltwise_cmp_add, eltwise_cmp_sub_mod
    a = np.array([5, 10], dtype=np.uint64)
    with pytest.raises(ValueError):
        eltwise_cmp_add(a, "true", 7, 0)  # diff == 0
    with pytest.raises(ValueError):
        eltwise_cmp_sub_mod(a, 97, "true", 7, 0)  # diff == 0
    eltwise_cmp_add(a, "true", 7, 1)
    eltwise_cmp_sub_mod(a, 97, "true", 7, 1)


def test_montgomery_bounds(debug_mode):
    from hexl_tpu.eltwise import (eltwise_montgomery_form_in,
                                  eltwise_montgomery_form_out,
                                  eltwise_montgomery_mult_reduce)
    q = 97
    good = np.array([0, 96], dtype=np.uint64)
    bad = np.array([97], dtype=np.uint64)
    with pytest.raises(ValueError):
        eltwise_montgomery_form_in(bad, q)
    with pytest.raises(ValueError):
        eltwise_montgomery_form_out(bad, q)
    with pytest.raises(ValueError):
        eltwise_montgomery_mult_reduce(good, bad[:1] * 0 + 97, q)
    with pytest.raises(ValueError):
        eltwise_montgomery_form_in(good, 96)  # even modulus
    eltwise_montgomery_form_in(good, q)


def test_env_switch_validation(monkeypatch):
    """Invalid dispatch env values raise instead of silently running the
    default (a silent coercion lets an A/B measure the default twice)."""
    monkeypatch.setenv("HEXL_TPU_NTT_BACKEND", "palas")
    with pytest.raises(ValueError):
        config.ntt_backend()
    monkeypatch.setenv("HEXL_TPU_NTT_BACKEND", "pallas")
    assert config.ntt_backend() == "pallas"
    monkeypatch.setenv("HEXL_TPU_NTT_RADIX", "3")
    with pytest.raises(ValueError):
        config.ntt_radix()
    monkeypatch.setenv("HEXL_TPU_NTT_RADIX", "8")
    assert config.ntt_radix() == (8, 8)
    monkeypatch.setenv("HEXL_TPU_NTT_RADIX", "16,4")
    assert config.ntt_radix() == (16, 4)
    monkeypatch.setenv("HEXL_TPU_FFT_RADIX", "radix4")
    with pytest.raises(ValueError):
        config.fft_radix()
    monkeypatch.setenv("HEXL_TPU_FFT_RADIX", "4")
    assert config.fft_radix() == (4, 4)
    monkeypatch.setenv("HEXL_TPU_FFT_RADIX", "16,8")
    assert config.fft_radix() == (16, 8)
    monkeypatch.delenv("HEXL_TPU_FFT_RADIX")
    # Unset -> None: the walkers resolve measured per-backend,
    # per-direction, per-size defaults (fft_like._fft_radix).
    assert config.fft_radix() is None
    from hexl_tpu.experimental.fft_like import _fft_radix
    ra, rb = _fft_radix(4096, forward=True)
    assert ra in (2, 4, 8, 16, 32, 64, 128) and rb in (2, 4, 8, 16, 32,
                                                       64, 128)
    assert _fft_radix(512, forward=False) == (2, 2)  # below MIN_2D_N
    monkeypatch.setenv("HEXL_TPU_DIST_OVERLAP", "two")
    with pytest.raises(ValueError):
        config.dist_overlap_slices()


def test_trace_config_keys_jit_caches(monkeypatch):
    """Toggling a dispatch env mid-process must change trace_config() —
    every jit cache includes it in its key, so the toggle retraces
    instead of silently reusing the first-traced configuration."""
    monkeypatch.setenv("HEXL_TPU_NTT_RADIX", "2")
    cfg2 = config.trace_config()
    monkeypatch.setenv("HEXL_TPU_NTT_RADIX", "4")
    cfg4 = config.trace_config()
    assert cfg2 != cfg4

    # And the dispatch stays correct across a mid-process radix toggle.
    n, q = 1 << 13, nt.generate_primes(1, 45, True, 1 << 13)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(7)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    monkeypatch.setenv("HEXL_TPU_NTT_RADIX", "2")
    y2 = np.asarray(ntt.forward(x))
    monkeypatch.setenv("HEXL_TPU_NTT_RADIX", "4")
    y4 = np.asarray(ntt.forward(x))
    np.testing.assert_array_equal(y2, y4)


def test_prewarm_populates_and_runs():
    """hexl_tpu.prewarm compiles the four staged entry points per config
    and returns timing records (cold-start mitigation, ROADMAP)."""
    import hexl_tpu

    recs = hexl_tpu.prewarm([(64, 30)], batch=1, verbose=False)
    assert [(r[0], r[2]) for r in recs] == [(64, "xla")]
    assert recs[0][3] >= 0
