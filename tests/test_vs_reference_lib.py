"""Cross-check hexl_tpu against the ACTUAL compiled reference library.

Everything else in tests/ compares against hexl_tpu's own NumPy oracle
(ref.py) plus golden vectors ported from the reference's GTest suite. This
module closes the loop: it drives random inputs through the unmodified
intel/hexl sources (compiled by benchmarks/reference_baseline/build.sh into
a stdin/stdout subprocess driver, crosscheck_reference.cpp) and asserts our
public API matches: bit-identical for fully-reduced outputs, congruent mod q
within the documented range for lazy outputs (which golden vectors, all
OMF=1, never exercise; see assert_lazy_equal for why lazy representatives
legitimately differ).

Skipped when /root/reference or a working g++ toolchain is absent.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from hexl_tpu import nt
from hexl_tpu.eltwise import (eltwise_add_mod, eltwise_cmp_add,
                              eltwise_cmp_sub_mod, eltwise_fma_mod,
                              eltwise_mult_mod, eltwise_reduce_mod,
                              eltwise_sub_mod)
from hexl_tpu.ntt import NTT

REF = os.environ.get("HEXL_TPU_REFERENCE", "/root/reference")
BUILD_SH = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "reference_baseline", "build.sh")
BIN = os.path.join(os.environ.get("HEXL_REF_BUILD", "/tmp/hexl_ref_build"),
                   "crosscheck_reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF) or shutil.which("g++") is None,
    reason="reference sources or g++ unavailable")

# CMPINT enum values (reference hexl/include/hexl/util/util.hpp:16-27).
CMPINT = {"eq": 0, "lt": 1, "le": 2, "false": 3, "ne": 4, "nlt": 5,
          "nle": 6, "true": 7}


@pytest.fixture(scope="session")
def crosscheck_bin():
    if not os.path.exists(BIN):
        try:
            subprocess.run(["bash", BUILD_SH, "crosscheck"], check=True,
                           capture_output=True, timeout=600)
        except (subprocess.CalledProcessError,
                subprocess.TimeoutExpired) as e:
            pytest.skip(f"reference crosscheck build failed: {e}")
    return BIN


def run_ref(binary, op, *args, arrays=()):
    """Run one reference op; args are scalars, arrays go to stdin."""
    payload = b"".join(np.ascontiguousarray(a, dtype=np.uint64).tobytes()
                       for a in arrays)
    proc = subprocess.run([binary, op] + [str(int(a)) for a in args],
                          input=payload, capture_output=True, timeout=120)
    assert proc.returncode == 0, proc.stderr.decode()
    return np.frombuffer(proc.stdout, dtype=np.uint64)


def _rng(*key):
    return np.random.default_rng(abs(hash(key)) % (2**32))


def assert_lazy_equal(got, want, q, omf):
    """OMF=1 outputs are bit-exact. Lazy outputs are compared mod q with a
    range bound: the reference's own AVX512 and native kernels pick
    different (congruent) lazy representatives, and its GTest suite
    likewise reduces before comparing (test/test-ntt.cpp CheckNTTResults).
    """
    got = np.asarray(got)
    if omf == 1:
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_array_equal(got % q, want % q)
        assert int(got.max()) < omf * q


@pytest.mark.parametrize("n", [64, 1024, 4096])
@pytest.mark.parametrize("q_bits", [29, 45, 60])
@pytest.mark.parametrize("imf,omf", [(1, 1), (2, 4), (4, 4)])
def test_fwd_ntt_vs_reference(crosscheck_bin, n, q_bits, imf, omf):
    q = nt.generate_primes(1, q_bits, True, n)[0]
    rng = _rng("fwd", n, q_bits, imf)
    x = rng.integers(0, imf * q, size=n, dtype=np.uint64)
    want = run_ref(crosscheck_bin, "fwd_ntt", n, q, imf, omf, arrays=[x])
    got = NTT(n, q).forward(x, imf, omf)
    assert_lazy_equal(got, want, q, omf)


@pytest.mark.parametrize("n", [64, 1024, 4096])
@pytest.mark.parametrize("q_bits", [29, 45, 60])
@pytest.mark.parametrize("imf,omf", [(1, 1), (2, 2)])
def test_inv_ntt_vs_reference(crosscheck_bin, n, q_bits, imf, omf):
    q = nt.generate_primes(1, q_bits, True, n)[0]
    rng = _rng("inv", n, q_bits, imf)
    x = rng.integers(0, imf * q, size=n, dtype=np.uint64)
    want = run_ref(crosscheck_bin, "inv_ntt", n, q, imf, omf, arrays=[x])
    got = NTT(n, q).inverse(x, imf, omf)
    assert_lazy_equal(got, want, q, omf)


@pytest.mark.parametrize("q_bits", [20, 29, 45, 50, 60])
@pytest.mark.parametrize("imf", [1, 2, 4])
def test_mult_mod_vs_reference(crosscheck_bin, q_bits, imf):
    q = nt.generate_primes(1, q_bits, True)[0]
    if imf * q >= (1 << 63):
        pytest.skip("IMF * q out of range")
    rng = _rng("mult", q_bits, imf)
    a = rng.integers(0, imf * q, size=1024, dtype=np.uint64)
    b = rng.integers(0, imf * q, size=1024, dtype=np.uint64)
    want = run_ref(crosscheck_bin, "mult_mod", 1024, q, imf, arrays=[a, b])
    np.testing.assert_array_equal(eltwise_mult_mod(a, b, q, imf), want)


@pytest.mark.parametrize("q_bits", [29, 60])
def test_add_sub_mod_vs_reference(crosscheck_bin, q_bits):
    q = nt.generate_primes(1, q_bits, True)[0]
    rng = _rng("addsub", q_bits)
    a = rng.integers(0, q, size=777, dtype=np.uint64)
    b = rng.integers(0, q, size=777, dtype=np.uint64)
    s = int(rng.integers(1, q))
    np.testing.assert_array_equal(
        eltwise_add_mod(a, b, q),
        run_ref(crosscheck_bin, "add_mod", 777, q, arrays=[a, b]))
    np.testing.assert_array_equal(
        eltwise_sub_mod(a, b, q),
        run_ref(crosscheck_bin, "sub_mod", 777, q, arrays=[a, b]))
    np.testing.assert_array_equal(
        eltwise_add_mod(a, s, q),
        run_ref(crosscheck_bin, "add_mod_scalar", 777, q, s, arrays=[a]))
    np.testing.assert_array_equal(
        eltwise_sub_mod(a, s, q),
        run_ref(crosscheck_bin, "sub_mod_scalar", 777, q, s, arrays=[a]))


@pytest.mark.parametrize("q_bits", [29, 50, 60])
@pytest.mark.parametrize("imf", [1, 2, 4, 8])
@pytest.mark.parametrize("with_addend", [True, False])
def test_fma_mod_vs_reference(crosscheck_bin, q_bits, imf, with_addend):
    q = nt.generate_primes(1, q_bits, True)[0]
    if imf * q >= (1 << 63):
        pytest.skip("IMF * q out of range")
    rng = _rng("fma", q_bits, imf, with_addend)
    a = rng.integers(0, imf * q, size=512, dtype=np.uint64)
    s = int(rng.integers(0, q))
    arrays = [a]
    arg3 = None
    if with_addend:
        arg3 = rng.integers(0, imf * q, size=512, dtype=np.uint64)
        arrays.append(arg3)
    want = run_ref(crosscheck_bin, "fma_mod", 512, q, imf, s,
                   int(with_addend), arrays=arrays)
    np.testing.assert_array_equal(eltwise_fma_mod(a, s, arg3, q, imf), want)


@pytest.mark.parametrize("q_bits", [29, 60])
@pytest.mark.parametrize("imf,omf", [(2, 1), (4, 1), (4, 2), ("q", 1)])
def test_reduce_mod_vs_reference(crosscheck_bin, q_bits, imf, omf):
    q = nt.generate_primes(1, q_bits, True)[0]
    imf_v = q if imf == "q" else imf
    if imf != "q" and imf_v * q >= (1 << 63):
        pytest.skip("IMF * q out of range")
    rng = _rng("reduce", q_bits, imf, omf)
    hi = (1 << 62) if imf == "q" else imf_v * q
    a = rng.integers(0, hi, size=512, dtype=np.uint64)
    want = run_ref(crosscheck_bin, "reduce_mod", 512, q, imf_v, omf,
                   arrays=[a])
    np.testing.assert_array_equal(eltwise_reduce_mod(a, q, imf_v, omf), want)


@pytest.mark.parametrize("cmp", sorted(CMPINT))
def test_cmp_add_vs_reference(crosscheck_bin, cmp):
    rng = _rng("cmpadd", cmp)
    a = rng.integers(0, 1 << 61, size=333, dtype=np.uint64)
    bound = int(rng.integers(0, 1 << 61))
    diff = int(rng.integers(1, 1 << 59))
    want = run_ref(crosscheck_bin, "cmp_add", 333, CMPINT[cmp], bound, diff,
                   arrays=[a])
    np.testing.assert_array_equal(eltwise_cmp_add(a, cmp, bound, diff), want)


@pytest.mark.parametrize("cmp", sorted(CMPINT))
def test_cmp_sub_mod_vs_reference(crosscheck_bin, cmp):
    q = nt.generate_primes(1, 45, True)[0]
    rng = _rng("cmpsub", cmp)
    a = rng.integers(0, 2 * q, size=333, dtype=np.uint64)
    bound = int(rng.integers(0, 2 * q))
    diff = int(rng.integers(1, q))
    want = run_ref(crosscheck_bin, "cmp_sub_mod", 333, q, CMPINT[cmp],
                   bound, diff, arrays=[a])
    np.testing.assert_array_equal(
        eltwise_cmp_sub_mod(a, q, cmp, bound, diff), want)


# Regime-boundary density vs the COMPILED reference (the reference's own
# equivalence grid runs modulus bits {27..33, 48..51, 58..60},
# test/include/test/test-ntt-util.hpp:131-159). One strict and one lazy
# signature per bit-width at a flat-path and a 2D-path degree.
@pytest.mark.parametrize("q_bits",
                         [27, 28, 30, 31, 32, 33, 48, 50, 51, 58, 59, 61])
@pytest.mark.parametrize("n", [32, 2048])
def test_regime_boundary_vs_reference(crosscheck_bin, n, q_bits):
    q = nt.generate_primes(1, q_bits, True, n)[0]
    rng = _rng("grid", n, q_bits, 0)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    ntt = NTT(n, q)
    want = run_ref(crosscheck_bin, "fwd_ntt", n, q, 1, 1, arrays=[x])
    np.testing.assert_array_equal(ntt.forward(x, 1, 1), want)
    want4 = run_ref(crosscheck_bin, "fwd_ntt", n, q, 4, 4,
                    arrays=[(x + np.uint64(q)) % np.uint64(4 * q)])
    got4 = ntt.forward((x + np.uint64(q)) % np.uint64(4 * q), 4, 4)
    assert_lazy_equal(got4, want4, q, 4)
    want_i = run_ref(crosscheck_bin, "inv_ntt", n, q, 1, 1, arrays=[want])
    np.testing.assert_array_equal(ntt.inverse(np.asarray(want), 1, 1),
                                  want_i)
