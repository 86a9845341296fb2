"""Device NTT tests: staged limb NTT vs the oracle, golden vectors, ranges."""

import numpy as np
import pytest

from hexl_tpu import nt, ref
from hexl_tpu.ntt import NTT
from tests.test_ref_ntt import GOLDEN


@pytest.mark.parametrize("n,q,inp,expected", GOLDEN)
def test_golden_vectors(n, q, inp, expected):
    ntt = NTT(n, q)
    x = np.array(inp, dtype=np.uint64)
    out = ntt.forward(x, 1, 1)
    np.testing.assert_array_equal(out, np.array(expected, dtype=np.uint64))
    # Lazy variant reduced mod q must agree (reference test-ntt.cpp:245-251)
    out4 = ntt.forward(x, 2, 4)
    np.testing.assert_array_equal(out4 % np.uint64(q),
                                  np.array(expected, dtype=np.uint64))
    assert np.all(out4 < np.uint64(4 * q))
    back = ntt.inverse(out, 1, 1)
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("log_n", [1, 3, 6, 9, 10, 12, 14])
@pytest.mark.parametrize("q_bits", [30, 50, 60])
def test_random_vs_oracle(log_n, q_bits):
    n = 1 << log_n
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(log_n * 100 + q_bits)
    x = rng.integers(0, q, size=n, dtype=np.uint64)

    rop, irop = ntt.plan.rop, ntt.plan.irop
    prop, pirop = ntt.plan.prop, ntt.plan.pirop

    got = ntt.forward(x, 1, 1)
    exp = ref.fwd_ntt_radix2(x, q, rop, prop, 1, 1)
    np.testing.assert_array_equal(got, exp)
    back = ntt.inverse(got, 1, 1)
    np.testing.assert_array_equal(back, x)


# Full input/output mod-factor matrix on one flat-path and one 2D-path size
# (the per-(imf, omf) variants are separate jit graphs — keep this matrix
# to two degrees to bound compile time; ranges are asserted bit-exactly).
@pytest.mark.parametrize("n", [64, 4096])
@pytest.mark.parametrize("q_bits", [50, 60])
def test_mod_factor_matrix(n, q_bits):
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(n + q_bits)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    rop, irop = ntt.plan.rop, ntt.plan.irop
    prop, pirop = ntt.plan.prop, ntt.plan.pirop

    # On the TPU backend lazy outputs use approximate-mulhi Shoup
    # butterflies (BOTH the XLA-staged default and the Pallas kernels
    # since round 3): values agree mod q within the declared range but
    # not bit-for-bit — the reference's own AVX512 testing model
    # (reduce % q and check the range, test-ntt-avx512.cpp:377-387).
    # The exact path (CPU, or HEXL_TPU_DISABLE_APPROX=1) is bit-exact.
    from hexl_tpu import config as _cfg
    lazy_exact = not _cfg.approx_butterflies()

    def check(got, exp, omf_bound, msg):
        got = np.asarray(got)
        if lazy_exact:
            np.testing.assert_array_equal(got, exp, err_msg=msg)
        else:
            np.testing.assert_array_equal(got % np.uint64(q),
                                          exp % np.uint64(q), err_msg=msg)
            assert got.max() < omf_bound * q, msg

    for imf in (1, 2, 4):
        for omf in (1, 4):
            got = ntt.forward(x, imf, omf)
            exp = ref.fwd_ntt_radix2(x, q, rop, prop, imf, omf)
            check(got, exp, omf, f"fwd imf={imf} omf={omf}")
    y = ref.fwd_ntt_radix2(x, q, rop, prop, 1, 1)
    for imf in (1, 2):
        for omf in (1, 2):
            got = ntt.inverse(y, imf, omf)
            exp = ref.inv_ntt_radix2(y, q, irop, pirop, imf, omf)
            check(got, exp, omf, f"inv imf={imf} omf={omf}")


def test_batched():
    n, q_bits = 2048, 45
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=(3, 5, n), dtype=np.uint64)
    got = ntt.forward(x, 1, 1)
    for i in range(3):
        for j in range(5):
            exp = ref.fwd_ntt_radix2(x[i, j], q, ntt.plan.rop,
                                     ntt.plan.prop, 1, 1)
            np.testing.assert_array_equal(got[i, j], exp)
    back = ntt.inverse(got, 1, 1)
    np.testing.assert_array_equal(back, x)


def test_lazy_input_forward():
    n = 4096
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(1)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    x4 = x + np.uint64(q) * rng.integers(0, 4, size=n, dtype=np.uint64)
    exp = ntt.forward(x, 1, 1)
    np.testing.assert_array_equal(ntt.forward(x4, 4, 1), exp)


def test_check_arguments():
    with pytest.raises(ValueError):
        NTT(100, 769)          # not a power of two
    with pytest.raises(ValueError):
        NTT(4, 1 << 63)        # modulus too large
    with pytest.raises(ValueError):
        NTT(256, 769)          # 769 != 1 mod 512
    with pytest.raises(ValueError):
        NTT(4, 9)              # 9 = 1 mod 8 but not prime


def test_poly_mult_pipeline():
    """Minimum end-to-end slice: fwd -> mult -> inv equals negacyclic conv."""
    from hexl_tpu.eltwise import eltwise_mult_mod
    n = 4096
    q = nt.generate_primes(1, 45, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(2)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    fa = ntt.forward(a, 1, 1)
    fb = ntt.forward(b, 1, 1)
    c = ntt.inverse(eltwise_mult_mod(fa, fb, q), 1, 1)
    # Oracle computes the same pipeline
    fa_o = ref.fwd_ntt_radix2(a, q, ntt.plan.rop, ntt.plan.prop, 1, 1)
    fb_o = ref.fwd_ntt_radix2(b, q, ntt.plan.rop, ntt.plan.prop, 1, 1)
    c_o = ref.inv_ntt_radix2(ref.eltwise_mult_mod(fa_o, fb_o, q), q,
                             ntt.plan.irop, ntt.plan.pirop, 1, 1)
    np.testing.assert_array_equal(c, c_o)


@pytest.mark.parametrize("q_bits", [20, 27, 29])
def test_32bit_fast_path(q_bits):
    """q < 2^30 engages the single-limb path: OMF=1 bit-exact, lazy
    outputs mod-q-equal within range (the DQ-32 testing contract)."""
    n = 4096
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    assert q < (1 << 30)
    ntt = NTT(n, q)
    assert ntt.plan.bit_shift == 32
    rng = np.random.default_rng(q_bits)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    exp = ref.fwd_ntt_radix2(x, q, ntt.plan.rop, ntt.plan.prop, 1, 1)
    got = ntt.forward(x, 1, 1)
    np.testing.assert_array_equal(got, exp)
    lazy = ntt.forward(x, 2, 4)
    assert np.all(lazy < np.uint64(4 * q))
    np.testing.assert_array_equal(lazy % np.uint64(q), exp)
    back = ntt.inverse(got, 1, 1)
    np.testing.assert_array_equal(back, x)
    back2 = ntt.inverse(got, 2, 2)
    assert np.all(back2 < np.uint64(2 * q))
    np.testing.assert_array_equal(back2 % np.uint64(q), x)
    # batched
    xb = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    np.testing.assert_array_equal(
        ntt.inverse(ntt.forward(xb, 1, 1), 1, 1), xb)


def test_fused_poly_mult_mod():
    from hexl_tpu.poly import poly_mult_mod, rns_poly_mult_mod
    n = 2048
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    rng = np.random.default_rng(5)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    got = poly_mult_mod(a, b, n, q)
    ntt = NTT(n, q)
    fa = ref.fwd_ntt_radix2(a, q, ntt.plan.rop, ntt.plan.prop, 1, 1)
    fb = ref.fwd_ntt_radix2(b, q, ntt.plan.rop, ntt.plan.prop, 1, 1)
    exp = ref.inv_ntt_radix2(ref.eltwise_mult_mod(fa, fb, q), q,
                             ntt.plan.irop, ntt.plan.pirop, 1, 1)
    np.testing.assert_array_equal(got, exp)
    # RNS variant over 3 primes, batched
    primes = nt.generate_primes(3, 45, True, ntt_size=n)
    ar = np.stack([a % np.uint64(p) for p in primes])
    br = np.stack([b % np.uint64(p) for p in primes])
    got_rns = rns_poly_mult_mod(ar, br, n, primes)
    for i, p in enumerate(primes):
        pn = NTT(n, p)
        fa = ref.fwd_ntt_radix2(ar[i], p, pn.plan.rop, pn.plan.prop, 1, 1)
        fb = ref.fwd_ntt_radix2(br[i], p, pn.plan.rop, pn.plan.prop, 1, 1)
        exp = ref.inv_ntt_radix2(ref.eltwise_mult_mod(fa, fb, p), p,
                                 pn.plan.irop, pn.plan.pirop, 1, 1)
        np.testing.assert_array_equal(got_rns[i], exp)


def test_pallas_size_gate_falls_back(monkeypatch):
    """Degrees above the fused kernel's VMEM ceiling must transparently
    use the staged XLA body (bit-identical results). The real ceiling is
    2^15 (Mosaic scoped-vmem OOM at 2^16 on v5e); we lower it here so the
    gate itself is exercised cheaply."""
    from hexl_tpu.limb import from_limbs, to_limbs
    from hexl_tpu.ntt import get_plan, jnp_ntt, pallas_ntt

    monkeypatch.setattr(pallas_ntt, "PALLAS_MAX_N_FWD", 1024)
    monkeypatch.setattr(pallas_ntt, "PALLAS_MAX_N_INV", 1024)
    n = 2048
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    plan = get_plan(n, q)
    rng = np.random.default_rng(9)
    x = to_limbs(rng.integers(0, q, size=n, dtype=np.uint64))
    got = pallas_ntt.fwd_ntt(x, plan, 1, 1)      # gated -> jnp body
    exp = jnp_ntt.fwd_ntt(x, plan, 1, 1)
    np.testing.assert_array_equal(from_limbs(got), from_limbs(exp))
    gi = pallas_ntt.inv_ntt(got, plan, 1, 1)
    np.testing.assert_array_equal(from_limbs(gi),
                                  from_limbs(x))


def test_plan_cache_save_load(tmp_path):
    """Disk round-trip of the plan cache (checkpoint/resume analogue)."""
    from hexl_tpu.ntt import plan as plan_mod

    n = 2048
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    p1 = plan_mod.get_plan(n, q)
    path = str(tmp_path / "plans.npz")
    assert plan_mod.save_plan_cache(path) >= 1

    plan_mod.clear_plan_cache()
    assert plan_mod.load_plan_cache(path) >= 1
    p2 = plan_mod.get_plan(n, q)
    assert p2 is not p1
    np.testing.assert_array_equal(p2.rop, p1.rop)
    np.testing.assert_array_equal(p2.pirop, p1.pirop)
    assert p2.root == p1.root and p2.inv_n_w == p1.inv_n_w

    # The restored plan drives a correct transform.
    ntt = NTT(n, q)
    rng = np.random.default_rng(11)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    np.testing.assert_array_equal(
        np.asarray(ntt.inverse(ntt.forward(x))), x)


def test_ntt_cost_model():
    from hexl_tpu.utils.profiling import ntt_cost
    c = ntt_cost(1 << 14, 60)
    assert c["butterflies"] == (1 << 13) * 14
    assert c["hbm_bytes_fused"] * 14 == c["hbm_bytes_staged"]
    assert ntt_cost(1 << 14, 29)["mul32_total"] < c["mul32_total"]


def test_plan_device_placement():
    """NTT(device=...) pins twiddle tables to a chosen device (the
    allocator-injection analogue)."""
    import jax
    devs = jax.devices()
    target = devs[-1]
    ntt = NTT(2048, nt.generate_primes(1, 45, True, ntt_size=2048)[0],
              device=target)
    m, t, w, wp = ntt.plan.fwd_a[0]
    assert w.hi.devices() == {target}
    assert ntt.plan.rop_dev.lo.devices() == {target}
    # still transforms correctly
    rng = np.random.default_rng(3)
    x = rng.integers(0, ntt.modulus, size=2048, dtype=np.uint64)
    np.testing.assert_array_equal(
        np.asarray(ntt.inverse(ntt.forward(x))), x)


def test_invalid_root_rejected():
    """A caller-supplied non-primitive root must raise, not silently
    produce wrong transforms."""
    from hexl_tpu.ntt.plan import NttPlan
    n = 64
    q = nt.generate_primes(1, 30, True, ntt_size=n)[0]
    with pytest.raises(ValueError, match="primitive"):
        NttPlan(n, q, root=5 if not nt.is_primitive_root(5, 2 * n, q)
                else 7)


def test_poly_mult_mixed_operand_forms():
    """Host numpy and device U64 operands can be mixed freely."""
    from hexl_tpu.limb import to_limbs, from_limbs, U64
    from hexl_tpu.poly import poly_mult_mod
    n = 2048
    q = nt.generate_primes(1, 45, True, ntt_size=n)[0]
    rng = np.random.default_rng(12)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    exp = poly_mult_mod(a, b, n, q)
    got_md = poly_mult_mod(to_limbs(a), b, n, q)      # device, host
    got_dm = poly_mult_mod(a, to_limbs(b), n, q)      # host, device
    np.testing.assert_array_equal(np.asarray(got_md), exp)
    np.testing.assert_array_equal(np.asarray(got_dm), exp)
    # all-device stays on device
    out = poly_mult_mod(to_limbs(a), to_limbs(b), n, q)
    assert isinstance(out, U64)
    np.testing.assert_array_equal(from_limbs(out), exp)


def test_pallas_batch_blocked_small_n(monkeypatch):
    """Small-N fused kernels pack several polys per grid step (kb > 1);
    interpret mode checks the blocked layout against the oracle."""
    import functools
    from jax.experimental import pallas as pl
    from hexl_tpu import nt as _nt, ref as _ref
    from hexl_tpu.limb import from_limbs as _fl, to_limbs as _tl
    from hexl_tpu.ntt import get_plan as _gp, pallas_ntt as _pn

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call,
                                             interpret=True))
    for n in (1 << 10, 1 << 12):
        q = _nt.generate_primes(1, 49, True, ntt_size=n)[0]
        plan = _gp(n, q)
        rng = np.random.default_rng(n)
        x = rng.integers(0, q, size=(32, n), dtype=np.uint64)  # kb > 1
        rop, irop, _ = _ref.root_of_unity_powers(n, q, plan.root)
        prop, pirop = _ref.precon64(rop, q), _ref.precon64(irop, q)
        want = np.stack([_ref.fwd_ntt_radix2(v, q, rop, prop, 1, 1)
                         for v in x])
        got = _fl(_pn.fwd_ntt(_tl(x), plan, 1, 1))
        np.testing.assert_array_equal(got % q, want)
        back = _fl(_pn.inv_ntt(_tl(got % q), plan, 1, 1))
        np.testing.assert_array_equal(back, x)


def test_radix4_walker_bit_exact(monkeypatch):
    """The radix-4 stage pairing must produce BIT-identical outputs to
    the radix-2 walker (same math, same order — only the materialization
    grouping differs). Reference: ntt-radix-4.cpp vs ntt-radix-2.cpp."""
    import hexl_tpu.config as _cfg
    from hexl_tpu.ntt import get_plan, jnp_ntt
    from hexl_tpu.limb import from_limbs, to_limbs
    for n, bits in ((1 << 12, 49), (1 << 13, 60)):
        q = nt.generate_primes(1, bits, True, ntt_size=n)[0]
        plan = get_plan(n, q)
        rng = np.random.default_rng(n)
        x = rng.integers(0, 4 * q, size=(3, n), dtype=np.uint64)
        xi = rng.integers(0, 2 * q, size=(3, n), dtype=np.uint64)
        monkeypatch.setattr(_cfg, "ntt_radix", lambda: 2)
        want = from_limbs(jnp_ntt.fwd_ntt(to_limbs(x), plan, 4, 4))
        want_i = from_limbs(jnp_ntt.inv_ntt(to_limbs(xi), plan, 2, 2))
        for radix in (4, 8, 16, (16, 4), (4, 16), (32, 8)):
            monkeypatch.setattr(_cfg, "ntt_radix", lambda r=radix: r)
            got = from_limbs(jnp_ntt.fwd_ntt(to_limbs(x), plan, 4, 4))
            got_i = from_limbs(jnp_ntt.inv_ntt(to_limbs(xi), plan, 2, 2))
            np.testing.assert_array_equal(got, want)
            np.testing.assert_array_equal(got_i, want_i)
        monkeypatch.setattr(_cfg, "ntt_radix", lambda: 2)


def test_packed_phase_b_bit_exact(monkeypatch):
    """The lane-packed phase-B walk (HEXL_TPU_NTT_PACK — kb = 128/lane_l
    polys folded into the lane axis for N < 2^14) is a pure lane
    permutation: outputs must be BIT-identical to the transposed walk,
    for both directions, across radixes and non-divisible batches
    (which fall back to the unpacked walk)."""
    import hexl_tpu.config as _cfg
    from hexl_tpu.ntt import get_plan, jnp_ntt
    from hexl_tpu.limb import from_limbs, to_limbs
    for n, bits, batch in ((1 << 10, 60, 32), (1 << 12, 49, 8),
                           (1 << 12, 49, 6), (1 << 13, 60, 4)):
        q = nt.generate_primes(1, bits, True, ntt_size=n)[0]
        plan = get_plan(n, q)
        rng = np.random.default_rng(n + batch)
        x = rng.integers(0, 4 * q, size=(batch, n), dtype=np.uint64)
        xi = rng.integers(0, 2 * q, size=(batch, n), dtype=np.uint64)
        res = {}
        for pack in ("0", "1"):
            monkeypatch.setattr(_cfg, "ntt_pack", lambda p=pack: p)
            res[pack] = (
                from_limbs(jnp_ntt.fwd_ntt(to_limbs(x), plan, 4, 4)),
                from_limbs(jnp_ntt.inv_ntt(to_limbs(xi), plan, 2, 2)))
        np.testing.assert_array_equal(res["1"][0], res["0"][0])
        np.testing.assert_array_equal(res["1"][1], res["0"][1])


def test_pallas_chunked_writeback_body(monkeypatch):
    """The chunked writeback bodies (the only form that fits scoped vmem
    at N=2^16) must match the oracle; _FORCE_REFS exercises them at a
    small N where interpret mode is fast, covering both the wide
    (tr >= _ROW_CHUNK, at 2^14) and narrow stage branches."""
    import functools
    from jax.experimental import pallas as pl
    from hexl_tpu import nt as _nt, ref as _ref
    from hexl_tpu.limb import from_limbs as _fl, to_limbs as _tl
    from hexl_tpu.ntt import get_plan as _gp, pallas_ntt as _pn

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call,
                                             interpret=True))
    monkeypatch.setattr(_pn, "_FORCE_REFS", True)
    n = 1 << 14
    q = _nt.generate_primes(1, 60, True, ntt_size=n)[0]
    plan = _gp(n, q)
    rng = np.random.default_rng(14)
    x = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    rop, irop, _ = _ref.root_of_unity_powers(n, q, plan.root)
    prop = _ref.precon64(rop, q)
    want = np.stack([_ref.fwd_ntt_radix2(v, q, rop, prop, 1, 1)
                     for v in x])
    got = _fl(_pn.fwd_ntt(_tl(x), plan, 1, 1))
    np.testing.assert_array_equal(got % q, want)
    g4 = _fl(_pn.fwd_ntt(_tl(x), plan, 4, 4))
    np.testing.assert_array_equal(g4 % q, want)
    back = _fl(_pn.inv_ntt(_tl(got % q), plan, 1, 1))
    np.testing.assert_array_equal(back, x)
    b2 = _fl(_pn.inv_ntt(_tl(got % q), plan, 2, 2))
    np.testing.assert_array_equal(b2 % q, x)


def test_approx_butterflies_forced_on_cpu(monkeypatch):
    """The TPU backend traces approximate-mulhi Shoup butterflies
    (config.approx_butterflies). Force that dispatch on CPU: fully
    reduced outputs (OMF=1) must stay bit-identical to the exact oracle,
    and OMF=4 lazy outputs must agree mod q within the declared range —
    the reference's own AVX512 testing model. trace_config() keying makes
    the mid-process toggle retrace rather than reuse the exact trace."""
    from hexl_tpu import config as _cfg
    from hexl_tpu import ref

    n, q_bits = 4096, 60
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(97)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    exp1 = ref.fwd_ntt_radix2(x, q, ntt.plan.rop, ntt.plan.prop, 1, 1)
    exp4 = ref.fwd_ntt_radix2(x, q, ntt.plan.rop, ntt.plan.prop, 1, 4)

    monkeypatch.setattr(_cfg, "approx_butterflies", lambda: True)
    got1 = np.asarray(ntt.forward(x, 1, 1))
    np.testing.assert_array_equal(got1, exp1)
    got4 = np.asarray(ntt.forward(x, 1, 4))
    assert got4.max() < 4 * q
    np.testing.assert_array_equal(got4 % q, exp4 % q)
    back = np.asarray(ntt.inverse(got1, 1, 1))
    np.testing.assert_array_equal(back, x)


# Lean-scheme selection boundaries. generate_primes(1, b) returns
# q in (2^b, 2^(b+1)) (the reference's convention), so q_bits 59 picks
# the one-halver lean16 scheme (q < 2^60, n >= LEAN16_MIN_N; lean8
# below the size threshold), 60 the two-halver lean8 scheme (q < 2^61
# — the headline family), and 61 the exact Harvey forms (q >= 2^61:
# 8q no longer fits u64, no approximation at all).
# Contract: OMF=1/roundtrip bit-identical to the oracle; lazy outputs
# in-range and mod-q equal. test_bflys3_scheme_selection pins the
# selector itself (the round-4 verdict found the map off by one at
# exactly the headline modulus with no test catching it).
@pytest.mark.parametrize("n", [64, 4096])
@pytest.mark.parametrize("q_bits", [59, 60, 61])
def test_lean16_scheme_forced_on_cpu(n, q_bits, monkeypatch):
    from hexl_tpu import config as _cfg
    from hexl_tpu import ref

    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(n + q_bits)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    exp1 = ref.fwd_ntt_radix2(x, q, ntt.plan.rop, ntt.plan.prop, 1, 1)

    monkeypatch.setattr(_cfg, "approx_butterflies", lambda: True)
    got1 = np.asarray(ntt.forward(x, 1, 1))
    np.testing.assert_array_equal(got1, exp1)
    got4 = np.asarray(ntt.forward(x, 1, 4))
    assert got4.max() < 4 * q
    np.testing.assert_array_equal(got4 % q, exp1)
    # IMF=4 lazy input (the key-switch chain shape) through the widened
    # invariant: x + 3q < 4q is congruent to x, so OMF=1 output must be
    # bit-identical to the plain transform of x.
    x4 = np.asarray(ntt.forward(x + np.uint64(3) * np.uint64(q), 4, 1))
    np.testing.assert_array_equal(x4, exp1)
    back2 = np.asarray(ntt.inverse(got1, 1, 2))
    assert back2.max() < 2 * q
    np.testing.assert_array_equal(back2 % q, x)
    np.testing.assert_array_equal(np.asarray(ntt.inverse(got1, 1, 1)), x)


@pytest.mark.parametrize("q_bits,want_big,want_small",
                         [(49, "lean16", "lean8"), (59, "lean16", "lean8"),
                          (60, "lean8", "lean8"), (61, "exact", "exact")])
def test_bflys3_scheme_selection(q_bits, want_big, want_small, monkeypatch):
    """Assert which butterfly scheme the bodies actually select for the
    prime generate_primes returns at each bit width, via the shared
    scheme_gates(q, n) helper (the round-4 verdict found the headline
    q_bits=60 silently running a weaker scheme than documented because
    no test pinned this mapping). The map is 2-D since round 5: below
    LEAN16_MIN_N the transform is layout-bound and lean16's wider
    invariant loses to lean8 even where it is valid (measured,
    benchmarks/smalln_49_profile_results.json) — so small N prefers
    lean8 wherever any approximate scheme is legal."""
    from hexl_tpu import config as _cfg
    from hexl_tpu.ntt import jnp_ntt as _j

    monkeypatch.setattr(_cfg, "approx_butterflies", lambda: True)
    for n, want in ((_j.LEAN16_MIN_N, want_big),
                    (_j.LEAN16_MIN_N // 2, want_small)):
        q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
        assert (1 << q_bits) < q < (1 << (q_bits + 1))  # prime convention
        assert _j._bflys3(*_j.scheme_gates(q, n))[2] == want
        # With approximation disabled every family must be exact.
        monkeypatch.setattr(_cfg, "approx_butterflies", lambda: False)
        assert _j._bflys3(*_j.scheme_gates(q, n))[2] == "exact"
        monkeypatch.setattr(_cfg, "approx_butterflies", lambda: True)


@pytest.mark.parametrize("q_bits", [49, 59, 60])
def test_widened_invariant_butterflies_ranges(q_bits):
    """Randomized range+congruence audit of the widened-invariant
    butterfly algebra on the ACTUAL generate_primes prime per family,
    in pure numpy (no jit): each scheme's forward/inverse butterflies
    must keep their documented invariants and agree mod q with the
    exact Harvey forms, and the final fixup/final stage must restore
    the public contracts. This is the host-side version of the range
    proofs in the docstrings (jnp_ntt.py lean16/lean8)."""
    q = int(nt.generate_primes(1, q_bits, True, ntt_size=1 << 14)[0])
    rng = np.random.default_rng(q_bits)
    trials = 20000
    lean16 = q < (1 << 60)
    fwd_bound = 16 * q if lean16 else 8 * q
    inv_bound = 8 * q if lean16 else 4 * q
    w = rng.integers(1, q, size=trials, dtype=np.uint64)
    wp = ((w.astype(object) << 64) // q)  # python ints (exact)
    xs = rng.integers(0, fwd_bound, size=trials, dtype=np.uint64)
    ys = rng.integers(0, fwd_bound, size=trials, dtype=np.uint64)
    M = (1 << 64) - 1
    for i in range(trials):
        x, y, wi, wpi = int(xs[i]), int(ys[i]), int(w[i]), int(wp[i])
        # e<=6 approximate quotient: model EVERY error in [0, 6].
        e = int(rng.integers(0, 7))
        q_hat = ((y * wpi) >> 64) - e
        if q_hat < 0:
            q_hat = 0
        t = (y * wi - q_hat * q) & M
        assert t < 8 * q  # raw e<=6 Shoup range
        if lean16:
            tx = x - 8 * q if x >= 8 * q else x          # one halver
            nx, ny = tx + t, tx + 8 * q - t
        else:
            tx = x - 4 * q if x >= 4 * q else x
            t2 = t - 4 * q if t >= 4 * q else t          # two halvers
            nx, ny = tx + t2, tx + 4 * q - t2
        assert 0 <= nx < fwd_bound and 0 <= ny < fwd_bound
        assert nx % q == (x + y * wi) % q
        assert ny % q == (x - y * wi) % q
        # Inverse butterfly on its invariant.
        xi = int(rng.integers(0, inv_bound))
        yi = int(rng.integers(0, inv_bound))
        if lean16:
            s = xi + yi
            txi = s - 8 * q if s >= 8 * q else s         # one halver
            tyi = (xi + 8 * q - yi)
            q_hat = ((tyi * wpi) >> 64) - e
            ri = (tyi * wi - q_hat * q) & M
        else:
            s = xi + yi
            txi = s - 4 * q if s >= 4 * q else s
            tyi = (xi + 4 * q - yi)
            q_hat = ((tyi * wpi) >> 64) - e
            ri = (tyi * wi - q_hat * q) & M
            ri = ri - 4 * q if ri >= 4 * q else ri       # two halvers
        assert 0 <= txi < inv_bound and 0 <= ri < inv_bound
        assert txi % q == (xi + yi) % q
        assert ri % q == ((xi - yi) * wi) % q


# Regime-boundary parity grid (reference test density: N in {2^1..2^13} x
# modulus bits {27..33, 48..51, 58..60}, test/include/test/test-ntt-util.
# hpp:131-159). Sampled budget-aware: every bit-width at the regime
# boundaries (2^30 single-limb gate, 2^50/2^52 MXU/IFMA gates, the 60-61
# lean-butterfly gate) x two degrees straddling the flat/2D path split.
@pytest.mark.parametrize("q_bits",
                         [27, 28, 29, 30, 31, 32, 33,
                          48, 49, 50, 51, 58, 59, 60, 61])
@pytest.mark.parametrize("log_n", [5, 11])
def test_regime_boundary_grid(log_n, q_bits):
    n = 1 << log_n
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    ntt = NTT(n, q)
    rng = np.random.default_rng(log_n * 1000 + q_bits)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    rop, prop = ntt.plan.rop, ntt.plan.prop
    irop, pirop = ntt.plan.irop, ntt.plan.pirop

    got = ntt.forward(x, 1, 1)
    np.testing.assert_array_equal(
        got, ref.fwd_ntt_radix2(x, q, rop, prop, 1, 1))
    lazy = ntt.forward(x, 1, 4)
    assert np.all(lazy < np.uint64(4 * q))
    np.testing.assert_array_equal(lazy % np.uint64(q), got)
    back = ntt.inverse(got, 1, 1)
    np.testing.assert_array_equal(back, x)
    lazy_i = ntt.inverse(got, 1, 2)
    assert np.all(lazy_i < np.uint64(2 * q))
    np.testing.assert_array_equal(lazy_i % np.uint64(q), x)
