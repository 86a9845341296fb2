"""Composite/experimental layer tests vs independent host oracles."""

import numpy as np
import pytest

from hexl_tpu import nt, ref
from hexl_tpu.experimental import (FFTLike, dyadic_multiply, key_switch,
                                   lr_mat_vec_mult)


def _moduli(k, bits, n):
    return nt.generate_primes(k, bits, True, ntt_size=n)


def test_dyadic_multiply():
    n, M = 1024, 3
    moduli = _moduli(M, 40, n)
    rng = np.random.default_rng(0)
    x = np.stack([np.stack([rng.integers(0, q, n, dtype=np.uint64)
                            for q in moduli]) for _ in range(2)])
    y = np.stack([np.stack([rng.integers(0, q, n, dtype=np.uint64)
                            for q in moduli]) for _ in range(2)])
    out = dyadic_multiply(x, y, moduli)
    assert out.shape == (3, M, n)
    for i, q in enumerate(moduli):
        np.testing.assert_array_equal(
            out[0, i], ref.eltwise_mult_mod(x[0, i], y[0, i], q))
        exp_mid = ref.eltwise_add_mod(
            ref.eltwise_mult_mod(x[0, i], y[1, i], q),
            ref.eltwise_mult_mod(x[1, i], y[0, i], q), q)
        np.testing.assert_array_equal(out[1, i], exp_mid)
        np.testing.assert_array_equal(
            out[2, i], ref.eltwise_mult_mod(x[1, i], y[1, i], q))


def test_lr_mat_vec_mult():
    n, M, W = 512, 2, 4
    moduli = _moduli(M, 30, n)
    rng = np.random.default_rng(1)
    c1 = np.stack([np.stack([np.stack([rng.integers(0, q, n, np.uint64)
                                       for q in moduli])
                             for _ in range(2)]) for _ in range(W)])
    c2 = np.stack([np.stack([np.stack([rng.integers(0, q, n, np.uint64)
                                       for q in moduli])
                             for _ in range(2)]) for _ in range(W)])
    out = lr_mat_vec_mult(c1, c2, moduli)
    # Oracle: sum over weights of dyadic products.
    exp = np.zeros((3, M, n), dtype=np.uint64)
    for i, q in enumerate(moduli):
        acc = [np.zeros(n, dtype=object) for _ in range(3)]
        for w in range(W):
            x0, x1 = c1[w, 0, i].astype(object), c1[w, 1, i].astype(object)
            y0, y1 = c2[w, 0, i].astype(object), c2[w, 1, i].astype(object)
            acc[0] = (acc[0] + x0 * y0) % q
            acc[1] = (acc[1] + x0 * y1 + x1 * y0) % q
            acc[2] = (acc[2] + x1 * y1) % q
        for p in range(3):
            exp[p, i] = acc[p].astype(np.uint64)
    np.testing.assert_array_equal(out, exp)


def _fft_oracle_fwd(x, table):
    """Textbook per-stage complex transform, same structure as the NTT."""
    x = np.asarray(x, dtype=np.complex128).copy()
    n = x.shape[-1]
    m, gap = 1, n >> 1
    while m < n:
        v = x.reshape(m, 2, gap)
        xs = v[:, 0, :].copy()
        t = v[:, 1, :] * table[m:2 * m][:, None]
        v[:, 0, :] = xs + t
        v[:, 1, :] = xs - t
        m <<= 1
        gap >>= 1
    return x


def test_fft_like_matches_oracle_and_roundtrip():
    n = 64
    fft = FFTLike(n)
    rng = np.random.default_rng(2)
    x = rng.normal(size=n) + 1j * rng.normal(size=n)
    got = np.asarray(fft.forward(x))
    if fft.precision == "double_float":
        from hexl_tpu.experimental.df32 import cdf_to_complex128
        table = cdf_to_complex128(fft.fwd_table)
    else:
        table = np.asarray(fft.fwd_table, dtype=np.complex128)
    exp = _fft_oracle_fwd(x, table)
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-9)
    # inverse without scalar omits 1/n
    back = np.asarray(fft.inverse(got)) / n
    np.testing.assert_allclose(back, x, rtol=1e-9, atol=1e-9)


def test_fft_like_with_scalar_roundtrip():
    n = 128
    scalar = 2.0 ** 20
    fft = FFTLike(n, scalar)
    rng = np.random.default_rng(3)
    x = rng.normal(size=n) + 1j * rng.normal(size=n)
    enc = np.asarray(fft.inverse(x))     # CKKS encode direction
    dec = np.asarray(fft.forward(enc))   # decode
    np.testing.assert_allclose(dec, x, rtol=1e-8, atol=1e-8)


def test_build_floating_points_golden():
    """Golden vector ported verbatim from the reference
    TEST(FFTLike, BuildFloatingPointsAVX512)
    (test/experimental/fft-like/test-fft-like-avx512.cpp:21-126)."""
    operand = [
        17713475508538179584, 27, 0, 0, 16858552366855081984, 1, 0, 0,
        18174255346774966272, 7, 0, 0, 1459965302409322496, 0, 0, 0,
        10852157353743343297, 72057091796482622, 0, 0,
        11766836204861046465, 72057091796482623, 0, 0,
        2950642535971380929, 72057091796482619, 0, 0,
        17395534788117004288, 3, 0, 0, 0, 0, 0, 0,
        18086411410077564609, 72057091796482622, 0, 0,
        14084559588513677312, 7, 0, 0, 5268365919623979008, 3, 0, 0,
        6183044770741665792, 4, 0, 0,
        15575236822075680449, 72057091796482626, 0, 0,
        17307690851419578049, 72057091796482618, 0, 0,
        176649757629939393, 72057091796482625, 0, 0]
    expected = [469095144.125, 32109980.057216156, 133969900.94656014,
                1327830.7073135898, -72732310.45981437, -55123198.89089907,
                -130250344.32255825, 66152794.724299073, 0.0,
                -66152794.724299081, 130250344.32255828, 55123198.89089907,
                72732310.459814355, -1327830.7073136102,
                -133969900.94656017, -32109980.05721616]
    threshold = [8517601062242512737, 36028545898241313, 0, 0]
    dec_modulus = [17035202124485025473, 72057091796482626, 0, 0]
    inv_scale = 1.0 / (1 << 40)

    # Reference layout is coeff-major (i*mod_size + j); ours is
    # (mod_size, n) word-planes — transpose to convert.
    plain = np.array(operand, dtype=np.uint64).reshape(16, 4).T
    fft = FFTLike(16)
    out = fft.build_floating_points(plain, threshold, dec_modulus, inv_scale)
    np.testing.assert_array_equal(out.real, np.array(expected))
    np.testing.assert_array_equal(out.imag, np.zeros(16))


def _key_switch_oracle(result, t_target, n, ds, kms, rns, kc, moduli, keys,
                       msf):
    """Independent big-int host oracle following the published algorithm."""
    plans = {q: ref.root_of_unity_powers(n, q) for q in set(moduli)}

    def tables(q):
        rop, irop, _ = plans[q]
        return rop, ref.precon64(rop, q), irop, ref.precon64(irop, q)

    t_intt = []
    for j in range(ds):
        q = moduli[j]
        rop, prop, irop, pirop = tables(q)
        t_intt.append(ref.inv_ntt_radix2(t_target[j], q, irop, pirop, 2, 1))

    t_poly_prod = np.zeros((kc, rns, n), dtype=np.uint64)
    for i in range(rns):
        key_index = kms - 1 if i == ds else i
        qk = moduli[key_index]
        rop, prop, irop, pirop = tables(qk)
        acc = np.zeros((kc, n), dtype=object)
        for j in range(ds):
            if i == j:
                t_op = t_target[j].astype(object)
            else:
                tj = t_intt[j]
                if moduli[j] > qk:
                    tj = (tj % np.uint64(qk)).astype(np.uint64)
                t_op = ref.fwd_ntt_radix2(tj, qk, rop, prop, 4, 4
                                          ).astype(object)
            for k in range(kc):
                acc[k] = acc[k] + t_op * keys[j, k, key_index].astype(object)
        for k in range(kc):
            t_poly_prod[k, i] = (acc[k] % qk).astype(np.uint64)

    qk = moduli[kms - 1]
    qk_half = qk >> 1
    out = result.astype(object).copy()
    for k in range(kc):
        rop, prop, irop, pirop = tables(qk)
        t_last = ref.inv_ntt_radix2(t_poly_prod[k, ds], qk, irop, pirop,
                                    2, 2)
        t_last = ((t_last.astype(object) + qk_half) % qk).astype(np.uint64)
        for i in range(ds):
            qi = moduli[i]
            ri, pi, ii, pii = tables(qi)
            if qk > qi:
                t_ntt = (t_last % np.uint64(qi)).astype(np.uint64)
            else:
                t_ntt = t_last
            fix = qi - (qk_half % qi)
            t_ntt = t_ntt + np.uint64(fix)
            t_ntt = ref.fwd_ntt_radix2(t_ntt, qi, ri, pi, 4, 4)
            diff = (t_poly_prod[k, i].astype(object) + 4 * qi
                    - t_ntt.astype(object))
            val = (diff * msf[i]) % qi
            out[k, i] = (out[k, i] + val) % qi
    return out.astype(np.uint64)


def test_key_switch():
    n, ds, kc = 64, 2, 2
    kms = ds + 1
    rns = ds + 1
    moduli = _moduli(kms, 40, n)
    rng = np.random.default_rng(4)
    qk = moduli[-1]
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
    got = key_switch(result, t_target, n, ds, kms, rns, kc, moduli, keys,
                     msf)
    exp = _key_switch_oracle(result, t_target, n, ds, kms, rns, kc,
                             moduli, keys, msf)
    np.testing.assert_array_equal(got, exp)


def test_fft_like_double_float_precision():
    """The 2xf32 double-float path matches the f64 transform to ~1e-13
    relative — the TPU surrogate for the reference's complex<double>."""
    import jax
    from hexl_tpu.experimental.fft_like import FFTLike
    if not jax.config.jax_enable_x64:
        pytest.skip("f64 reference transform needs x64 (CPU test mode)")
    n = 512
    rng = np.random.default_rng(8)
    x = rng.normal(size=n) + 1j * rng.normal(size=n)
    f_ref = np.asarray(FFTLike(n, precision="f64").forward(x))
    f_df = FFTLike(n, precision="double_float").forward(x)
    rel = np.max(np.abs(f_df - f_ref)) / np.max(np.abs(f_ref))
    assert rel < 1e-12, rel

    # Encode/decode roundtrip with a CKKS-style scale.
    fft = FFTLike(n, 2.0 ** 40, precision="double_float")
    dec = fft.forward(fft.inverse(x))
    rel = np.max(np.abs(dec - x)) / np.max(np.abs(x))
    assert rel < 1e-12, rel


def test_fft_like_df_precision_large_jit():
    """DF accuracy vs the true f64 oracle UNDER JIT at a 2D radix-eligible
    size. Guards against XLA fusion/FMA-contraction regressions corrupting
    the Dekker error planes (measured failure mode: radix-4 stage pairing
    degrades fwd from 8e-15 to 6e-8 — which is why fft_radix defaults
    to 2; see config.fft_radix)."""
    import jax
    from hexl_tpu.experimental.fft_like import FFTLike
    if not jax.config.jax_enable_x64:
        pytest.skip("f64 reference transform needs x64 (CPU test mode)")
    n = 8192
    rng = np.random.default_rng(13)
    x = rng.normal(size=n) + 1j * rng.normal(size=n)
    ref_e = FFTLike(n, precision="f64")
    df_e = FFTLike(n, precision="double_float")
    for direction in ("forward", "inverse"):
        got = np.asarray(getattr(df_e, direction)(x))
        exp = np.asarray(getattr(ref_e, direction)(x))
        rel = np.max(np.abs(got - exp)) / np.max(np.abs(exp))
        assert rel < 1e-12, (direction, rel)


@pytest.mark.parametrize("n", [1024, 4096, 8192])
def test_fft_like_df_radix4_pairing_eager(n):
    """The generic radix-2^L DF walkers are bit-identical to radix-2
    when run eagerly (same ops, same order) at every fusion factor,
    including mixed per-phase pairs and whole-phase fusion — stage
    fusion only changes HBM materialization, never arithmetic (the
    TPU default is fused; radix-2 stays default on CPU, where jit
    FMA-contraction corrupts fused Dekker products). Covers every 2D
    size class: odd phase-A stage counts (1024: 3, 4096: 5) leave a
    remainder group and 8192 pairs evenly."""
    from hexl_tpu.experimental import fft_like as FL
    from hexl_tpu.experimental.df32 import (cdf_from_complex128,
                                            cdf_to_complex128)
    fft = FL.FFTLike(n, precision="double_float")
    rng = np.random.default_rng(14)
    z = rng.normal(size=n) + 1j * rng.normal(size=n)
    zc = cdf_from_complex128(z)

    def fwd(radix):
        return cdf_to_complex128(FL._fwd_2d_df(
            zc, fft._st_fwd, n, fft._rows, fft._tiles, fft._lane_l,
            None, radix=radix))

    def inv(radix):
        return cdf_to_complex128(FL._inv_2d_df(
            zc, fft._st_inv, n, fft._rows, fft._tiles, fft._lane_l,
            fft._w_final, None, radix=radix))

    base_f, base_i = fwd(2), inv(2)
    for radix in (4, 8, 16, (16, 8), (32, 8), (8, 128), (32, 128)):
        np.testing.assert_array_equal(base_f, fwd(radix), err_msg=str(radix))
        np.testing.assert_array_equal(base_i, inv(radix), err_msg=str(radix))


def test_fft_like_2d_staged_matches_flat():
    """The 2D phase-split DF walk (n >= 1024) is a storage permutation of
    the flat walk — identical butterflies in identical order, so outputs
    are bit-identical; the scalar variant differs only in last rounding."""
    from hexl_tpu.experimental import fft_like as FL
    from hexl_tpu.experimental.df32 import (cdf_from_complex128,
                                            cdf_to_complex128)
    n = 2048
    fft = FL.FFTLike(n, precision="double_float")
    assert fft._st_fwd is not None
    rng = np.random.default_rng(12)
    z = rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
    zc = cdf_from_complex128(z)
    np.testing.assert_array_equal(
        cdf_to_complex128(fft.df_fwd_body(zc)),
        cdf_to_complex128(FL._stage_loop_fwd_df(zc, fft.fwd_table, n,
                                                None)))
    np.testing.assert_array_equal(
        cdf_to_complex128(fft.df_inv_body(zc)),
        cdf_to_complex128(FL._stage_loop_inv_df(zc, fft.inv_table, n,
                                                None)))
    # Scale-fused encode/decode roundtrip through the public entry.
    s = FL.FFTLike(n, 2.0 ** 30, precision="double_float")
    dec = s.forward(s.inverse(z))
    np.testing.assert_allclose(dec, z, rtol=1e-8, atol=1e-8)


def test_fft_pack_phase_b_bit_exact(monkeypatch):
    """The lane-packed FFT phase-B walk (config.fft_pack — kb = 128/L
    polys folded into the lane axis for n < 2^14) is a pure lane
    permutation: outputs must be BIT-identical to the transposed walk,
    both directions, across sizes and a non-divisible batch (which
    falls back to the unpacked walk). Mirrors the NTT analogue
    (test_packed_phase_b_bit_exact); pack defaults off when the backend
    is not TPU, so without forcing it here the CPU suite would never
    execute the packed permutation."""
    import hexl_tpu.config as _cfg
    from hexl_tpu.experimental import fft_like as FL
    from hexl_tpu.experimental.df32 import (cdf_from_complex128,
                                            cdf_to_complex128)
    for n, batch in ((1 << 10, 32), (1 << 12, 8), (1 << 12, 6),
                     (1 << 13, 4)):
        fft = FL.FFTLike(n, precision="double_float")
        rng = np.random.default_rng(n + batch)
        z = rng.normal(size=(batch, n)) + 1j * rng.normal(size=(batch, n))
        zc = cdf_from_complex128(z)
        res = {}
        for pack in (False, True):
            monkeypatch.setattr(_cfg, "fft_pack", lambda p=pack: p)
            res[pack] = (cdf_to_complex128(fft.df_fwd_body(zc)),
                         cdf_to_complex128(fft.df_inv_body(zc)))
        np.testing.assert_array_equal(res[True][0], res[False][0],
                                      err_msg=f"fwd n={n} b={batch}")
        np.testing.assert_array_equal(res[True][1], res[False][1],
                                      err_msg=f"inv n={n} b={batch}")


def test_df32_primitives():
    from hexl_tpu.experimental import df32 as D
    rng = np.random.default_rng(9)
    a = rng.normal(size=256) * 1e3
    b = rng.normal(size=256)
    da, db = D.df_from_f64(a), D.df_from_f64(b)
    np.testing.assert_allclose(D.df_to_f64(D.df_add(da, db)), a + b,
                               rtol=1e-14)
    np.testing.assert_allclose(D.df_to_f64(D.df_mul(da, db)), a * b,
                               rtol=1e-13)
    ca = D.cdf_from_complex128(a + 1j * b)
    cb = D.cdf_from_complex128(b - 1j * a)
    np.testing.assert_allclose(
        D.cdf_to_complex128(D.cdf_mul(ca, cb)),
        (a + 1j * b) * (b - 1j * a), rtol=1e-12)
    # Presplit butterfly multiply: same error model as cdf_mul.
    np.testing.assert_allclose(
        D.cdf_to_complex128(D.cdf_mul_ps(ca, D.cdf_presplit(cb))),
        (a + 1j * b) * (b - 1j * a), rtol=1e-12)


def _run_key_switch_case(n, ds, kc, bits=49, seed=21):
    """Shared driver: random config vs the big-int oracle (production-
    scale sweep mirroring the reference's test-key-switch.cpp matrix).
    `bits` may be a per-modulus sequence to force mixed bit lengths
    (exercises the unstacked accumulation/flush fallback)."""
    kms = ds + 1
    rns = ds + 1
    if isinstance(bits, (list, tuple)):
        assert len(bits) == kms
        moduli = [_moduli(1, b, n)[0] for b in bits]
    else:
        moduli = _moduli(kms, bits, n)
    rng = np.random.default_rng(seed)
    qk = moduli[-1]
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
    got = key_switch(result, t_target, n, ds, kms, rns, kc, moduli, keys,
                     msf)
    exp = _key_switch_oracle(result, t_target, n, ds, kms, rns, kc,
                             moduli, keys, msf)
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("n,ds,kc", [
    (1 << 13, 3, 2),
    (1 << 13, 2, 3),
    (1 << 14, 3, 2),
])
def test_key_switch_production_scale(n, ds, kc):
    _run_key_switch_case(n, ds, kc)


def test_key_switch_approx_flush_forced(monkeypatch):
    """Force the TPU approx-quotient dispatch (K._approx) through the
    whole key-switch pipeline on CPU — the 128-bit Barrett flush and the
    +qk/2 mod-down use approx bodies there; outputs are fully reduced so
    they must stay bit-identical to the exact big-int oracle."""
    from hexl_tpu.eltwise import jnp_kernels as K

    monkeypatch.setattr(K, "_approx", lambda: True)
    _run_key_switch_case(1 << 10, 2, 2, bits=49, seed=77)


def test_key_switch_mixed_bit_moduli():
    """Moduli with different bit lengths cannot share a static Barrett
    shift, so the stacked accumulation/flush must fall back to the
    per-(i, k) loop — same bit-exact contract."""
    _run_key_switch_case(1 << 9, 2, 2, bits=(40, 41, 45), seed=5)


def test_fft_like_single_split_planes(monkeypatch):
    """precision="single" must run WITHOUT complex dtypes when the
    backend is TPU (complex64 constants do not lower there): the split
    re/im f32 plane path must match the complex64 loop to f32 accuracy
    and round-trip. Forced on CPU via the backend switch; runs natively
    under HEXL_TPU_TEST_PLATFORM=tpu."""
    import hexl_tpu.config as _cfg
    from hexl_tpu.experimental import fft_like as FL

    n = 256
    rng = np.random.default_rng(5)
    z = (rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n))).astype(
        np.complex64)

    if _cfg.default_backend() != "tpu":
        ref_fft = FL.FFTLike(n, scalar=2.0 ** 10, precision="single")
        ref_fwd = np.asarray(ref_fft.forward(z))
        ref_inv = np.asarray(ref_fft.inverse(ref_fwd))
        monkeypatch.setattr(_cfg, "default_backend", lambda: "tpu")
    else:
        ref_fwd = ref_inv = None

    fft = FL.FFTLike(n, scalar=2.0 ** 10, precision="single")
    assert fft._single_planes
    got_fwd = fft.forward(z)
    got_inv = fft.inverse(got_fwd)
    assert got_fwd.dtype == np.complex64
    if ref_fwd is not None:
        np.testing.assert_allclose(got_fwd, ref_fwd, rtol=2e-5, atol=2e-4)
        np.testing.assert_allclose(got_inv, ref_inv, rtol=2e-5, atol=2e-4)
    # Round trip (fwd scales by 1/scalar, inv by scalar/n).
    np.testing.assert_allclose(got_inv, z, rtol=5e-4, atol=5e-4)


def test_build_floating_points_device_matches_host():
    """The device (DF 2xf32) BuildFloatingPoints must match the host f64
    version to the DF precision (~2^-47 rel; reference computes this as
    a device kernel, fft-like-avx512.cpp:136-159)."""
    from hexl_tpu.experimental import fft_like as FL
    from hexl_tpu.experimental.df32 import df_to_f64

    n = 64
    fft = FL.FFTLike(n, precision="double_float")
    rng = np.random.default_rng(9)
    mod_size = 2
    dec = (1 << 100) + 12345  # decryption modulus (multiword)
    thr = dec >> 1
    vals = [int(rng.integers(0, 1 << 62)) << 40 | int(rng.integers(0, 1 << 40))
            for _ in range(n)]
    vals = [v % dec for v in vals]
    plain = np.zeros((mod_size, n), dtype=np.uint64)
    for i, v in enumerate(vals):
        for w in range(mod_size):
            plain[w, i] = (v >> (64 * w)) & 0xFFFFFFFFFFFFFFFF
    thr_words = [(thr >> (64 * w)) & 0xFFFFFFFFFFFFFFFF
                 for w in range(mod_size)]
    dec_words = [(dec >> (64 * w)) & 0xFFFFFFFFFFFFFFFF
                 for w in range(mod_size)]
    inv_scale = 2.0 ** -40

    host = fft.build_floating_points(plain, thr_words, dec_words, inv_scale)
    dev = df_to_f64(fft.build_floating_points_device(
        plain, thr_words, dec_words, inv_scale))
    np.testing.assert_allclose(dev, host.real, rtol=3e-14, atol=1e-20)
