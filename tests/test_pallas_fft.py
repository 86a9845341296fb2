"""Fused Pallas DF-FFT kernel (experimental/pallas_fft.py) vs the XLA
2D walk — interpret mode on CPU.

The kernel traces the SAME walker functions as the XLA path
(fft_like._fwd_2d_df/_inv_2d_df), so on TPU the outputs are bit-equal
(verified on hardware; no FMA contraction there). Under XLA-CPU jit the
two legs fuse differently and FMA contraction perturbs the Dekker error
planes, so here accuracy is judged on the combined hi+lo value (the
repo's standing rule for DF comparisons under jit) against the eager
XLA walk AND the complex128 oracle.

Reference analogue: hexl/experimental/fft-like/fwd-fft-like-avx512.cpp
(the reference's fused-kernel lane for the same transform).
"""

import numpy as np
import pytest

from hexl_tpu.experimental import fft_like as FL
from hexl_tpu.experimental.df32 import (cdf_from_complex128,
                                        cdf_to_complex128)
from hexl_tpu.experimental.pallas_fft import (PALLAS_FFT_MAX_N,
                                              fwd_fft_df, inv_fft_df,
                                              _block_kb)


def _mk(n, batch, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(batch, n)) + 1j * rng.normal(size=(batch, n))
    return z, cdf_from_complex128(z)


def test_block_kb():
    """Blocks cap at 128 sublane-rows and divide the batch."""
    assert _block_kb(32, 32) == 4
    assert _block_kb(32, 8) == 16
    assert _block_kb(3, 32) == 3
    assert _block_kb(5, 64) == 1
    assert _block_kb(1, 8) == 1


def test_fft_backend_dispatch(monkeypatch):
    """config.fft_backend routes FFTLike's DF bodies: 'pallas' engages
    the fused kernel for n <= PALLAS_FFT_MAX_N only; invalid values
    raise; default on CPU is 'xla'."""
    from hexl_tpu import config

    assert config.fft_backend() in ("xla", "pallas")
    monkeypatch.setenv("HEXL_TPU_FFT_BACKEND", "mosaic")
    with pytest.raises(ValueError):
        config.fft_backend()

    monkeypatch.setenv("HEXL_TPU_FFT_BACKEND", "pallas")
    assert config.fft_backend() == "pallas"
    small = FL.FFTLike(4096, precision="double_float")
    big = FL.FFTLike(2 * PALLAS_FFT_MAX_N, precision="double_float")
    assert small._use_pallas_fft()
    assert not big._use_pallas_fft()
    monkeypatch.setenv("HEXL_TPU_FFT_BACKEND", "xla")
    assert not small._use_pallas_fft()

    # Dispatch produces DF-accurate results end-to-end (forward()):
    # the pallas- and xla-routed DF paths must agree (NOT compared to a
    # precision="f64" oracle here — on the TPU leg x64 is off and that
    # oracle silently truncates to complex64, the known DF-probe trap).
    z, _ = _mk(4096, 2, seed=5)
    monkeypatch.setenv("HEXL_TPU_FFT_BACKEND", "pallas")
    got = FL.FFTLike(4096, precision="double_float").forward(z)
    monkeypatch.setenv("HEXL_TPU_FFT_BACKEND", "xla")
    exp = FL.FFTLike(4096, precision="double_float").forward(z)
    rel = np.max(np.abs(got - exp)) / np.max(np.abs(exp))
    assert rel < 1e-12, rel


@pytest.mark.parametrize("n", [1024, 4096])
@pytest.mark.parametrize("batch", [1, 6])
def test_fused_fft_matches_xla_walk(n, batch):
    import jax
    fft = FL.FFTLike(n, scalar=2.0 ** 20, precision="double_float")
    z, zc = _mk(n, batch)

    for direction, scal in (("fwd", None), ("fwd", fft._inv_scale_df),
                            ("inv", None), ("inv", fft._scale_df)):
        if direction == "fwd":
            exp = FL._fwd_2d_df(zc, fft._st_fwd, n, fft._rows,
                                fft._tiles, fft._lane_l, scal)
            got = jax.jit(lambda c, s=scal, f=fft:
                          fwd_fft_df(c, f, s))(zc)
        else:
            exp = FL._inv_2d_df(zc, fft._st_inv, n, fft._rows,
                                fft._tiles, fft._lane_l, fft._w_final,
                                scal)
            got = jax.jit(lambda c, s=scal, f=fft:
                          inv_fft_df(c, f, s))(zc)
        ev = cdf_to_complex128(exp)
        gv = cdf_to_complex128(got)
        rel = np.max(np.abs(gv - ev)) / np.max(np.abs(ev))
        assert rel < 1e-12, (direction, scal is not None, rel)


def test_fused_fft_oracle_roundtrip():
    """fwd(inv(x)) through the fused kernels with CKKS-style fused
    scaling round-trips to ~DF accuracy vs the input."""
    import jax
    n, batch = 4096, 4
    fft = FL.FFTLike(n, scalar=2.0 ** 30, precision="double_float")
    z, zc = _mk(n, batch, seed=3)
    enc = jax.jit(lambda c, f=fft: inv_fft_df(c, f, f._scale_df))(zc)
    dec = jax.jit(lambda c, f=fft: fwd_fft_df(c, f, f._inv_scale_df))(enc)
    rel = np.max(np.abs(cdf_to_complex128(dec) - z)) / np.max(np.abs(z))
    assert rel < 1e-11, rel
