"""A/B the DF FFT stage-walker radix on the attached accelerator.

The radix-4 pairing (HEXL_TPU_FFT_RADIX=4) is bit-identical eagerly but
jit-hazardous on the XLA *CPU* backend (FMA contraction duplicates Dekker
products across fusions); this script measures + accuracy-checks it on the
real TPU backend, where the A/B was still pending. Run once per setting:

    HEXL_TPU_FFT_RADIX=2 python benchmarks/fft_radix_ab.py
    HEXL_TPU_FFT_RADIX=4 python benchmarks/fft_radix_ab.py

Prints one JSON line per n with us/pair and the max |err| vs the NumPy
complex128 oracle, so the radix-4 walker is only ever promoted to default
if it is BOTH faster and still ~1e-14 accurate under the TPU compiler.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hexl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from timing import chain_rate  # noqa: E402

BATCH = int(os.environ.get("AB_BATCH", "32"))
SIZES = tuple(int(s) for s in
              os.environ.get("AB_SIZES", "4096,16384").split(","))


def _oracle_fwd(x, table):
    """Textbook per-stage complex128 transform (tests/test_experimental.py
    pattern), vectorized over a leading batch axis."""
    x = np.asarray(x, dtype=np.complex128).copy()
    n = x.shape[-1]
    m, gap = 1, n >> 1
    while m < n:
        v = x.reshape(x.shape[0], m, 2, gap)
        xs = v[:, :, 0, :].copy()
        t = v[:, :, 1, :] * table[m:2 * m][None, :, None]
        v[:, :, 0, :] = xs + t
        v[:, :, 1, :] = xs - t
        m <<= 1
        gap >>= 1
    return x


def main():
    import jax

    from hexl_tpu.experimental import fft_like as FL
    from hexl_tpu.experimental.df32 import (cdf_from_complex128,
                                            cdf_to_complex128)

    radix = os.environ.get("HEXL_TPU_FFT_RADIX", "2")
    rng = np.random.default_rng(0)
    for n in SIZES:
        fft = FL.FFTLike(n, precision="double_float")
        z = rng.normal(size=(BATCH, n)) + 1j * rng.normal(size=(BATCH, n))
        zc = cdf_from_complex128(z)

        # Accuracy first: one fwd on device vs the host complex128 oracle.
        fwd1 = jax.jit(fft.df_fwd_body)
        got = cdf_to_complex128(jax.block_until_ready(fwd1(zc)))
        oracle = _oracle_fwd(z, cdf_to_complex128(fft.fwd_table))
        err = float(np.max(np.abs(got - oracle)))

        def pair(c, ff=fft):
            return ff.df_inv_body(ff.df_fwd_body(c))

        # Chain-differential rate (benchmarks/timing.py): immune to the
        # tunnel's ~40-60 ms fixed dispatch cost, which dominated the
        # old fixed-chain timing at these small sizes.
        rate = chain_rate(pair, zc, BATCH, k1=64, k2=1024)
        us = 1e6 / rate
        print(json.dumps({
            "radix": radix, "n": n, "backend": jax.default_backend(),
            "us_per_pair": round(us, 3), "max_fwd_err": err,
        }), flush=True)


if __name__ == "__main__":
    main()
