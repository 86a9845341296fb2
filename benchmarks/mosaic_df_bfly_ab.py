"""Mosaic-vs-XLA A/B for the double-float FFT butterfly.

Sizing probe for a fused Pallas DF-FFT kernel (fft_profile.py showed the
small-N transform is layout/HBM-bound: null-layout floor ~2 us of the
~4 us inv call at N=4096 — a VMEM-resident kernel removes that floor
entirely, IF Mosaic lowers the f32 Dekker butterflies at a competitive
rate). Chains the exact `_bfly_fwd_df` used by the 2D walkers
(hexl_tpu/experimental/fft_like.py) under both lowerings on identical
data, reports Gbfly/s each, asserts bit-equality.

Unlike the integer lean16 chain (mosaic_butterfly_ab.py: Mosaic 1.55x
slower), the DF butterfly is pure f32 mul/add with no 16-bit partial
products — the op mix Mosaic was designed for.

Usage: timeout 1200 python benchmarks/mosaic_df_bfly_ab.py
Writes benchmarks/mosaic_df_bfly_results.json.
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

ROWS_TOTAL = 8192           # (ROWS_TOTAL, 128) f32 planes, 4 MB per CDF leg
BLOCK_ROWS = 256
REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from hexl_tpu.experimental import df32 as D
    from hexl_tpu.experimental.fft_like import _bfly_fwd_df

    rng = np.random.default_rng(0)
    shape = (ROWS_TOTAL, 128)

    def mk():
        z = rng.normal(size=shape) + 1j * rng.normal(size=shape)
        return D.cdf_from_complex128(z)

    x, y = mk(), mk()

    # |w| = 1 twiddle as numpy-scalar planes -> jaxpr literals (Pallas
    # rejects captured array constants). One renormalizing scale per
    # step bounds the chained magnitude (growth <= 2 per butterfly).
    wz = np.exp(1j * np.float64(0.7368791))
    w = D.CDF(D.DF(np.float32(wz.real),
                   np.float32(np.float64(wz.real) - np.float32(wz.real))),
              D.DF(np.float32(wz.imag),
                   np.float32(np.float64(wz.imag) - np.float32(wz.imag))))
    shrink_v = 2.0 ** -REPS
    shrink = D.DF(np.float32(shrink_v),
                  np.float32(np.float64(shrink_v) - np.float32(shrink_v)))

    def chain_body(xx, yy):
        for _ in range(REPS):
            nx, ny = _bfly_fwd_df(xx, yy, w)
            xx, yy = ny, nx
        return D.cdf_scale(xx, shrink), D.cdf_scale(yy, shrink)

    def xla_step(xy):
        xx, yy = xy
        return chain_body(xx, yy)

    def kernel(xrh, xrl, xih, xil, yrh, yrl, yih, yil, *outs):
        xx = D.CDF(D.DF(xrh[...], xrl[...]), D.DF(xih[...], xil[...]))
        yy = D.CDF(D.DF(yrh[...], yrl[...]), D.DF(yih[...], yil[...]))
        xx, yy = chain_body(xx, yy)
        for ref, v in zip(outs, (xx.re.hi, xx.re.lo, xx.im.hi, xx.im.lo,
                                 yy.re.hi, yy.re.lo, yy.im.hi, yy.im.lo)):
            ref[...] = v

    spec = pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0))
    call = pl.pallas_call(
        kernel,
        grid=(ROWS_TOTAL // BLOCK_ROWS,),
        in_specs=[spec] * 8,
        out_specs=[spec] * 8,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 8,
    )

    def pallas_step(xy):
        xx, yy = xy
        o = call(xx.re.hi, xx.re.lo, xx.im.hi, xx.im.lo,
                 yy.re.hi, yy.re.lo, yy.im.hi, yy.im.lo)
        return (D.CDF(D.DF(o[0], o[1]), D.DF(o[2], o[3])),
                D.CDF(D.DF(o[4], o[5]), D.DF(o[6], o[7])))

    ax = jax.jit(xla_step)((x, y))
    bx = jax.jit(pallas_step)((x, y))
    same = all(bool(jnp.array_equal(p, q)) for p, q in
               zip(jax.tree_util.tree_leaves(ax),
                   jax.tree_util.tree_leaves(bx)))
    print(f"bit-equal XLA vs Mosaic: {same}", flush=True)

    ops = ROWS_TOTAL * 128 * REPS
    r_xla = chain_rate(xla_step, (x, y), ops, k1=64, k2=512)
    print(f"XLA    DF fwd butterfly chain: {r_xla/1e9:8.2f} Gbfly/s",
          flush=True)
    r_pal = chain_rate(pallas_step, (x, y), ops, k1=64, k2=512)
    rel = r_xla / r_pal
    print(f"Mosaic DF fwd butterfly chain: {r_pal/1e9:8.2f} Gbfly/s "
          f"({rel:.2f}x {'slower' if rel >= 1 else 'FASTER'})", flush=True)

    out = {"protocol": "chain-differential, D2H fetch barrier",
           "bit_equal": same,
           "xla_gbfly_per_s": round(r_xla / 1e9, 2),
           "mosaic_gbfly_per_s": round(r_pal / 1e9, 2),
           "xla_over_mosaic": round(rel, 2)}
    (pathlib.Path(__file__).parent / "mosaic_df_bfly_results.json"
     ).write_text(json.dumps(out, indent=1))
    print("wrote benchmarks/mosaic_df_bfly_results.json")


if __name__ == "__main__":
    main()
