"""Mosaic-vs-XLA butterfly reproducer (VERDICT round 3, Next #6).

The repo ships ~900 LoC of fused Pallas NTT kernels that are OPT-IN
(HEXL_TPU_NTT_BACKEND=pallas) because XLA's lowering of the identical
staged bodies measured faster at every size on the round-2/3 toolchain;
the underlying claim — "Mosaic lowers the same butterflies ~3x slower
than XLA" — lived in prose. This standalone A/B pins it mechanically:
ONE identical lean16 forward-butterfly chain (hexl_tpu/ntt/jnp_ntt.py
`_fwd_butterfly_lean16`, the headline kernel's exact hot loop), lowered
(a) by XLA from the jnp body and (b) by Mosaic from a Pallas kernel
wrapping the SAME function, timed under the same chain-differential
protocol. Re-run per toolchain update (benchmarks/refresh.sh); if the
gap ever closes, flip the default backend back. This is also the
minimal artifact an upstream Mosaic performance report needs.

Reference analogue of the loop being raced: the per-stage kernels of
hexl/ntt/fwd-ntt-avx512.cpp:97-231.

Usage: timeout 1200 python benchmarks/mosaic_butterfly_ab.py
Writes benchmarks/mosaic_butterfly_results.json.
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

ROWS_TOTAL = 16384          # (ROWS_TOTAL, 128) u32 planes, 8 MB per leg
BLOCK_ROWS = 256            # Mosaic block: bounds stack temporaries
REPS = 8                    # dependent butterflies per step


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from hexl_tpu.limb import U64, to_limbs
    from hexl_tpu.ntt.jnp_ntt import _fwd_butterfly_lean16

    rng = np.random.default_rng(0)
    q_int = (1 << 59) - (1 << 14) + 1  # q < 2^60: lean16 regime
    w_int = 0x0123456789ABCDE5 % q_int
    wp_int = (w_int << 64) // q_int

    def np_const64(v):
        # numpy-scalar limbs fold into the jaxpr as LITERALS, so the
        # identical body lowers under both XLA and Mosaic (Pallas
        # rejects captured array constants: "pass them as inputs").
        return U64(np.uint32(v >> 32), np.uint32(v & 0xFFFFFFFF))

    consts = tuple(np_const64(v) for v in
                   (w_int, wp_int, q_int, 2 * q_int))

    nelem = ROWS_TOTAL * 128
    xs = to_limbs(rng.integers(0, q_int, size=nelem, dtype=np.uint64))
    ys = to_limbs(rng.integers(0, q_int, size=nelem, dtype=np.uint64))
    x = U64(xs.hi.reshape(ROWS_TOTAL, 128), xs.lo.reshape(ROWS_TOTAL, 128))
    y = U64(ys.hi.reshape(ROWS_TOTAL, 128), ys.lo.reshape(ROWS_TOTAL, 128))

    def chain_body(xx, yy):
        w, wp, q, tq = consts
        for _ in range(REPS):
            nx, ny = _fwd_butterfly_lean16(xx, yy, w, wp, q, tq)
            xx, yy = ny, nx
        return xx, yy

    # (a) XLA lowering of the jnp body.
    def xla_step(xy):
        xx, yy = xy
        xx, yy = chain_body(xx, yy)
        return (xx, yy)

    # (b) Mosaic lowering of the SAME body inside a Pallas kernel.
    def kernel(xh, xl, yh, yl, oxh, oxl, oyh, oyl):
        xx = U64(xh[...], xl[...])
        yy = U64(yh[...], yl[...])
        xx, yy = chain_body(xx, yy)
        oxh[...] = xx.hi
        oxl[...] = xx.lo
        oyh[...] = yy.hi
        oyl[...] = yy.lo

    spec = pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0))
    call = pl.pallas_call(
        kernel,
        grid=(ROWS_TOTAL // BLOCK_ROWS,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((ROWS_TOTAL, 128), jnp.uint32)] * 4,
    )

    def pallas_step(xy):
        xx, yy = xy
        oxh, oxl, oyh, oyl = call(xx.hi, xx.lo, yy.hi, yy.lo)
        return (U64(oxh, oxl), U64(oyh, oyl))

    # Equivalence first: the two lowerings must agree bit-for-bit.
    ax, ay = jax.jit(xla_step)((x, y))
    bx, by = jax.jit(pallas_step)((x, y))
    same = all(bool(jnp.array_equal(p, q)) for p, q in
               [(ax.hi, bx.hi), (ax.lo, bx.lo), (ay.hi, by.hi),
                (ay.lo, by.lo)])
    print(f"bit-equal XLA vs Mosaic: {same}", flush=True)

    ops = nelem * REPS
    r_xla = chain_rate(xla_step, (x, y), ops, k1=64, k2=512)
    print(f"XLA    lean16 butterfly chain: {r_xla/1e9:8.2f} Gbfly/s",
          flush=True)
    r_pal = chain_rate(pallas_step, (x, y), ops, k1=64, k2=512)
    print(f"Mosaic lean16 butterfly chain: {r_pal/1e9:8.2f} Gbfly/s "
          f"({r_xla/r_pal:.2f}x slower than XLA)" if r_pal < r_xla else
          f"Mosaic lean16 butterfly chain: {r_pal/1e9:8.2f} Gbfly/s "
          f"({r_pal/r_xla:.2f}x FASTER than XLA — flip the default!)",
          flush=True)

    out = {"protocol": "chain-differential, D2H fetch barrier",
           "backend": jax.default_backend(),
           "bit_equal": same,
           "xla_gbfly_per_s": round(r_xla / 1e9, 2),
           "mosaic_gbfly_per_s": round(r_pal / 1e9, 2),
           "xla_over_mosaic": round(r_xla / r_pal, 2)}
    (pathlib.Path(__file__).parent / "mosaic_butterfly_results.json"
     ).write_text(json.dumps(out, indent=1))
    print("wrote benchmarks/mosaic_butterfly_results.json")


if __name__ == "__main__":
    main()
