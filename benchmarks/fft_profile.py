"""Chain-differential cost decomposition of the small-N FFT-like pair.

VERDICT round 3, Next #5: inv_fft_like at N=4096 is the weakest
committed row (3.71x) while the same family reaches 12-14x at 2^14 —
but no profile of where the ~4 us goes had been committed. This probe
splits the inverse (and forward) double-float transform at N=4096 into:

  * full        — the exact benchmarked body (df_inv_body / df_fwd_body)
  * null_layout — identical stage walk (splits / concats / transposes /
                  table slicing) with the DF butterfly replaced by a
                  plain f32 add/sub on all four planes: the layout +
                  memory-movement floor.
  * bfly_alu    — the same NUMBER of DF butterflies (n/2 * log2 n per
                  direction) chained on a flat VMEM-resident block with
                  no relayout: the pure-ALU floor.

full - null_layout ~ butterfly ALU mass; null_layout - bfly overlap
shows whether the stage walk or the arithmetic dominates, which decides
where optimization effort goes (radix-4 stage pairing halves the layout
mass; nothing shrinks the ALU mass without changing the arithmetic).

Also A/Bs the radix-2 vs radix-4 DF stage walkers at N=4096 (the gate
that pinned small N to radix-2 predates the TPU measurement) with the
accuracy check fft_radix_ab.py runs at larger N.

Protocol: benchmarks/timing.py (scan chains, D2H fetch barrier,
chain-length differentials). Reference being raced:
hexl/experimental/fft-like/fft-like-native.cpp:14-55.

Usage: timeout 1500 python benchmarks/fft_profile.py
Writes benchmarks/fft_profile_results.json.
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

N = int(os.environ.get("FFT_PROFILE_N", "4096"))
BATCH = int(os.environ.get("FFT_PROFILE_BATCH", "32"))


def main():
    import jax
    import jax.numpy as jnp

    from hexl_tpu.experimental import df32 as D
    from hexl_tpu.experimental import fft_like as FL

    rng = np.random.default_rng(0)
    z = rng.normal(size=(BATCH, N)) + 1j * rng.normal(size=(BATCH, N))
    zc = D.cdf_from_complex128(z)
    stages = N.bit_length() - 1
    calls = BATCH  # per-call figures below are per (1, N) transform
    rows = []

    def report(name, rate_calls, extra=None):
        us = 1e6 / rate_calls
        row = {"name": name, "us_per_call": round(us, 4)}
        row.update(extra or {})
        rows.append(row)
        print(f"{name:28s} {us:9.3f} us/call", flush=True)

    oracle = None
    for radix in (2, 4):
        os.environ["HEXL_TPU_FFT_RADIX"] = str(radix)
        fft = FL.FFTLike(N, precision="double_float")

        fwd = lambda c, f=fft: f.df_fwd_body(c)
        inv = lambda c, f=fft: f.df_inv_body(c)
        pair = lambda c, f=fft: f.df_inv_body(f.df_fwd_body(c))

        # Accuracy first (radix-4 is only usable if it holds ~1e-12 on
        # THIS backend; it corrupts the Dekker planes under XLA-CPU jit).
        # fwd/inv here are unnormalized, so the pair returns N*x.
        got = D.cdf_to_complex128(jax.jit(pair)(zc)) / N
        rt_err = float(np.max(np.abs(got - z)))
        print(f"radix={radix}: pair round-trip max err {rt_err:.3e}",
              flush=True)

        r_fwd = chain_rate(fwd, zc, calls, k1=64, k2=1024)
        report(f"fwd_full_r{radix}", r_fwd, {"round_trip_err": rt_err})
        r_inv = chain_rate(inv, zc, calls, k1=64, k2=1024)
        report(f"inv_full_r{radix}", r_inv)

    os.environ["HEXL_TPU_FFT_RADIX"] = "2"
    fft = FL.FFTLike(N, precision="double_float")

    # Layout floor: identical stage walk, butterfly -> plain add/sub.
    def null_bfly(xs, ys, w):
        del w
        add = jax.tree.map(jnp.add, xs, ys)
        sub = jax.tree.map(jnp.subtract, xs, ys)
        return add, sub

    orig_fwd, orig_inv = FL._bfly_fwd_df, FL._bfly_inv_df
    try:
        FL._bfly_fwd_df = null_bfly
        FL._bfly_inv_df = null_bfly

        def null_inv(c, f=fft):
            return FL._inv_2d_df(c, f._st_inv, f.n, f._rows, f._tiles,
                                 f._lane_l, f._w_final, None)

        def null_fwd(c, f=fft):
            return FL._fwd_2d_df(c, f._st_fwd, f.n, f._rows, f._tiles,
                                 f._lane_l, None)

        r = chain_rate(null_fwd, zc, calls, k1=64, k2=1024)
        report("fwd_null_layout", r)
        r = chain_rate(null_inv, zc, calls, k1=64, k2=1024)
        report("inv_null_layout", r)
    finally:
        FL._bfly_fwd_df, FL._bfly_inv_df = orig_fwd, orig_inv

    # Pure-ALU floor: same butterfly count, flat block, no relayout.
    half = jax.tree.map(lambda p: p[:, :N // 2], zc)
    w0 = D.cdf_presplit(D.cdf_from_complex128(
        np.exp(2j * np.pi * np.arange(N // 2) / N)))

    # One renormalizing scale per `stages` butterflies keeps the chained
    # values finite across the scan (~2% op-count overhead, noted here).
    shrink = D.df_from_f64(2.0 ** -float(stages))

    def alu_step(c):
        xs, ys = c, c
        for _ in range(stages):
            xs, ys = FL._bfly_fwd_df(xs, ys, w0)
        return D.cdf_scale(xs, shrink)

    r = chain_rate(alu_step, half, calls, k1=64, k2=1024)
    report("bfly_alu_floor", r, {
        "bflys_per_call": (N // 2) * stages,
        "note": "plus one cdf_scale per step to bound the chain"})

    out = {"protocol": "chain-differential, D2H fetch barrier",
           "n": N, "batch": BATCH,
           "backend": "tpu", "rows": rows}
    (pathlib.Path(__file__).parent / "fft_profile_results.json"
     ).write_text(json.dumps(out, indent=1))
    print("wrote benchmarks/fft_profile_results.json")


if __name__ == "__main__":
    main()
