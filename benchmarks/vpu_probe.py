"""VPU issue-rate probe — the denominator behind the headline MFU claim.

Protocol-correct rewrite (VERDICT round 3, Weak #1 / Next #2): every
rate is a chain-length DIFFERENTIAL between two single-dispatch
lax.scan programs, each ended by a D2H fetch barrier (benchmarks/
timing.py) — the round-2 version used a bare block_until_ready, the
exact mechanism BASELINE.md documents as under-blocking on this tunnel.

Two regimes per op class:
  * throughput  — 4M-lane arrays: each scan step is ~4k independent
    vector instructions, so the rate is the machine's sustained issue
    throughput (the correct MFU denominator for a batched NTT body).
  * latency     — 1024-lane arrays (one native (8,128) vreg): each scan
    step is a chain of register-dependent instructions, measuring the
    dependent-issue (latency-bound) rate; the xN variants interleave N
    independent chains to show how many streams saturate the pipeline.
    If xN >> x1, a latency-bound body could gain from exposing ILP —
    if the throughput rate already matches xN, a batched body cannot.

Also measures the f32 datapath (mul, mul+add contraction, Dekker
two_prod) to size the float-path candidate for q < 2^50 (VERDICT
Next #1; reference lane: eltwise-mult-mod-avx512dq.cpp:576-615), and
the limb vocabulary up to the lean16 butterfly.

Writes benchmarks/vpu_probe_results.json (cited by BASELINE.md gen:mfu).

Usage: timeout 580 python benchmarks/vpu_probe.py
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hexl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from timing import chain_rate  # noqa: E402  (benchmarks/ is cwd-agnostic)

NELEM = 4 * 1024 * 1024   # throughput regime: 16 MB per u32 plane
NLAT = 1024               # latency regime: one native (8, 128) vreg

ROWS = []


def report(name, rate, unit="op", note=""):
    print(f"{name:36s} {rate/1e9:10.2f} G{unit}/s   {note}", flush=True)
    ROWS.append({"name": name, "rate_e9": round(rate / 1e9, 3),
                 "unit": unit, "note": note})
    return rate


def main():
    import jax
    import jax.numpy as jnp

    from hexl_tpu.limb import (U64, add64, const64, cond_sub64_half,
                               mulhi64_approx6, mullo64, sub64, to_limbs,
                               umul32_wide)
    from hexl_tpu.ntt.jnp_ntt import _fwd_butterfly_lean16

    rng = np.random.default_rng(0)
    print(f"probe backend={jax.default_backend()}  protocol="
          f"chain-differential (k1=256,k2=4096), D2H fetch barrier")

    u = jnp.asarray(rng.integers(0, 2**32, size=NELEM, dtype=np.uint64)
                    .astype(np.uint32)).reshape(-1, 128)
    f = jnp.asarray(rng.random(NELEM, dtype=np.float32) + 0.5
                    ).reshape(-1, 128)
    ul = jnp.asarray(rng.integers(0, 2**32, size=NLAT, dtype=np.uint64)
                     .astype(np.uint32)).reshape(-1, 128)
    fl = jnp.asarray(rng.random(NLAT, dtype=np.float32) + 0.5
                     ).reshape(-1, 128)

    # ---- 1. FMA contraction detector -----------------------------------
    # p is computed in its own jit; a*b - p in another. Without
    # contraction a*b re-rounds to exactly p -> residual 0 everywhere;
    # with mul+sub fused to a real FMA the residual is the exact
    # rounding error of a*b (nonzero for ~half of random inputs).
    a = jnp.asarray(rng.random(8192, dtype=np.float32) + 1.0)
    b = jnp.asarray(rng.random(8192, dtype=np.float32) + 1.0)
    p = jax.jit(lambda a, b: a * b)(a, b)
    resid = np.asarray(jax.jit(lambda a, b, p: a * b - p)(a, b, p))
    fma_contract = bool((resid != 0).mean() > 0.01)
    print(f"f32 mul+sub contracts to FMA: {fma_contract} "
          f"(nonzero residual fraction {(resid != 0).mean():.3f})")
    ROWS.append({"name": "fma_contraction", "rate_e9": None, "unit": "bool",
                 "note": str(fma_contract)})

    # ---- 2. throughput regime (4M lanes) -------------------------------
    def rep(step_1op, reps):
        def step(x):
            for _ in range(reps):
                x = step_1op(x)
            return x
        return step

    r = chain_rate(rep(lambda x: x * x, 64), u, NELEM * 64)
    mul_rate = report("thru u32 mul (x*x)", r, "mul")

    r = chain_rate(rep(lambda x: x + (x >> 3), 32), u, 2 * NELEM * 32)
    report("thru u32 add+shift", r, "op")

    c_u = jnp.uint32(0x80000000)

    def cmpsel(x):
        return jnp.where(x > c_u, x - c_u, x + jnp.uint32(1))
    r = chain_rate(rep(cmpsel, 16), u, 4 * NELEM * 16)
    report("thru u32 cmp/sub/add/sel", r, "op")

    r = chain_rate(rep(lambda x: x * x, 64), f, NELEM * 64)
    f32_mul = report("thru f32 mul (x*x)", r, "mul")

    cf = jnp.float32(-0.5)
    r = chain_rate(rep(lambda x: x * x + cf, 64), f, NELEM * 64)
    f32_fma = report("thru f32 mul+add (x*x+c)", r, "fma",
                     f"{r / f32_mul:.2f}x of mul rate -> "
                     f"{'fused' if r > 0.8 * f32_mul else 'two issues'}")

    # Dekker two_prod against a traced constant multiplicand (twiddle
    # case: the constant's split is precomputed/folded).
    csp = jnp.float32(4097.0)

    def two_prod_step(x):
        ch = jnp.float32(1.25)
        cl = jnp.float32(1.25e-8)
        xc = csp * x
        xh = xc - (xc - x)
        xl = x - xh
        pr = x * ch
        e = ((xh * ch - pr) + xh * cl + xl * ch) + xl * cl
        return pr * jnp.float32(0.5) + e
    r = chain_rate(rep(two_prod_step, 16), f, NELEM * 16)
    report("thru f32 dekker two_prod(x,const)", r, "two_prod",
           f"= {mul_rate / r:.1f} mul-equivalents")

    # ---- 3. latency regime (1 vreg), dependent vs N independent --------
    REPS_L = 512

    def lat(nchains, arr):
        xs = tuple(arr + jnp.uint32(i) if arr.dtype == jnp.uint32
                   else arr + jnp.float32(i) for i in range(nchains))

        def step_n(xs):
            for _ in range(REPS_L):
                xs = tuple(x * x for x in xs)
            return xs
        return chain_rate(step_n, xs, nchains * NLAT * REPS_L,
                          k1=512, k2=8192)

    l1 = report("lat  u32 mul x1 chain", lat(1, ul), "mul")
    l4 = lat(4, ul)
    report("lat  u32 mul x4 chains", l4, "mul", f"{l4 / l1:.2f}x of x1")
    lf1 = report("lat  f32 mul x1 chain", lat(1, fl), "mul")
    lf4 = lat(4, fl)
    report("lat  f32 mul x4 chains", lf4, "mul", f"{lf4 / lf1:.2f}x of x1")

    # ---- 4. limb vocabulary (throughput regime) ------------------------
    def wide_step(x):
        for _ in range(8):
            h, lo = umul32_wide(x, x)
            x = h ^ lo
        return x
    r = chain_rate(wide_step, u, NELEM * 8)
    report("thru umul32_wide(x,x)", r, "widemul",
           f"= {mul_rate / r:.1f} mul-equivalents")

    # The butterfly chain is measured at the HEADLINE modulus with the
    # scheme _bflys3 actually selects for it (the round-4 verdict found
    # the probe pinning lean16 while the headline prime, in
    # (2^60, 2^61), runs a different scheme — the MFU denominator must
    # name and measure the selected butterflies, both directions).
    from hexl_tpu import nt
    from hexl_tpu.ntt import jnp_ntt as _j

    q_int = int(nt.generate_primes(1, 60, True, ntt_size=1 << 14)[0])
    w_int = 0x0123456789ABCDE5 % q_int
    wp_int = (w_int << 64) // q_int
    q64, two_q = const64(q_int), const64(2 * q_int)
    w64, wp64 = const64(w_int), const64(wp_int)
    xu = to_limbs(rng.integers(0, q_int, size=NELEM, dtype=np.uint64))
    xu = U64(xu.hi.reshape(-1, 128), xu.lo.reshape(-1, 128))

    def shoup_lean_step(x):
        for _ in range(4):
            q_hat = mulhi64_approx6(x, wp64)
            rr = sub64(mullo64(x, w64), mullo64(q_hat, q64))
            rr = cond_sub64_half(rr, add64(two_q, two_q))
            x = cond_sub64_half(rr, two_q)
        return x
    r = chain_rate(shoup_lean_step, xu, NELEM * 4)
    shoup_rate = report("thru shoup lean (approx6) mul", r, "shoupmul",
                        f"= {mul_rate / r:.1f} mul-equivalents")

    fwd_bfly, inv_bfly, scheme = _j._bflys3(
        q_int < _j.LEAN_APPROX_MAX_Q, q_int < _j.LEAN16_MAX_Q)
    print(f"headline prime q={q_int} ({q_int.bit_length()} bits) -> "
          f"scheme '{scheme}'")
    ROWS.append({"name": "headline_scheme", "rate_e9": None,
                 "unit": "str", "note": scheme})

    def bfly_step(bfly):
        def step(xy):
            x, y = xy
            for _ in range(2):
                nx, ny = bfly(x, y, w64, wp64, q64, two_q)
                x, y = ny, nx
            return (x, y)
        return step
    r = chain_rate(bfly_step(fwd_bfly), (xu, xu), NELEM * 2)
    bfly_rate = report(f"thru {scheme} fwd butterfly (selected)", r,
                       "bfly", f"= {mul_rate / r:.1f} mul-equivalents")
    r = chain_rate(bfly_step(inv_bfly), (xu, xu), NELEM * 2)
    ibfly_rate = report(f"thru {scheme} inv butterfly (selected)", r,
                        "bfly", f"= {mul_rate / r:.1f} mul-equivalents")
    # Reference point: the q<2^60 single-halver forward family.
    r = chain_rate(bfly_step(_fwd_butterfly_lean16), (xu, xu), NELEM * 2)
    report("thru lean16 fwd butterfly", r, "bfly",
           f"= {mul_rate / r:.1f} mul-equivalents")
    # Effective pair denominator: a fwd+inv pair runs equal counts of
    # each direction -> harmonic mean of the two chain rates.
    pair_bfly_rate = 2.0 / (1.0 / bfly_rate + 1.0 / ibfly_rate)

    # ---- 5. headline context -------------------------------------------
    res_file = pathlib.Path(__file__).parent / "tpu_results.json"
    headline = None
    if res_file.exists():
        rows = json.loads(res_file.read_text())["rows"]
        us = {(r["kernel"], r["n"], r["q_bits"]): r["us_per_call"]
              for r in rows}
        fwd = us.get(("fwd_ntt", 16384, 60))
        inv = us.get(("inv_ntt", 16384, 60))
        if fwd and inv:
            n = 16384
            pairs = 1e6 / (fwd + inv)
            bflys = pairs * (n // 2) * int(np.log2(n)) * 2
            headline = {
                "pairs_per_s": round(pairs, 1),
                "gbfly_per_s": round(bflys / 1e9, 2),
                "scheme": scheme,
                "pct_of_selected_bfly_chain": round(
                    100 * bflys / pair_bfly_rate, 1),
                "pct_of_mul_ceiling_24": round(
                    100 * bflys / (mul_rate / 24), 1),
            }
            print(f"\nheadline (committed JSON): {pairs:,.0f} pairs/s = "
                  f"{bflys/1e9:.2f} Gbfly/s = "
                  f"{100*bflys/pair_bfly_rate:.0f}% of the selected "
                  f"'{scheme}' fwd/inv butterfly chain rate (harmonic "
                  f"mean {pair_bfly_rate/1e9:.2f} Gbfly/s), "
                  f"{100*bflys/(mul_rate/24):.0f}% of the 24-mul/bfly "
                  f"raw-multiply ceiling")

    out = {"protocol": "chain-differential (T(k2)-T(k1)), lax.scan, "
                       "D2H fetch barrier, median of 3",
           "backend": jax.default_backend(),
           "nelem_throughput": NELEM, "nelem_latency": NLAT,
           "fma_contraction": fma_contract,
           "rows": ROWS, "headline_context": headline}
    out_path = pathlib.Path(__file__).parent / "vpu_probe_results.json"
    out_path.write_text(json.dumps(out, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
