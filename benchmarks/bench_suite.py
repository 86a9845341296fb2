"""Full benchmark suite mirroring the reference's Google-Benchmark coverage.

Runs every public kernel on the configs the reference benchmarks use
(BASELINE.md "Benchmark suite shape": N in {1024, 4096, 16384} NTTs at
~49/60-bit primes, eltwise ops at their reference sizes) and compares each
row against the measured intel/hexl AVX512-IFMA baseline
(benchmarks/reference_baseline/baseline_results.json).

Methodology: the reference is a single-threaded single-call library; a TPU
is a throughput device, so each op runs on a BATCH of independent vectors
(RNS bases and ciphertext batches are embarrassingly parallel — this is the
library's production shape) and we report amortized per-call time. In
addition, CHAIN applications are serialized inside one dispatch via
lax.scan (each step's output feeds the next step's input) so that device
throughput is measured rather than the host->device dispatch latency of
the attached tunnel. Measured round 3: a timed call on this tunnel
carries ~40-60 ms of fixed overhead (dispatch + sync + the D2H fetch
that is the only reliable completion barrier — block_until_ready alone
under-blocks), so each measurement (a) runs enough dispatches to put
>= ~0.5 s of work on the device, and (b) subtracts a calibrated null-
dispatch overhead. The per-row protocol is recorded in the output
file's "meta" object.

Usage:  python benchmarks/bench_suite.py [--out results.json] [--quick]
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Persistent compilation cache: the suite compiles ~50 kernels.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hexl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

CHAIN = 32


def _chained(op, extra=()):
    """jit(x -> scan of op applied CHAIN times), op's output must be a
    valid input (true for every op benchmarked here; see range notes)."""
    import jax

    def step(c, _):
        return op(c, *extra), None

    return jax.jit(lambda v: jax.lax.scan(step, v, None, length=CHAIN)[0])


_NULL_OVERHEAD = None


def _fetch(out):
    """Force true completion: on this tunnel block_until_ready can return
    before the computation finishes; a D2H fetch of one element cannot."""
    import jax
    import numpy as _np
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _np.asarray(leaf.reshape(-1)[0] if leaf.ndim else leaf)


def _null_overhead():
    """Median fixed cost of a (dispatch burst + sync + fetch) round with
    negligible device work — subtracted from every timed rep. The
    dispatch-enqueue part overlaps device execution for real workloads,
    so this slightly over-corrects; with >= 0.5 s of device work per rep
    the residual bias is under ~2% either way."""
    global _NULL_OVERHEAD
    if _NULL_OVERHEAD is not None:
        return _NULL_OVERHEAD
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((8, 128), jnp.uint32)
    f = jax.jit(lambda v: v + jnp.uint32(1))
    _fetch(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _fetch(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    _NULL_OVERHEAD = ts[len(ts) // 2]
    print(f"[calibration] null dispatch+sync+fetch overhead: "
          f"{_NULL_OVERHEAD*1e3:.1f} ms", flush=True)
    return _NULL_OVERHEAD


def _time_dispatch(fn, args, iters, reps=3, min_rep_seconds=0.5):
    """Median-of-`reps` per-dispatch time, fixed overhead subtracted.

    Each rep runs `iters` back-to-back dispatches (auto-raised until a
    rep is expected to keep the device busy >= min_rep_seconds) and ends
    with one fetch as the completion barrier; the calibrated null-round
    overhead is subtracted before dividing by the dispatch count. Median
    (not min) so an anomalously overlapped or under-synced rep cannot
    set the recorded figure; the run-level re-run policy matches the
    reference baseline's best-of-4 whole-harness protocol
    (reference_baseline/).
    """
    overhead = _null_overhead()
    out = fn(*args)
    _fetch(out)
    # Probe once to auto-scale iters toward min_rep_seconds of work.
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    probe = time.perf_counter() - t0
    per = max(probe - overhead, probe / 100.0) / iters
    iters = min(max(iters, int(min_rep_seconds / max(per, 1e-7)) + 1), 2000)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fetch(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    return max(med - overhead, med / 100.0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="fewer iters / configs (smoke run)")
    args = ap.parse_args()

    import jax

    from hexl_tpu import config, nt
    from hexl_tpu.eltwise import jnp_kernels as ek
    from hexl_tpu.eltwise.jnp_kernels32 import (add_mod32 as ek32_add,
                                                mult_mod32 as ek32_mult)
    from hexl_tpu.limb import to_limbs
    from hexl_tpu.ntt import get_plan

    if config.use_pallas():
        from hexl_tpu.ntt import pallas_ntt as ntt_impl
    else:
        from hexl_tpu.ntt import jnp_ntt as ntt_impl

    base_file = (pathlib.Path(__file__).parent / "reference_baseline"
                 / "baseline_results.json")
    baseline = {}
    if base_file.exists():
        for r in json.loads(base_file.read_text()):
            baseline[(r["kernel"], r["n"], r["q_bits"])] = r["us_per_call"]

    iters = 2 if args.quick else 5
    rng = np.random.default_rng(0)
    rows = []

    def record(kernel, n, q_bits, batch, dt_dispatch, base_key=None,
               base_us=None):
        us = dt_dispatch / (batch * CHAIN) * 1e6
        row = {"kernel": kernel, "n": n, "q_bits": q_bits, "batch": batch,
               "chain": CHAIN, "us_per_call": round(us, 4),
               "calls_per_sec": round(batch * CHAIN / dt_dispatch, 1)}
        base = base_us or baseline.get(base_key or (kernel, n, q_bits))
        if base is not None:
            row["ref_us_per_call"] = base
            row["vs_baseline"] = round(base / us, 3)
        rows.append(row)
        speed = f"  {row.get('vs_baseline', 0):>8}x" \
            if base is not None else "          "
        print(f"{kernel:24s} N={n:<6d} q={q_bits}b batch={batch:<4d} "
              f"{us:10.3f} us/call{speed}", flush=True)

    def rand_u64(batch, n, bound):
        return to_limbs(rng.integers(0, bound, size=(batch, n),
                                     dtype=np.uint64))

    # ---- NTT suite (reference: benchmark/bench-ntt.cpp) ----
    # Chained ranges: fwd OMF=1 output [0,q) feeds IMF=1; fwd lazy runs
    # with IMF=4 so its own [0,4q) output is a valid next input; inv lazy
    # IMF=2 likewise.
    ntt_sizes = [4096] if args.quick else [1024, 4096, 16384]
    for n in ntt_sizes:
        batch = 256 if n <= 4096 else 128
        for q_bits in ([49] if args.quick else [49, 60]):
            q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
            plan = get_plan(n, q)
            x = to_limbs(rng.integers(0, q, size=(batch, n),
                                      dtype=np.uint64))
            cases = [
                ("fwd_ntt", lambda v: ntt_impl.fwd_ntt(v, plan, 1, 1)),
                ("fwd_ntt_lazy", lambda v: ntt_impl.fwd_ntt(v, plan, 4, 4)),
                ("inv_ntt", lambda v: ntt_impl.inv_ntt(v, plan, 1, 1)),
                ("inv_ntt_lazy", lambda v: ntt_impl.inv_ntt(v, plan, 2, 2)),
            ]
            for name, op in cases:
                fn = _chained(op)
                record(name, n, q_bits, batch,
                       _time_dispatch(fn, (x,), iters))

    # ---- Batch sensitivity (VERDICT round 3, Next #8) ----
    # The reference is a single-call library; every other NTT row here
    # amortizes over a large batch. These rows state how the amortized
    # per-call time depends on batch — and, against the single-call Xeon
    # pair latency, the batch at which the TPU crosses it
    # (BASELINE.md gen:batch-table is generated from these).
    if not args.quick:
        n, q_bits = 16384, 60
        q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
        plan = get_plan(n, q)
        base_pair = ((baseline.get(("fwd_ntt", n, q_bits)) or 0)
                     + (baseline.get(("inv_ntt", n, q_bits)) or 0)) or None
        pair_op = _chained(lambda v, p=plan: ntt_impl.inv_ntt(
            ntt_impl.fwd_ntt(v, p, 1, 1), p, 1, 1))
        for batch in (1, 8, 32, 256):
            x = rand_u64(batch, n, q)
            record("fwd+inv_ntt_pair", n, q_bits, batch,
                   _time_dispatch(pair_op, (x,), iters),
                   base_us=base_pair)
        n2, qb2 = 8192, 60
        q2 = nt.generate_primes(1, qb2, True, ntt_size=n2)[0]
        for batch in (1, 32, 1024):
            a, b = rand_u64(batch, n2, q2), rand_u64(batch, n2, q2)
            record("eltwise_mult_mod_bsweep", n2, qb2, batch,
                   _time_dispatch(
                       _chained(lambda x, y, q=q2: ek.mult_mod(x, y, q, 1),
                                (b,)), (a,), iters),
                   base_key=("eltwise_mult_mod", n2, qb2))

    # ---- Eltwise suite (reference: benchmark/bench-eltwise-*.cpp) ----
    elt_batch = 1024
    # add/sub at N=4096, 60-bit
    n, q_bits = 4096, 60
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    a, b = rand_u64(elt_batch, n, q), rand_u64(elt_batch, n, q)
    record("eltwise_add_mod", n, q_bits, elt_batch, _time_dispatch(
        _chained(lambda x, y: ek.add_mod(x, y, q), (b,)), (a,), iters))
    record("eltwise_sub_mod", n, q_bits, elt_batch, _time_dispatch(
        _chained(lambda x, y: ek.sub_mod(x, y, q), (b,)), (a,), iters))

    # mult/reduce at N=8192, 49 & 60-bit
    n = 8192
    for q_bits in (49, 60):
        q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
        a, b = rand_u64(elt_batch, n, q), rand_u64(elt_batch, n, q)
        record("eltwise_mult_mod", n, q_bits, elt_batch, _time_dispatch(
            _chained(lambda x, y, q=q: ek.mult_mod(x, y, q, 1), (b,)),
            (a,), iters))
        a4 = rand_u64(elt_batch, n, 4 * q)
        record("eltwise_reduce_mod", n, q_bits, elt_batch, _time_dispatch(
            _chained(lambda x, q=q: ek.reduce_mod(x, q, 4, 1)),
            (a4,), iters))

    # fma / cmp ops at N=16384, 59-bit
    n, q_bits = 16384, 59
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    a = rand_u64(elt_batch, n, q)
    c = rand_u64(elt_batch, n, q)
    scalar = int(rng.integers(1, q))
    record("eltwise_fma_mod", n, q_bits, elt_batch, _time_dispatch(
        _chained(lambda x, y, q=q, s=scalar: ek.fma_mod(x, s, y, q, 1),
                 (c,)), (a,), iters))
    record("eltwise_cmp_add", n, q_bits, elt_batch, _time_dispatch(
        _chained(lambda x: ek.cmp_add(x, "nle", q // 2, 7)), (a,), iters))
    record("eltwise_cmp_sub_mod", n, q_bits, elt_batch, _time_dispatch(
        _chained(lambda x, q=q: ek.cmp_sub_mod(x, q, "nle", q // 2, 7)),
        (a,), iters))

    # Montgomery family (reference: bench-eltwise-reduce-mod.cpp Mont
    # rows; its fixed bench modulus is 47-bit — match that width so the
    # baseline column lines up. Radix differs by design: reference
    # R=2^46, this framework R=2^64 — same workload class.)
    if not args.quick:
        n, q_bits = 8192, 47
        q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
        a, b = rand_u64(elt_batch, n, q), rand_u64(elt_batch, n, q)
        record("eltwise_mont_form_in", n, q_bits, elt_batch, _time_dispatch(
            _chained(lambda x, q=q: ek.montgomery_form_in(x, q)),
            (a,), iters))
        record("eltwise_mont_form_out", n, q_bits, elt_batch,
               _time_dispatch(
                   _chained(lambda x, q=q: ek.montgomery_form_out(x, q)),
                   (a,), iters))
        record("eltwise_mont_reduce", n, q_bits, elt_batch, _time_dispatch(
            _chained(lambda x, y, q=q: ek.montgomery_mult_reduce(x, y, q),
                     (b,)), (a, ), iters))
        # Full Montgomery round trip form_in -> REDC-mult -> form_out
        # (analogue of the reference's in/out-Montgomery-form variants,
        # bench-eltwise-reduce-mod.cpp BM_EltwiseReduceModInOutMontForm* /
        # BM_EltwiseReduceModMontFormIn*; no baseline row — breadth only).
        b_mont = ek.montgomery_form_in(b, q)
        record("eltwise_mont_inout_roundtrip", n, q_bits, elt_batch,
               _time_dispatch(
                   _chained(lambda x, y, q=q: ek.montgomery_form_out(
                       ek.montgomery_mult_reduce(
                           ek.montgomery_form_in(x, q), y, q), q),
                       (b_mont,)), (a,), iters))

    # Vector-scalar add/sub + FMA-with-addend + reduce-mod range variants
    # (reference registrations: bench-eltwise-add-mod.cpp scalar rows,
    # bench-eltwise-fma-mod.cpp with/without arg3,
    # bench-eltwise-reduce-mod.cpp input-range variants).
    if not args.quick:
        n, q_bits = 4096, 60
        q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
        a = rand_u64(elt_batch, n, q)
        s = int(rng.integers(1, q))
        record("eltwise_add_mod_scalar", n, q_bits, elt_batch,
               _time_dispatch(
                   _chained(lambda x, q=q, s=s: ek.add_mod(x, s, q)),
                   (a,), iters))
        record("eltwise_sub_mod_scalar", n, q_bits, elt_batch,
               _time_dispatch(
                   _chained(lambda x, q=q, s=s: ek.sub_mod(x, s, q)),
                   (a,), iters))
        n = 16384
        q = nt.generate_primes(1, 59, True, ntt_size=n)[0]
        a = rand_u64(elt_batch, n, q)
        s = int(rng.integers(1, q))
        record("eltwise_fma_mod_no_addend", n, 59, elt_batch,
               _time_dispatch(
                   _chained(lambda x, q=q, s=s: ek.fma_mod(x, s, None,
                                                           q, 1)),
                   (a,), iters))
        a2 = rand_u64(elt_batch, n, 2 * q)
        record("eltwise_reduce_mod_2to1", n, 59, elt_batch,
               _time_dispatch(
                   _chained(lambda x, q=q: ek.reduce_mod(x, q, 2, 1)),
                   (a2,), iters))

    # ---- Single-limb fast path (q < 2^30, the DQ-32 regime) ----
    # Raced against the reference's own BitShift=32 kernels (29-bit
    # baseline rows, bench_reference.cpp) — its self-declared
    # best-performance regime (/root/reference/README.md:202-204).
    if not args.quick:
        from hexl_tpu.ntt import ntt32
        for n, batch in ((1 << 10, 1024), (16384, 128), (1 << 17, 16)):
            q = nt.generate_primes(1, 29, True, ntt_size=n)[0]
            plan = get_plan(n, q)
            x32 = jax.numpy.asarray(
                rng.integers(0, q, size=(batch, n), dtype=np.uint64
                             ).astype(np.uint32))
            f32 = (ntt32.fwd_ntt32_pallas if config.use_pallas()
                   else ntt32.fwd_ntt32)
            i32 = (ntt32.inv_ntt32_pallas if config.use_pallas()
                   else ntt32.inv_ntt32)
            pair32 = jax.jit(lambda v, p=plan: jax.lax.scan(
                lambda c, _: (i32(f32(c, p, 1, 1), p, 1, 1), None),
                v, None, length=CHAIN)[0])
            base_pair32 = ((baseline.get(("fwd_ntt", n, 29)) or 0)
                           + (baseline.get(("inv_ntt", n, 29)) or 0)) \
                or None
            record("fwd+inv_ntt32_pair", n, 29, batch,
                   _time_dispatch(pair32, (x32,), iters),
                   base_us=base_pair32)

    # ---- Large-N NTTs (hierarchical two-kernel path) ----
    if not args.quick:
        for n, batch in ((1 << 16, 32), (1 << 17, 16)):
            q = nt.generate_primes(1, 60, True, ntt_size=n)[0]
            plan = get_plan(n, q)
            x = rand_u64(batch, n, q)
            for name, op in (
                ("fwd_ntt", lambda v, p=plan: ntt_impl.fwd_ntt(v, p, 1, 1)),
                ("inv_ntt", lambda v, p=plan: ntt_impl.inv_ntt(v, p, 1, 1)),
            ):
                record(name, n, 60, batch,
                       _time_dispatch(_chained(op), (x,), iters))

    # ---- Composite: fused multi-op eltwise chain (dyadic MAC) ----
    # a*b + c*d mod q — the case the generic Pallas runner exists for
    # (many eltwise ops in one VMEM residency). Benchmarked both ways so
    # the dispatcher default stays measured (see eltwise/ops.py:_run).
    if not args.quick:
        from hexl_tpu.eltwise import jnp_kernels as ekk
        from hexl_tpu.eltwise import pallas_kernels as epk
        n, q_bits, mac_batch = 8192, 60, 1024
        q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
        a, b, d2 = (rand_u64(mac_batch, n, q) for _ in range(3))

        def mac(x, y, w, qq=q):
            # Both products take the carried operand so neither is
            # loop-invariant under the scan (a z-constant second product
            # gets hoisted and the row under-reports).
            return ekk.add_mod(ekk.mult_mod(x, y, qq, 1),
                               ekk.mult_mod(x, w, qq, 1), qq)

        record("eltwise_mac_fused_xla", n, q_bits, mac_batch,
               _time_dispatch(_chained(mac, (b, d2)), (a,), iters))
        record("eltwise_mac_fused_pallas", n, q_bits, mac_batch,
               _time_dispatch(
                   _chained(lambda x, y, w: epk.run_eltwise(
                       mac, (x, y, w)), (b, d2)), (a,), iters))

    # ---- Composite: fused poly-mult pipeline ----
    if not args.quick:
        from hexl_tpu import poly
        n, q_bits, batch = 16384, 60, 64
        q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
        plan = get_plan(n, q)
        impl = (poly._poly_mult_pallas if config.use_pallas()
                else poly._poly_mult_xla)
        a, b = rand_u64(batch, n, q), rand_u64(batch, n, q)
        record("poly_mult_pipeline", n, q_bits, batch, _time_dispatch(
            _chained(lambda x, y: impl(x, y, plan), (b,)), (a,), iters))

        # North-star shape (BASELINE.md): RNS poly-mult, N=2^17 x 16
        # primes, on this chip (multi-chip via parallel.dist_rns_poly_mult
        # needs a pod). One fused chain per prime inside one jit.
        n, batch = 1 << 17, 1
        primes = nt.generate_primes(4, 50, True, ntt_size=n)
        plans = [get_plan(n, int(p)) for p in primes]
        pimpl = (poly._poly_mult_staged if config.use_pallas()
                 else poly._poly_mult_xla)

        def rns_chain(av, bv):
            outs_hi, outs_lo = [], []
            for i, p in enumerate(plans):
                ai = type(av)(av.hi[i], av.lo[i])
                bi = type(bv)(bv.hi[i], bv.lo[i])
                o = pimpl(ai, bi, p)
                outs_hi.append(o.hi)
                outs_lo.append(o.lo)
            import jax.numpy as _jnp
            return type(av)(_jnp.stack(outs_hi), _jnp.stack(outs_lo))

        a = rand_u64(4, n, min(int(p) for p in primes))
        b = rand_u64(4, n, min(int(p) for p in primes))
        record("rns_poly_mult_4x", n, 50, 4, _time_dispatch(
            _chained(lambda x, y: rns_chain(x, y), (b,)), (a,),
            max(1, iters // 2)))

    # ---- MXU (matmul four-step) NTT regime ----
    if not args.quick:
        from hexl_tpu.ntt import mxu_ntt
        for n, q_bits, batch in ((1 << 10, 49, 256), (1 << 14, 49, 128),
                                 (1 << 14, 60, 128)):
            q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
            mplan = mxu_ntt.get_mxu_plan(n, q)
            x = rand_u64(batch, n, q)
            pair = _chained(lambda v, p=mplan: mxu_ntt.inv_ntt_mxu(
                mxu_ntt.fwd_ntt_mxu(v, p, 1, 1), p, 1, 1))
            record("fwd+inv_ntt_mxu_pair", n, q_bits, batch,
                   _time_dispatch(pair, (x,), max(1, iters // 2)))

    # ---- FFT-like (reference: benchmark/bench-fft-like.cpp) ----
    if not args.quick:
        from hexl_tpu.experimental import fft_like as FL
        from hexl_tpu.experimental.df32 import cdf_from_complex128
        for n in (4096, 16384):
            fft = FL.FFTLike(n, precision="double_float")
            z = (rng.normal(size=(32, n)) + 1j * rng.normal(size=(32, n)))
            zc = cdf_from_complex128(z)
            def fft_pair(c, ff=fft):
                return ff.df_inv_body(ff.df_fwd_body(c))

            fn = _chained(fft_pair)
            dt = _time_dispatch(fn, (zc,), iters)
            # Record per-call as one fwd+inv pair; reference rows are
            # per-direction (fwd_fft_like / inv_fft_like), so compare the
            # pair against their sum.
            us = dt / (32 * CHAIN) * 1e6
            base_f = baseline.get(("fwd_fft_like", n, 0))
            base_i = baseline.get(("inv_fft_like", n, 0))
            row = {"kernel": "fwd+inv_fft_like_pair", "n": n, "q_bits": 0,
                   "batch": 32, "chain": CHAIN, "us_per_call": round(us, 4),
                   "calls_per_sec": round(32 * CHAIN / dt, 1)}
            if base_f and base_i:
                row["ref_us_per_call"] = base_f + base_i
                row["vs_baseline"] = round((base_f + base_i) / us, 3)
            rows.append(row)
            print(f"{'fwd+inv_fft_like_pair':24s} N={n:<6d} q=-   "
                  f"batch=32   {us:10.3f} us/call  "
                  f"{row.get('vs_baseline', '')}", flush=True)

            # Per-direction scaled rows (reference registrations
            # BM_Fwd/InvFFTLikeAVX512InPlaceScaled; the compiled baseline's
            # fwd_fft_like/inv_fft_like rows pass a fused scale —
            # bench_reference.cpp:195-201). scalar=1/n bounds the chained
            # values (|FFT(x)|_inf <= n |x|_inf), so the scan stays finite.
            from hexl_tpu.experimental.df32 import df_from_f64
            sc = df_from_f64(1.0 / n)
            for name, body in (
                    ("fwd_fft_like", lambda c, ff=fft, s=sc:
                        ff.df_fwd_body(c, scalar=s)),
                    ("inv_fft_like", lambda c, ff=fft, s=sc:
                        ff.df_inv_body(c, scalar=s))):
                fn1 = _chained(body)
                dt1 = _time_dispatch(fn1, (zc,), iters)
                us1 = dt1 / (32 * CHAIN) * 1e6
                base = baseline.get((name, n, 0))
                row1 = {"kernel": name, "n": n, "q_bits": 0, "batch": 32,
                        "chain": CHAIN, "us_per_call": round(us1, 4),
                        "calls_per_sec": round(32 * CHAIN / dt1, 1)}
                if base:
                    row1["ref_us_per_call"] = base
                    row1["vs_baseline"] = round(base / us1, 3)
                rows.append(row1)
                print(f"{name:24s} N={n:<6d} q=-   batch=32   "
                      f"{us1:10.3f} us/call  "
                      f"{row1.get('vs_baseline', '')}", flush=True)

    # ---- KeySwitch (reference: experimental/seal) at production CKKS
    # shapes: the round-3 row (n=2^14, ds=3), the SEAL-typical deeper and
    # larger shapes (ds=5, n=2^15 — VERDICT round 3, Next #9), and a
    # batched (4 independent switches vmapped in one dispatch) variant
    # showing how the stacked accumulation/flush amortizes. ----
    if not args.quick:
        from hexl_tpu.experimental.key_switch import key_switch

        def bench_key_switch(n, ds, name, batch=1):
            kc = 2
            kms, rns = ds + 1, ds + 1
            moduli = nt.generate_primes(kms, 49, True, ntt_size=n)
            qk = moduli[-1]
            t_np = np.stack(
                [rng.integers(0, q, n, np.uint64) for q in moduli[:ds]])
            keys_np = rng.integers(0, min(moduli), size=(ds, kc, kms, n),
                                   dtype=np.uint64)
            for j in range(ds):
                for k in range(kc):
                    for m_i, q in enumerate(moduli):
                        keys_np[j, k, m_i] %= np.uint64(q)
            keys = to_limbs(keys_np)
            msf = [nt.inverse_mod(qk % q, q) for q in moduli[:ds]]
            r_np = np.stack(
                [np.stack([rng.integers(0, q, n, np.uint64)
                           for q in moduli[:ds]]) for _ in range(kc)])
            if batch == 1:
                t_in = to_limbs(t_np)
                res0 = to_limbs(r_np)

                def ks_call(r, t, kk):
                    return key_switch(r, t, n, ds, kms, rns, kc, moduli,
                                      kk, msf)
            else:
                import jax as _jax

                from hexl_tpu import config as _cfg
                from hexl_tpu.experimental.key_switch import \
                    _jitted_key_switch
                t_in = to_limbs(np.stack([t_np] * batch))
                res0 = to_limbs(np.stack([r_np] * batch))
                inner = _jitted_key_switch(n, ds, kms, rns, kc,
                                           tuple(moduli), tuple(msf),
                                           _cfg.trace_config())
                ks_call = _jax.jit(_jax.vmap(inner,
                                             in_axes=(0, 0, None)))

            def ks_step(t, r, kk):
                # Chain on the TARGET, not the result accumulator: the
                # accumulator only feeds the final add_mod, so a result-
                # carried chain lets XLA hoist the whole pipeline out of
                # the scan (measured: 32x under-report). The output's
                # first component (kc=0) is (ds, n) in NTT form mod
                # moduli[:ds] — a valid next target, making every step's
                # full pipeline carry-dependent.
                out = ks_call(r, t, kk)
                from hexl_tpu.limb import U64 as _U
                if batch == 1:
                    return _U(out.hi[0], out.lo[0])
                return _U(out.hi[:, 0], out.lo[:, 0])

            _ = ks_step(t_in, res0, keys)  # build plans eagerly
            fn = _chained(lambda t: ks_step(t, res0, keys))
            record(name, n, 49, batch,
                   _time_dispatch(fn, (t_in,), max(1, iters // 2)),
                   base_key=(name if batch == 1 else "key_switch", n, 49))

        bench_key_switch(1 << 14, 3, "key_switch")
        bench_key_switch(1 << 14, 5, "key_switch_ds5")
        bench_key_switch(1 << 15, 3, "key_switch")
        bench_key_switch(1 << 14, 3, "key_switch", batch=4)

    # ---- DyadicMultiply (ct x ct in NTT form; the reference repo has
    # no bench-dyadic registration, so the baseline row comes from our
    # bench_reference.cpp harness calling the reference's DyadicMultiply
    # at the same shape) ----
    if not args.quick:
        from hexl_tpu.experimental.dyadic import _jitted as _dyadic_jitted
        n_d, m_d = 1 << 14, 4
        moduli_d = tuple(nt.generate_primes(m_d, 50, True, ntt_size=n_d))
        x_np = np.stack([np.stack([rng.integers(0, q, n_d, np.uint64)
                                   for q in moduli_d]) for _ in range(2)])
        y_np = np.stack([np.stack([rng.integers(0, q, n_d, np.uint64)
                                   for q in moduli_d]) for _ in range(2)])
        x_d, y_d = to_limbs(x_np), to_limbs(y_np)
        dy = _dyadic_jitted(moduli_d)

        def dy_step(c, y):
            # output (3, M, n) -> reuse first two polys as next operand
            out = dy(c, y)
            from hexl_tpu.limb import U64 as _U
            return _U(out.hi[:2], out.lo[:2])

        fn = _chained(lambda c: dy_step(c, y_d))
        dt = _time_dispatch(fn, (x_d,), iters)
        us = dt / CHAIN * 1e6
        row = {"kernel": "dyadic_multiply", "n": n_d, "q_bits": 50,
               "batch": m_d, "chain": CHAIN,
               "us_per_call": round(us, 4),
               "calls_per_sec": round(CHAIN / dt, 1)}
        base = baseline.get(("dyadic_multiply", n_d, 50))
        if base is not None:
            row["ref_us_per_call"] = base
            row["vs_baseline"] = round(base / us, 3)
        rows.append(row)
        print(f"{'dyadic_multiply':24s} N={n_d:<6d} q=50b batch={m_d:<4d} "
              f"{us:10.3f} us/call  {row.get('vs_baseline', '')}",
              flush=True)

    # ---- Stacked multi-modulus (RNS) NTT vs per-modulus loop ----
    # The production RNS shape: one polynomial degree over k primes. The
    # stacked path (ntt/rns.py) runs ONE vmapped transform; the loop runs
    # k singles inside one jit (what the reference's caller structure
    # maps to). Same data, bit-identical outputs.
    if not args.quick:
        from hexl_tpu.limb import U64
        from hexl_tpu.ntt import jnp_ntt as _jn
        from hexl_tpu.ntt.rns import fwd_ntt_rns, get_rns_plan
        n, kprimes, rbatch = 1 << 14, 4, 32
        moduli_r = nt.generate_primes(kprimes, 49, True, ntt_size=n)
        rplan = get_rns_plan(n, moduli_r)
        x_np = np.stack([rng.integers(0, q, (rbatch, n), np.uint64)
                         for q in moduli_r])
        x_r = to_limbs(x_np)
        fn_stacked = _chained(lambda v: fwd_ntt_rns(v, rplan, 1, 1))
        dt = _time_dispatch(fn_stacked, (x_r,), iters)
        record("rns_fwd_ntt_stacked", n, 49, kprimes * rbatch, dt)

        plans_r = [get_plan(n, q) for q in moduli_r]

        def loop_fwd(v):
            outs = [_jn.fwd_ntt(U64(v.hi[i], v.lo[i]), plans_r[i], 1, 1)
                    for i in range(kprimes)]
            import jax.numpy as _jnp
            return U64(_jnp.stack([o.hi for o in outs]),
                       _jnp.stack([o.lo for o in outs]))

        fn_loop = _chained(loop_fwd)
        dt = _time_dispatch(fn_loop, (x_r,), iters)
        record("rns_fwd_ntt_looped", n, 49, kprimes * rbatch, dt)

    # ---- Small-q eltwise regime (q < 2^30, single uint32 plane) ----
    if not args.quick:
        n, q_bits = 8192, 29
        q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
        a, b = rand_u64(elt_batch, n, q), rand_u64(elt_batch, n, q)
        record("eltwise_mult_mod", n, q_bits, elt_batch, _time_dispatch(
            _chained(lambda x, y, q=q: ek32_mult(x, y, q), (b,)),
            (a,), iters))
        record("eltwise_add_mod", n, q_bits, elt_batch, _time_dispatch(
            _chained(lambda x, y, q=q: ek32_add(x, y, q), (b,)),
            (a,), iters))

    print(f"\nplatform={jax.default_backend()}  "
          f"pallas={config.use_pallas()}  chain={CHAIN}  rows={len(rows)}")
    # Record the exact tree state measured so docs can detect staleness
    # (round-3 verdict: a code change after the last refresh left a
    # docstring claim with no matching committed row).
    try:
        import subprocess
        repo = str(pathlib.Path(__file__).resolve().parents[1])
        git_sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=repo).stdout.strip() or None
        git_dirty = bool(subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True,
            text=True, cwd=repo).stdout.strip())
    except Exception:
        git_sha, git_dirty = None, None
    meta = {
        "git_sha": git_sha,
        "git_dirty": git_dirty,
        "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "backend": jax.default_backend(),
        "jax_version": jax.__version__,
        "chain": CHAIN,
        "reps": 3,
        "rep_stat": "median, calibrated null-round overhead subtracted",
        "completion_barrier": "block_until_ready + D2H fetch of one "
                              "element (tunnel under-blocks otherwise)",
        "null_overhead_ms": round((_NULL_OVERHEAD or 0) * 1e3, 2),
        "min_rep_seconds": 0.5,
        "ntt_backend": config.ntt_backend(),
        "ntt_radix": config.ntt_radix(),
        "approx_butterflies": config.approx_butterflies(),
    }
    out_path = args.out or str(pathlib.Path(__file__).parent
                               / "tpu_results.json")
    pathlib.Path(out_path).write_text(
        json.dumps({"meta": meta, "rows": rows}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
