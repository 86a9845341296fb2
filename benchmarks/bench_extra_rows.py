"""Measure rows added after the last full suite refresh and merge them
into benchmarks/tpu_results.json.

Reuses bench_suite's protocol helpers verbatim (_chained CHAIN=32 scan,
calibrated null-round subtraction, D2H-fetch completion barrier,
median-of-3 reps) so the merged rows are protocol-identical to the full
refresh; each partial update is recorded in meta["partial_updates"] so a
merged artifact can't masquerade as a single-shot sweep. Shapes MUST
match the corresponding bench_suite.py sections (fft-like: batch 32,
n in {4096, 16384}; montgomery: batch 1024, n=8192, 47-bit).

Usage: timeout 1800 python benchmarks/bench_extra_rows.py
"""

import datetime
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench_suite as BS  # noqa: E402  (benchmarks/ on path via __main__)
import numpy as np  # noqa: E402

RESULTS = pathlib.Path(__file__).parent / "tpu_results.json"


def main():
    import jax

    from hexl_tpu import nt
    from hexl_tpu.eltwise import jnp_kernels as ek
    from hexl_tpu.experimental import fft_like as FL
    from hexl_tpu.experimental.df32 import cdf_from_complex128, df_from_f64
    from hexl_tpu.limb import to_limbs

    base_file = (pathlib.Path(__file__).parent / "reference_baseline"
                 / "baseline_results.json")
    baseline = {}
    if base_file.exists():
        for r in json.loads(base_file.read_text()):
            baseline[(r["kernel"], r["n"], r["q_bits"])] = r["us_per_call"]

    rng = np.random.default_rng(0)
    new_rows = []

    def record(kernel, n, q_bits, batch, dt):
        us = dt / (batch * BS.CHAIN) * 1e6
        row = {"kernel": kernel, "n": n, "q_bits": q_bits, "batch": batch,
               "chain": BS.CHAIN, "us_per_call": round(us, 4),
               "calls_per_sec": round(batch * BS.CHAIN / dt, 1)}
        base = baseline.get((kernel, n, q_bits))
        if base is not None:
            row["ref_us_per_call"] = base
            row["vs_baseline"] = round(base / us, 3)
        new_rows.append(row)
        print(f"{kernel:28s} N={n:<6d} {us:10.3f} us/call  "
              f"{row.get('vs_baseline', '')}", flush=True)

    # Per-direction scaled FFT-like rows (see bench_suite.py FFT section).
    for n in (4096, 16384):
        fft = FL.FFTLike(n, precision="double_float")
        z = rng.normal(size=(32, n)) + 1j * rng.normal(size=(32, n))
        zc = cdf_from_complex128(z)
        sc = df_from_f64(1.0 / n)
        for name, body in (
                ("fwd_fft_like", lambda c, ff=fft, s=sc:
                    ff.df_fwd_body(c, scalar=s)),
                ("inv_fft_like", lambda c, ff=fft, s=sc:
                    ff.df_inv_body(c, scalar=s))):
            fn = BS._chained(body)
            record(name, n, 0, 32, BS._time_dispatch(fn, (zc,), 5))

    # Montgomery round trip (see bench_suite.py Montgomery section).
    n, q_bits, elt_batch = 8192, 47, 1024
    q = nt.generate_primes(1, q_bits, True, ntt_size=n)[0]
    a = to_limbs(rng.integers(0, q, size=(elt_batch, n), dtype=np.uint64))
    b = to_limbs(rng.integers(0, q, size=(elt_batch, n), dtype=np.uint64))
    b_mont = ek.montgomery_form_in(b, q)
    record("eltwise_mont_inout_roundtrip", n, q_bits, elt_batch,
           BS._time_dispatch(
               BS._chained(lambda x, y, q=q: ek.montgomery_form_out(
                   ek.montgomery_mult_reduce(
                       ek.montgomery_form_in(x, q), y, q), q),
                   (b_mont,)), (a,), 5))

    data = json.loads(RESULTS.read_text())
    rows = data["rows"]
    index = {(r["kernel"], r["n"], r["q_bits"], r["batch"]): i
             for i, r in enumerate(rows)}
    for row in new_rows:
        key = (row["kernel"], row["n"], row["q_bits"], row["batch"])
        if key in index:
            rows[index[key]] = row
        else:
            rows.append(row)
    data.setdefault("meta", {}).setdefault("partial_updates", []).append({
        "date": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%d %H:%M UTC"),
        "script": "bench_extra_rows.py",
        "jax_version": jax.__version__,
        "null_overhead_ms": round(BS._null_overhead() * 1e3, 2),
        "rows": [r["kernel"] for r in new_rows],
    })
    RESULTS.write_text(json.dumps(data, indent=1) + "\n")
    print(f"merged {len(new_rows)} rows into {RESULTS}")


if __name__ == "__main__":
    main()
