"""Dispatch-defaults sweep: every frozen default traceable to a row.

Sweeps the u64 NTT stage-walker radix and phase-B lane packing over the
(N, q_bits) grid the dispatch gates cover, under the standard protocol
(chain-length differential, D2H fetch barrier — benchmarks/timing.py).
The committed JSON (dispatch_sweep_results.json) is what the defaults in
hexl_tpu/config.py (HEXL_TPU_NTT_RADIX default, pack-auto size classes)
cite; re-running it after a toolchain update catches regressions like
the round-4 small-N 49-bit inversion (VERDICT round 4, Weak #3/#5).

The 29-bit family dispatches to the single-limb ntt32 path, which has no
radix/pack knobs — it is measured once per size for the record.

Each (N, q_bits) cell runs in a child process: the tunnel degrades after
a few hundred distinct kernel compiles in one process (CLAUDE.md).

Usage:
  python benchmarks/dispatch_sweep.py            # orchestrate all cells
  python benchmarks/dispatch_sweep.py CELL 12 60 # one cell (internal)
"""

import json
import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hexl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HERE = pathlib.Path(__file__).resolve().parent
RESULTS = HERE / "dispatch_sweep_results.json"

LOG_NS = (10, 11, 12, 13, 14)
RADIXES = ("2,2", "4,4", "4,8", "8,8", "8,4", "8,16", "16,8", "16,16")
BATCH = 256


def _measure_pair(impl, plan, q, batch, n):
    """us per fwd+inv pair (per polynomial), chain differential."""
    import numpy as np
    from timing import chain_rate
    from hexl_tpu.limb import to_limbs

    def step(v):
        return impl.inv_ntt(impl.fwd_ntt(v, plan, 1, 1), plan, 1, 1)

    rng = np.random.default_rng(0)
    x = to_limbs(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
    est_us = max(0.3, n / 1800.0)  # rough amortized pair cost
    k2 = int(min(4096, max(96, 5e5 / (batch * est_us))))
    rate = chain_rate(step, x, batch, k1=max(8, k2 // 8), k2=k2)
    return 1e6 / rate


def _measure_pair32(plan, q, batch, n):
    import jax.numpy as jnp
    import numpy as np
    from timing import chain_rate
    from hexl_tpu.ntt import ntt32

    def step(v):
        return ntt32.inv_ntt32(ntt32.fwd_ntt32(v, plan, 1, 1), plan, 1, 1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, size=(batch, n), dtype=np.uint64)
                    .astype(np.uint32))
    est_us = max(0.1, n / 5000.0)
    k2 = int(min(4096, max(96, 5e5 / (batch * est_us))))
    rate = chain_rate(step, x, batch, k1=max(8, k2 // 8), k2=k2)
    return 1e6 / rate


def run_cell(log_n: int, q_bits: int):
    from hexl_tpu import nt
    from hexl_tpu.ntt import NTT, jnp_ntt

    n = 1 << log_n
    q = int(nt.generate_primes(1, q_bits, True, ntt_size=n)[0])
    plan = NTT(n, q).plan
    rows = []
    if q_bits == 29:
        us = _measure_pair32(plan, q, BATCH, n)
        rows.append({"n": n, "q_bits": q_bits, "path": "ntt32",
                     "radix": None, "pack": None,
                     "us_per_pair": round(us, 4)})
        print(json.dumps(rows[-1]), flush=True)
        return rows
    packs = ("0", "1") if log_n < 14 else ("0",)
    # The bodies force radix (2,2) below n=2^13 (jnp_ntt._fwd_2d), so
    # sweeping radix there would measure the same program repeatedly.
    radixes = RADIXES if log_n >= 13 else ("2,2",)
    for radix in radixes:
        os.environ["HEXL_TPU_NTT_RADIX"] = radix
        for pack in packs:
            os.environ["HEXL_TPU_NTT_PACK"] = pack
            us = _measure_pair(jnp_ntt, plan, q, BATCH, n)
            rows.append({"n": n, "q_bits": q_bits, "path": "u64",
                         "radix": radix, "pack": pack,
                         "us_per_pair": round(us, 4)})
            print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "CELL":
        rows = run_cell(int(sys.argv[2]), int(sys.argv[3]))
        (HERE / f"_cell_{sys.argv[2]}_{sys.argv[3]}.json").write_text(
            json.dumps(rows))
        return

    # NOTE: the orchestrator must NOT import jax — initializing the
    # backend here would hold a device claim while the child processes
    # dispatch (only one TPU process at a time on this tunnel).
    all_rows = []
    for log_n in LOG_NS:
        for q_bits in (29, 49, 60):
            cell = HERE / f"_cell_{log_n}_{q_bits}.json"
            if cell.exists():  # resume: keep completed cells
                all_rows.extend(json.loads(cell.read_text()))
                continue
            r = subprocess.run(
                [sys.executable, str(HERE / "dispatch_sweep.py"), "CELL",
                 str(log_n), str(q_bits)],
                timeout=5400)
            if r.returncode != 0 or not cell.exists():
                print(f"cell ({log_n}, {q_bits}) FAILED", file=sys.stderr)
                continue
            all_rows.extend(json.loads(cell.read_text()))

    # Per-(n, q_bits) winner summary.
    best = {}
    for row in all_rows:
        key = (row["n"], row["q_bits"])
        if key not in best or row["us_per_pair"] < best[key]["us_per_pair"]:
            best[key] = row
    out = {"protocol": "chain-differential, D2H fetch barrier, batch=256, "
                       "one child process per (n, q_bits) cell",
           "rows": all_rows,
           "best": [best[k] for k in sorted(best)]}
    RESULTS.write_text(json.dumps(out, indent=1))
    print(f"wrote {RESULTS}")
    for b in out["best"]:
        print(f"best n=2^{b['n'].bit_length()-1} q={b['q_bits']}b: "
              f"radix={b['radix']} pack={b['pack']} "
              f"{b['us_per_pair']:.3f} us/pair")


if __name__ == "__main__":
    main()
