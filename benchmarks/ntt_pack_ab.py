"""A/B of the lane-packed NTT phase-B walk (HEXL_TPU_NTT_PACK).

For N < 2^14 the transposed phase-B layout has minor dim
lane_l = N/128 < 128, so every vector op and HBM tile carries
(128 - lane_l)/128 padding — 16x at N=2^10. Packing kb = 128/lane_l
polynomials side by side into the lane axis (jnp_ntt._pack_b, the
fft_like packing scheme on the integer limb planes) restores full
tiles at the same materialization count and is bit-identical (tested:
tests/test_ntt.py::test_packed_phase_b_bit_exact).

Chain-differential protocol (benchmarks/timing.py). Writes
benchmarks/ntt_pack_results.json; wired into refresh.sh as a standing
per-toolchain A/B.

Reference being raced: the small-N single-call lane of
hexl/ntt/fwd-ntt-avx512.cpp.
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

BATCH = int(os.environ.get("AB_BATCH", "256"))


def main():
    from unittest import mock

    from hexl_tpu import nt
    from hexl_tpu.limb import to_limbs
    from hexl_tpu.ntt import get_plan, jnp_ntt

    rng = np.random.default_rng(0)
    rows = []
    for log_n, q_bits in ((10, 60), (12, 49), (12, 60), (13, 60)):
        n = 1 << log_n
        q = int(nt.generate_primes(1, q_bits, True, ntt_size=n)[0])
        plan = get_plan(n, q)
        x = to_limbs(rng.integers(0, q, size=(BATCH, n), dtype=np.uint64))

        def pair(v, p=plan):
            return jnp_ntt.inv_ntt(jnp_ntt.fwd_ntt(v, p, 1, 1), p, 1, 1)

        out = {}
        for pack in ("0", "1"):
            with mock.patch.dict(os.environ, {"HEXL_TPU_NTT_PACK": pack}):
                r = chain_rate(pair, x, BATCH, k1=32, k2=512)
            out[pack] = r
            print(f"N=2^{log_n} q={q_bits}b pack={pack}: "
                  f"{1e6/r:8.4f} us/pair  ({r:12.0f} pairs/s)",
                  flush=True)
        rows.append({"log_n": log_n, "q_bits": q_bits, "batch": BATCH,
                     "us_unpacked": round(1e6 / out["0"], 4),
                     "us_packed": round(1e6 / out["1"], 4),
                     "packed_speedup": round(out["1"] / out["0"], 3)})

    res = {"protocol": "chain-differential, D2H fetch barrier",
           "rows": rows}
    (pathlib.Path(__file__).parent / "ntt_pack_results.json"
     ).write_text(json.dumps(res, indent=1))
    print("wrote benchmarks/ntt_pack_results.json")


if __name__ == "__main__":
    main()
