"""Decompose the small-N 49-bit vs 60-bit inversion (round-4 Weak #3).

Committed round-4 rows showed the 49-bit family (which runs the LIGHTER
lean16 butterflies) systematically slower than the 60-bit family at
N <= 2^12 — backwards. Candidates named by the verdict: the separate
_fwd_fixup pass at layout-bound sizes, or a pack/scheme interaction.

This profile isolates the scheme variable from everything else by
calling the 2D bodies directly with forced (lean_ok, lean16_ok) gates:
at a 49-bit prime every scheme is VALID (lean8 merely wastes a halver),
so (auto=lean16) vs (forced lean8) vs (exact) on the SAME plan measures
exactly the scheme/fixup cost; comparing against the 60-bit prime at
the same forced scheme isolates any residual prime-dependent cost
(there should be none — the bodies are bit-width agnostic).

Protocol: chain-length differential, D2H fetch barrier (timing.py).

Usage: timeout 580 python benchmarks/smalln_49_profile.py
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

BATCH = 256


def main():
    import jax

    from hexl_tpu import nt
    from hexl_tpu.limb import const64, to_limbs
    from hexl_tpu.ntt import NTT
    from hexl_tpu.ntt import jnp_ntt as J

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    rows = []

    for log_n in (10, 12, 13, 14):
        n = 1 << log_n
        for q_bits in (49, 60):
            q_int = int(nt.generate_primes(1, q_bits, True, ntt_size=n)[0])
            plan = NTT(n, q_int).plan
            q, two_q = const64(q_int), const64(2 * q_int)
            x = to_limbs(rng.integers(0, q_int, size=(BATCH, n),
                                      dtype=np.uint64))
            radix = J.ntt_radix_for(n)

            def fwd_forced(v, lean_ok, lean16_ok):
                return J.fwd_body_2d(v, q, two_q, plan.fwd_a, plan.fwd_b,
                                     plan.rows, plan.tiles, plan.lane_l,
                                     radix, lean_ok=lean_ok,
                                     lean16_ok=lean16_ok)

            def inv_forced(v, lean_ok, lean16_ok):
                return J.inv_body_2d(v, q, two_q, plan.inv_b, plan.inv_a,
                                     J._plan_fin(plan), plan.rows,
                                     plan.tiles, plan.lane_l, radix,
                                     lean_ok=lean_ok, lean16_ok=lean16_ok)

            def pair(flags):
                lo, l16 = flags

                def step(v):
                    f = fwd_forced(v, lo, l16)
                    f = J.reduce_mod_lazy64(f, q_int, 4)  # OMF=1 contract
                    iv = inv_forced(f, lo, l16)
                    return J.cond_sub64_half(iv, q)
                return step

            schemes = (("lean16", (True, True)),
                       ("lean8", (True, False)),
                       ("exact", (False, False)))
            if log_n >= 13:
                # crossover question is lean16-vs-lean8 only, and only
                # the 49-bit family can legally choose (60b: no lean16)
                if q_bits != 49:
                    continue
                schemes = schemes[:2]
            for name, flags in schemes:
                r = chain_rate(pair(flags), x, BATCH, k1=32, k2=1024)
                us = 1e6 / r
                rows.append({"n": n, "q_bits": q_bits, "scheme": name,
                             "us_per_pair": round(us, 4)})
                print(f"n=2^{log_n} q={q_bits}b scheme={name:7s} "
                      f"{us:7.3f} us/pair", flush=True)

    out = pathlib.Path(__file__).parent / "smalln_49_profile_results.json"
    out.write_text(json.dumps(
        {"backend": "tpu", "batch": BATCH,
         "protocol": "chain-differential, forced-scheme 2D bodies, "
                     "OMF=1 contracts included",
         "rows": rows}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
