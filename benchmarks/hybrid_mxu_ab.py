"""Hybrid VPU+MXU split-batch NTT experiment.

The staged (VPU) NTT is issue-throughput-bound (vpu_probe: the lean16
butterfly chain runs at the 5.3 T lane-ops/s ceiling; the headline is
81% of the pure chain), and the MXU four-step NTT — refuted as a
REPLACEMENT (slower standalone: benchmarks/mxu_int8_ab.py, ROADMAP) —
consumes mostly MXU issue slots, which are otherwise idle during the
staged transform. A TPU core co-issues MXU and VPU work, so routing a
FRACTION of the batch through the MXU path inside the same jit could
add throughput the VPU alone cannot reach:

    ideal pair time = staged_time * (1 - k/B)   while  mxu covers k/B
    balanced at k/B = staged_rate/(staged_rate + mxu_rate)

This measures the fwd+inv pair throughput of a split batch
(B-k staged, k MXU) as a function of k, at the headline shape
(N=2^14, 60-bit) and the 49-bit IFMA-lane shape where the reference
ratio is weakest. If XLA serializes the two subgraphs the curve is
flat-to-worse and the idea is refuted; if it overlaps them the optimum
k gives the new headline configuration.

Usage: timeout 2400 python benchmarks/hybrid_mxu_ab.py
Writes benchmarks/hybrid_mxu_results.json.
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

N = 1 << 14
BATCH = 128
KS = (0, 16, 32, 48, 64)


def main():
    import jax.numpy as jnp

    from hexl_tpu import nt
    from hexl_tpu.limb import U64, to_limbs
    from hexl_tpu.ntt import get_plan, jnp_ntt
    from hexl_tpu.ntt.mxu_ntt import fwd_ntt_mxu, get_mxu_plan, inv_ntt_mxu

    rng = np.random.default_rng(0)
    results = []
    for q_bits in (60, 49):
        q = int(nt.generate_primes(1, q_bits, True, ntt_size=N)[0])
        plan = get_plan(N, q)
        mplan = get_mxu_plan(N, q)
        x = to_limbs(rng.integers(0, q, size=(BATCH, N), dtype=np.uint64))

        for k in KS:
            def step(v, k=k):
                if k == 0:
                    return jnp_ntt.inv_ntt(
                        jnp_ntt.fwd_ntt(v, plan, 1, 1), plan, 1, 1)
                vpu = U64(v.hi[:BATCH - k], v.lo[:BATCH - k])
                mxu = U64(v.hi[BATCH - k:], v.lo[BATCH - k:])
                a = jnp_ntt.inv_ntt(
                    jnp_ntt.fwd_ntt(vpu, plan, 1, 1), plan, 1, 1)
                b = inv_ntt_mxu(
                    fwd_ntt_mxu(mxu, mplan, 1, 1), mplan, 1, 1)
                return U64(jnp.concatenate([a.hi, b.hi]),
                           jnp.concatenate([a.lo, b.lo]))

            rate = chain_rate(step, x, BATCH, k1=16, k2=128)
            print(f"q={q_bits}b k={k:3d}/{BATCH}: "
                  f"{rate:12.0f} pairs/s  "
                  f"({1e6*BATCH/rate:7.3f} us amortized/pair)", flush=True)
            results.append({"q_bits": q_bits, "k_mxu": k, "batch": BATCH,
                            "pairs_per_s": round(rate, 1),
                            "us_per_pair": round(1e6 * BATCH / rate, 4)})

    out = {"protocol": "chain-differential, D2H fetch barrier", "n": N,
           "rows": results}
    (pathlib.Path(__file__).parent / "hybrid_mxu_results.json"
     ).write_text(json.dumps(out, indent=1))
    print("wrote benchmarks/hybrid_mxu_results.json")


if __name__ == "__main__":
    main()
