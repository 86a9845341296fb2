"""Sweep the headline-bench config (batch x chain) on the attached chip.

bench.py pins batch=256, chain=32 (the round-1 tuning). This sweep
re-measures N=2^14 60-bit fwd+inv pairs/s over a batch/chain grid so the
headline config can be re-tuned per toolchain update without editing
bench.py blind. Prints one JSON line per config.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hexl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax

    from hexl_tpu import config, nt
    from hexl_tpu.limb import to_limbs
    from hexl_tpu.ntt import NTT

    n = 1 << 14
    q = nt.generate_primes(1, 60, True, ntt_size=n)[0]
    plan = NTT(n, q).plan
    if config.use_pallas():
        from hexl_tpu.ntt import pallas_ntt as impl
    else:
        from hexl_tpu.ntt import jnp_ntt as impl

    def pair(v):
        return impl.inv_ntt(impl.fwd_ntt(v, plan, 1, 1), plan, 1, 1)

    rng = np.random.default_rng(0)
    best = None
    for batch in (128, 256, 512, 1024):
        for chain in (16, 32):
            chained = jax.jit(lambda v, c=chain: jax.lax.scan(
                lambda s, _: (pair(s), None), v, None, length=c)[0])
            x = to_limbs(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
            out = chained(x)
            jax.block_until_ready(out)
            iters = 4
            t0 = time.perf_counter()
            for _ in range(iters):
                out = chained(x)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            pps = batch * chain * iters / dt
            row = {"batch": batch, "chain": chain,
                   "pairs_per_sec": round(pps, 1),
                   "us_per_pair": round(1e6 / pps, 3)}
            print(json.dumps(row), flush=True)
            if best is None or pps > best["pairs_per_sec"]:
                best = row
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
