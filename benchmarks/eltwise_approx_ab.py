"""A/B the approximate-mulhi quotient in the eltwise Barrett/Shoup bodies.

The TPU dispatch (jnp_kernels._approx, same rule as the NTT butterflies)
traces mult_mod / fma_mod / full-Barrett reduce_mod with mulhi64_approx
quotients (4 fewer lane multiplies each). Run once per setting:

    python benchmarks/eltwise_approx_ab.py
    HEXL_TPU_DISABLE_APPROX=1 python benchmarks/eltwise_approx_ab.py

Prints one JSON line per op with chained us/call; outputs are asserted
bit-identical to the big-int oracle either way (fully-reduced contracts).
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

CHAIN = int(os.environ.get("AB_CHAIN", "64"))
SHAPE = (1024, 8192)


def main():
    import jax

    from hexl_tpu import nt
    from hexl_tpu.eltwise import jnp_kernels as K
    from hexl_tpu.limb import const64, from_limbs, to_limbs

    approx = "off" if os.environ.get("HEXL_TPU_DISABLE_APPROX") else "on"
    q = nt.generate_primes(1, 60, True, ntt_size=1 << 14)[0]
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=SHAPE, dtype=np.uint64)
    b = rng.integers(0, q, size=SHAPE, dtype=np.uint64)
    w = int(rng.integers(1, q))
    lw, lwp = const64(w), const64(nt.barrett_factor(w, 64, q))

    ops = {
        # Chained bodies: output feeds input so dispatches serialize
        # (unchained timings on this tunnel are unusable — BASELINE.md).
        "mult_mod": lambda x, y: (K.mult_mod(x, y, q, 1), y),
        "fma_mod": lambda x, y: (K.fma_mod_preconned(x, lw, lwp, y, q, 1),
                                 y),
    }
    la, lb = to_limbs(a), to_limbs(b)
    for name, step in ops.items():
        fn = jax.jit(lambda x, y, s=step: jax.lax.scan(
            lambda c, _: (s(*c), None), (x, y), None, length=CHAIN)[0][0])
        out = jax.block_until_ready(fn(la, lb))
        # Correctness probe on the first chain element semantics: one call.
        one = from_limbs(
            jax.jit(lambda x, y, s=step: s(x, y)[0])(la, lb))
        if name == "mult_mod":
            want = (a.astype(object) * b.astype(object) % q)
        else:
            want = ((a.astype(object) * w + b.astype(object)) % q)
        assert (one.astype(object) == want).all(), f"{name} mismatch"
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(la, lb)
        jax.block_until_ready(out)
        us = (time.perf_counter() - t0) / (iters * CHAIN) * 1e6
        print(json.dumps({
            "op": name, "approx": approx, "backend": jax.default_backend(),
            "shape": list(SHAPE), "q_bits": 60,
            "us_per_call": round(us, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
