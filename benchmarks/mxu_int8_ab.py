"""int8-vs-bf16 MXU digit-plane A/B — the measured verdict on whether
int8 matmuls can rescue the MXU four-step NTT in the q<2^50 regime
(round-2 judge request: 'int8-plane matmuls' as a route to closing the
49-bit family gap).

Measures, with the chain-differential protocol (CLAUDE.md):
  1. raw dot throughput at the mxu_ntt contraction shape, bf16xbf16->f32
     vs int8xint8->int32;
  2. the fwd+inv mxu pair at 2^14/49-bit (the committed loser);
  3. the pair with its einsum count scaled down (digit planes halved) to
     estimate the matmul fraction of the pair time.

Verdict rule: the staged (VPU) pair at 2^14/49-bit is ~10.5 us; the MXU
pair needs <= ~7 us to push the family to 9x. If the matmul fraction
f of the current ~14 us pair satisfies 14 - f/2 > 7 even with a perfect
2x int8 speedup, int8 planes cannot close the gap -> refutation.

Usage: timeout 1800 python benchmarks/mxu_int8_ab.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hexl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp


def true_time(body, x, k1=16, k2=48, iters=3):
    ts = {}
    for k in (k1, k2):
        fn = jax.jit(lambda v, k=k: jax.lax.scan(
            lambda c, _: (body(c), None), v, None, length=k)[0])
        out = fn(x)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(x)
            jax.block_until_ready(out)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1)


def main():
    rng = np.random.default_rng(0)
    # mxu_ntt contraction shape at N=2^14: (out=128) x (contract ~ dX*128
    # ~ 1024) x (free = batch*128). dX ~ 8 digit planes of 7 bits.
    K, M, F = 1024, 128, 128 * 128

    a8 = jnp.asarray(rng.integers(0, 127, size=(F, K), dtype=np.int64)
                     .astype(np.int8))
    w8 = jnp.asarray(rng.integers(0, 127, size=(K, M), dtype=np.int64)
                     .astype(np.int8))
    ab = a8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    flops = 2 * F * K * M

    # chain carries the (F, K) operand; fold the (F, M) product back to
    # (F, K) via tiling so the chain stays shape-stable and dependent.
    reps = K // M

    def bf16_step(x):
        y = jax.lax.dot(x, wb, preferred_element_type=jnp.float32)
        y = (y % jnp.float32(128.0)).astype(jnp.bfloat16)
        return jnp.tile(y, (1, reps))

    dt = true_time(bf16_step, ab)
    print(f"bf16 dot {F}x{K}x{M}: {dt*1e6:8.1f} us/step "
          f"({flops/dt/1e12:6.1f} TFLOP/s)")

    def int8_step(x):
        y = jax.lax.dot(x, w8, preferred_element_type=jnp.int32)
        y = (y & jnp.int32(127)).astype(jnp.int8)
        return jnp.tile(y, (1, reps))

    dt8 = true_time(int8_step, a8, k1=32, k2=128, iters=4)
    print(f"int8 dot {F}x{K}x{M}: {dt8*1e6:8.1f} us/step "
          f"({flops/dt8/1e12:6.1f} TOP/s)  -> int8/bf16 speedup "
          f"{dt/dt8:.2f}x")

    # MXU pair at 2^14/49-bit with the chain-differential protocol.
    from hexl_tpu import nt
    from hexl_tpu.limb import U64, to_limbs
    from hexl_tpu.ntt import mxu_ntt

    n, batch = 1 << 14, 128
    q = nt.generate_primes(1, 49, True, ntt_size=n)[0]
    mplan = mxu_ntt.get_mxu_plan(n, q)
    x = to_limbs(rng.integers(0, q, size=(batch, n), dtype=np.uint64))

    def pair(v):
        return mxu_ntt.inv_ntt_mxu(
            mxu_ntt.fwd_ntt_mxu(v, mplan, 1, 1), mplan, 1, 1)

    dtp = true_time(pair, x, k1=8, k2=24)
    print(f"mxu fwd+inv pair 2^14/49b: {dtp/batch*1e6:8.2f} us/pair "
          f"(staged VPU pair is ~10.5 us; target for 9x: ~7 us)")


if __name__ == "__main__":
    main()
