"""VPU op-throughput probe: where does the headline butterfly time go?

Measures scan-chained (dependent) throughput of raw u32/f32 lane ops, the
limb vocabulary (umul32_wide, shoup, butterfly), and compares the implied
butterflies/s with the measured headline so the optimization effort lands
on the real bottleneck (ALU op count vs stage layout traffic).

Every chain is data-dependent AND non-constant-foldable (x*x forms, not
x*c forms: a dependent multiply-by-constant chain folds to one multiply).
Work per dispatch is sized so the tunnel's degraded ~3-9 ms dispatch tax
is < 10% of the measurement (CLAUDE.md tunnel rules).

Usage: timeout 580 python benchmarks/vpu_probe.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hexl_tpu.limb import (U64, add64, cond_sub64, const64, mulhi64_approx,
                           mullo64, sub64, umul32_wide, to_limbs)

NELEM = 4 * 1024 * 1024  # 16 MB per u32 plane


def timed(fn, x, iters=2):
    out = fn(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def chain(step, k):
    def run(x):
        return jax.lax.scan(lambda c, _: (step(c), None), x, None, length=k)[0]
    return jax.jit(run)


def report(name, total_ops, secs, unit="ops"):
    rate = total_ops / secs
    print(f"{name:34s} {rate/1e9:10.2f} G{unit}/s   ({secs*1e3:.3f} ms)")
    return rate


def main():
    k = 16
    reps = 64  # dependent op-groups per scan step

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.integers(0, 2**32, size=NELEM, dtype=np.uint64)
                    .astype(np.uint32)).reshape(-1, 128)
    f = jnp.asarray(rng.random(NELEM, dtype=np.float32) + 0.5).reshape(-1, 128)

    print(f"probe: {NELEM} lanes, chain={k}, reps/step={reps}, backend="
          f"{jax.default_backend()}")

    # --- 1. raw lane-op ceilings (data-dependent, unfoldable) -------------
    def u32_mul_step(x):
        for _ in range(reps):
            x = x * x  # squaring chain: dependent, not foldable
        return x
    r = timed(chain(u32_mul_step, k), u)
    mul_rate = report("u32 mul x*x (dep)", NELEM * reps * k, r, "mul")

    def u32_add_step(x):
        for _ in range(reps):
            x = x + (x >> 3)  # 2 ops, dependent
        return x
    r = timed(chain(u32_add_step, k), u)
    report("u32 add+shift (2 ops, dep)", 2 * NELEM * reps * k, r, "op")

    def f32_fma_step(x):
        for _ in range(reps):
            x = x * x + jnp.float32(-0.5)  # stays bounded-ish, unfoldable
        return x
    r = timed(chain(f32_fma_step, k), f)
    report("f32 fma x*x+c (dep)", NELEM * reps * k, r, "fma")

    def u32_cmpsel_step(x):
        c = jnp.uint32(0x80000000)
        for _ in range(reps):
            x = jnp.where(x > c, x - c, x + jnp.uint32(1))
        return x
    r = timed(chain(u32_cmpsel_step, k), u)
    report("u32 cmp/sub/add/sel (4op, dep)", 4 * NELEM * reps * k, r, "op")

    # --- 2. limb vocabulary ------------------------------------------------
    reps2 = 16

    def wide_step(x):
        for _ in range(reps2):
            h, lo = umul32_wide(x, x)
            x = h ^ lo
        return x
    r = timed(chain(wide_step, k), u)
    report("umul32_wide(x,x) (dep)", NELEM * reps2 * k, r, "widemul")
    print(f"  -> implied lane-mul rate {4*NELEM*reps2*k/r/1e9:.2f} Gmul/s")

    q_int = (1 << 60) - (1 << 14) + 1
    w_int = 0x0123456789ABCDE5 % q_int
    wp_int = (w_int << 64) // q_int
    q64 = const64(q_int)
    two_q = const64(2 * q_int)
    w64 = const64(w_int)
    wp64 = const64(wp_int)

    xu = to_limbs(rng.integers(0, q_int, size=NELEM, dtype=np.uint64))
    xu = U64(xu.hi.reshape(-1, 128), xu.lo.reshape(-1, 128))

    def shoup_step(x):
        for _ in range(reps2):
            q_hat = mulhi64_approx(x, wp64)
            rr = sub64(mullo64(x, w64), mullo64(q_hat, q64))
            x = cond_sub64(rr, two_q)
        return x
    r = timed(chain(shoup_step, k), xu)
    shoup_rate = report("shoup_mul_approx (dep)", NELEM * reps2 * k, r,
                        "shoupmul")
    print(f"  -> implied lane-mul rate {24*NELEM*reps2*k/r/1e9:.2f} Gmul/s")

    def bfly_step(x):
        for _ in range(reps2):
            tx = cond_sub64(x, two_q)
            q_hat = mulhi64_approx(x, wp64)
            t = cond_sub64(
                sub64(mullo64(x, w64), mullo64(q_hat, q64)), two_q)
            nx = add64(tx, t)
            ny = sub64(add64(tx, two_q), t)
            x = U64(nx.hi ^ ny.hi, nx.lo ^ ny.lo)
        return x
    r = timed(chain(bfly_step, k), xu)
    bfly_rate = report("fwd butterfly (dep)", NELEM * reps2 * k, r, "bfly")

    # --- 3. headline context ----------------------------------------------
    n = 1 << 14
    pairs = 91986.0  # round-2 headline, pairs/s
    bflys = pairs * (n // 2) * int(np.log2(n)) * 2
    print(f"\nheadline implies {bflys/1e9:.2f} Gbfly/s; pure-bfly chain "
          f"reaches {bfly_rate/1e9:.2f} Gbfly/s "
          f"-> stage/layout overhead factor {bfly_rate/bflys:.2f}x")
    print(f"shoup-only ceiling would be {shoup_rate/1e9:.2f} Gbfly/s; "
          f"raw-mul ceiling at 24 mul/bfly = {mul_rate/24/1e9:.2f} Gbfly/s")


if __name__ == "__main__":
    main()
