"""A/B the widened-invariant butterfly variants on the device VPU.

The remaining design freedom in the Harvey butterfly at the headline
family q in (2^60, 2^61) is the (quotient-error bound) x (halver count)
trade:

  e<=6 quotient (mulhi64_approx6, 10 lane muls): raw Shoup in [0,8q)
       -> fwd needs 2 conditional subtracts on the [0,8q) invariant
          (the committed 'lean8' scheme), inv 2 on [0,4q) ('lean4').
  e<=2 quotient (mulhi64_approx2, 12 lane muls): raw Shoup in [0,4q)
       -> fwd needs only 1 halver on [0,8q), inv only 1 on [0,4q).
  e<=1 quotient (mulhi64_approx,  12 lane muls + carry chain): same
       halver counts as e<=2 with strictly more assembly ops — included
       as a control.

Protocol: chain-length differential (benchmarks/timing.py), throughput
regime (4M lanes), identical to vpu_probe.py. Each step chains the
butterfly with swapped outputs so the invariant is self-sustaining.

VERDICT (measured 2026-08-21, committed JSON): forward e<=6 wins
isolated (30.15 vs 27.12 Gbfly/s); inverse e<=2 wins ISOLATED by 1.20x
(39.76 vs 33.13) but REGRESSES the full staged transform 16% (9.09-9.35
vs 7.80 us/pair at 2^14/60b across radixes (16,16)/(32,16)/(16,32)/
(32,32)) — the single-twiddle register-resident chain hides the
table-load/layout interleaving where the halvers were hidden in idle
issue slots and extra multiplies are not. Both directions therefore
stay on the e<=6 quotient. Isolated-chain wins MUST be confirmed at
body level before wiring.

Usage: timeout 580 python benchmarks/butterfly_variants_ab.py
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

NELEM = 4 * 1024 * 1024


def main():
    import jax

    from hexl_tpu.limb import (U64, add64, cond_sub64_half, const64,
                               mulhi64_approx, mulhi64_approx2,
                               mulhi64_approx6, mullo64, sub64, to_limbs)
    from hexl_tpu import nt

    print(f"backend={jax.default_backend()}  protocol=chain-differential")
    rng = np.random.default_rng(0)

    # The actual headline prime family: q in (2^60, 2^61).
    q_int = int(nt.generate_primes(1, 60, True, ntt_size=1 << 14)[0])
    w_int = 0x0123456789ABCDE5 % q_int
    wp_int = (w_int << 64) // q_int
    q, two_q = const64(q_int), const64(2 * q_int)
    w, wp = const64(w_int), const64(wp_int)
    xu = to_limbs(rng.integers(0, q_int, size=NELEM, dtype=np.uint64))
    xu = U64(xu.hi.reshape(-1, 128), xu.lo.reshape(-1, 128))

    def raw_shoup(mulhi, ys):
        q_hat = mulhi(ys, wp)
        return sub64(mullo64(ys, w), mullo64(q_hat, q))

    four_q = add64(two_q, two_q)

    # --- forward variants, invariant [0,8q) --------------------------------
    def f_lean8_e6(xs, ys):   # committed scheme: 2 halvers
        tx = cond_sub64_half(xs, four_q)
        t = cond_sub64_half(raw_shoup(mulhi64_approx6, ys), four_q)
        return add64(tx, t), sub64(add64(tx, four_q), t)

    def f_lean8_e2(xs, ys):   # 1 halver, e<=2 quotient
        tx = cond_sub64_half(xs, four_q)
        t = raw_shoup(mulhi64_approx2, ys)          # [0,4q)
        return add64(tx, t), sub64(add64(tx, four_q), t)

    def f_lean8_e1(xs, ys):   # 1 halver, e<=1 quotient (control)
        tx = cond_sub64_half(xs, four_q)
        t = raw_shoup(mulhi64_approx, ys)           # [0,3q)
        return add64(tx, t), sub64(add64(tx, four_q), t)

    def f_lean_e6(xs, ys):    # round-3 'lean': 3 halvers (baseline)
        tx = cond_sub64_half(xs, two_q)
        t = cond_sub64_half(cond_sub64_half(
            raw_shoup(mulhi64_approx6, ys), four_q), two_q)
        return add64(tx, t), sub64(add64(tx, two_q), t)

    # --- inverse variants, invariant [0,4q) --------------------------------
    def i_lean4_e6(xs, ys):   # committed scheme: 2 halvers
        tx = cond_sub64_half(add64(xs, ys), four_q)
        ty = sub64(add64(xs, four_q), ys)
        return tx, cond_sub64_half(raw_shoup(mulhi64_approx6, ty), four_q)

    def i_lean4_e2(xs, ys):   # 1 halver, e<=2 quotient
        tx = cond_sub64_half(add64(xs, ys), four_q)
        ty = sub64(add64(xs, four_q), ys)
        return tx, raw_shoup(mulhi64_approx2, ty)   # [0,4q)

    def i_lean4_e1(xs, ys):   # control
        tx = cond_sub64_half(add64(xs, ys), four_q)
        ty = sub64(add64(xs, four_q), ys)
        return tx, raw_shoup(mulhi64_approx, ty)    # [0,3q)

    rows = []

    def race(name, bfly):
        def step(xy):
            x, y = xy
            for _ in range(2):
                nx, ny = bfly(x, y)
                x, y = ny, nx
            return (x, y)
        r = chain_rate(step, (xu, xu), NELEM * 2)
        print(f"{name:16s} {r/1e9:8.2f} Gbfly/s", flush=True)
        rows.append({"name": name, "gbfly_per_s": round(r / 1e9, 3)})
        return r

    base_f = race("f_lean8_e6", f_lean8_e6)
    for nm, fn in (("f_lean8_e2", f_lean8_e2), ("f_lean8_e1", f_lean8_e1),
                   ("f_lean_e6", f_lean_e6)):
        r = race(nm, fn)
        print(f"   -> {r/base_f:6.3f}x of committed fwd")
    base_i = race("i_lean4_e6", i_lean4_e6)
    for nm, fn in (("i_lean4_e2", i_lean4_e2), ("i_lean4_e1", i_lean4_e1)):
        r = race(nm, fn)
        print(f"   -> {r/base_i:6.3f}x of committed inv")

    out = pathlib.Path(__file__).parent / "butterfly_variants_results.json"
    out.write_text(json.dumps(
        {"backend": jax.default_backend(), "q_bits": 60,
         "protocol": "chain-differential, throughput regime, 4M lanes",
         "rows": rows}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
