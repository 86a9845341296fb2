"""A/B of the reference's float-path modular multiply on the TPU VPU.

VERDICT round 3, Next #1 — the last untried algorithm family. The
reference PREFERS a double-precision float path for every q < 2^50
(`hexl/eltwise/eltwise-mult-mod.cpp:38-52`; algorithm at
`eltwise-mult-mod-avx512dq.cpp:576-615`):

    h = x*y;  l = fma(x, y, -h)      # EXACT 2-term product (hw FMA)
    c = floor(h * u)                 # u ~ 1/p precomputed
    d = fnmadd(c, p, h) + l          # exact cancellation (hw FMA)
    d += p if d < 0

Its economics rest on hardware f64 FMA: a 104-bit-exact product in 2
issues. The TPU VPU analogue must carry >=45-bit integers on 24-bit f32
mantissas, and (measured, benchmarks/vpu_probe_results.json):

  * XLA on this TPU does NOT contract mul+add to FMA (residual test:
    0.000 nonzero; x*x+c runs at 0.49x the mul rate = two issues);
  * an exact product therefore costs a Dekker two_prod — measured 13.7
    mul-equivalent issues for 24x24 exact bits, vs umul32_wide's 17.3
    for 32x32: 42 vs 59 product-bits^2 per issue — the INTEGER
    multiplier is 1.4x more efficient per exact product bit;
  * u32 and f32 multiplies issue at the same 5.3 T/s, so there is no
    rate advantage in moving to the float datapath.

This file measures three dependent chains at the same element count:

  1. int_shoup   — the incumbent lean (e<=6 approx) integer Shoup
                   multiply (the headline butterfly's multiply).
  2. df_skeleton — the IRREDUCIBLE core any correct f32 float-path
                   modmul must execute for q ~ 2^45..2^49: balanced
                   2-digit representation, 4 exact digit products
                   (Dekker two_prods), 2 integer-exact quotient
                   estimates, quotient*modulus products, head
                   cancellations, range clamp and re-split. It SKIPS
                   the exact plane summation, lazy-range fix-ups and
                   butterfly adds a real kernel needs — i.e. it is a
                   strict UPPER BOUND on any float-path rate.
  3. df_exact    — a complete, validated modmul for q < 2^45 (balanced
                   double-float planes, exact plane summation via
                   two_sums), checked elementwise against Python-int
                   ground truth before timing.

Usage: timeout 1200 python benchmarks/float_path_ab.py
Writes benchmarks/float_path_results.json.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hexl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from timing import chain_rate, make_chain, fetch  # noqa: E402

NELEM = 4 * 1024 * 1024

F = np.float32
S23 = F(2.0 ** 23)
RS23 = F(2.0 ** -23)
MAGIC23 = F(3 * 2.0 ** 45)   # + / - rounds to a multiple of 2^23
MAGIC0 = F(3 * 2.0 ** 22)    # + / - rounds to an integer
SPLIT12 = F(4097.0)          # Dekker splitter for |a| <= 2^24


def _host_balanced(v, scale_bits):
    """Host: balanced split of int v at 2^scale_bits -> (hi, lo) f32,
    hi a multiple of 2^scale_bits, |lo| <= 2^(scale_bits-1)."""
    s = 1 << scale_bits
    hi = (v + s // 2) // s * s
    return F(hi), F(v - hi)


class Tables:
    """Per-(q, w) constants for the float path (host precompute)."""

    def __init__(self, q, w):
        assert q < (1 << 45)
        self.q, self.w = q, w
        w1 = (w << 23) % q
        self.w1h, self.w1l = _host_balanced(w1, 23)
        self.w0h, self.w0l = _host_balanced(w, 23)
        self.qh, self.ql = _host_balanced(q, 23)
        self.q2h, self.q2l = _host_balanced(2 * q, 23)
        # DF of Wi/q (quotient direction), and 1/q single.
        for name, wv in (("v1", w1), ("v0", w)):
            val = wv / q
            vh = F(val)
            vl = F(val - float(vh))
            setattr(self, name + "h", vh)
            setattr(self, name + "l", vl)
        self.invq = F(1.0 / q)
        # Dekker pre-splits of the table constants (exact, host side —
        # MUST be evaluated in f32 arithmetic: in f64 the c-(c-a) trick
        # returns a unchanged and the split collapses).
        for nm in ("w1h", "w1l", "w0h", "w0l", "qh", "ql"):
            a = F(getattr(self, nm))
            c = F(SPLIT12 * a)
            hi = F(c - F(c - a))
            setattr(self, nm + "_a", hi)
            setattr(self, nm + "_b", F(a - hi))


def _dsplit(a):
    """Dekker split of a single f32 (|a| <= 2^24ish) into 12+12 bits."""
    c = SPLIT12 * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod_pre(a, a_hi, a_lo, b, b_a, b_b):
    """Exact a*b with a's split in hand and b's split precomputed."""
    p = a * b
    e = ((a_hi * b_a - p) + a_hi * b_b + a_lo * b_a) + a_lo * b_b
    return p, e


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _round_int(t):
    # A real HLO round op: the classic (t + 1.5*2^23) - 1.5*2^23 trick
    # is ALGEBRAICALLY SIMPLIFIED AWAY by XLA (measured on CPU: the pair
    # of adds cancels and no rounding happens), so it cannot be used
    # under jit. jnp.round lowers to round-nearest - one issue.
    import jax.numpy as jnp
    return jnp.round(t)


def _term_planes(a, t, W_pre, V):
    """Exact planes of a*W - c*q for |a| <= 2^22 integer.

    W_pre = (wh, wh_a, wh_b, wl, wl_a, wl_b); V = (vh, vl).
    Returns (c, plane list); sum(planes) == a*W - c*q exactly, with
    |sum| <= ~1.5q.
    """
    wh, wh_a, wh_b, wl, wl_a, wl_b = W_pre
    vh, vl = V
    a_hi, a_lo = _dsplit(a)
    c = _round_int(a * vl + a * vh)
    c_hi, c_lo = _dsplit(c)
    p1, e1 = _two_prod_pre(a, a_hi, a_lo, wh, wh_a, wh_b)
    p2, e2 = _two_prod_pre(a, a_hi, a_lo, wl, wl_a, wl_b)
    p3, e3 = _two_prod_pre(c, c_hi, c_lo, t.qh, t.qh_a, t.qh_b)
    p4, e4 = _two_prod_pre(c, c_hi, c_lo, t.ql, t.ql_a, t.ql_b)
    # p1, p3 and e1, e3 are multiples of 2^23 (their products are); the
    # differences are bounded by ~2^47 so they fit the 24-bit mantissa
    # at granularity 2^23 -> exact plain subtracts. p2-p4 has unit
    # granularity at magnitude up to 2^45 -> needs a two_sum.
    d_hi = p1 - p3
    d_e = e1 - e3
    s24, t24 = _two_sum(p2, -p4)
    e_lo = e2 - e4
    return c, [d_hi, s24, d_e, t24, e_lo]


def df_modmul_exact(xh, xl, t: Tables):
    """(xh + xl) * w mod q for x = xh + xl near [0, q), q < 2^45.

    Residue-exact: the returned planes satisfy
        (xh' + xl') === (xh + xl) * w  (mod q),   exactly,
    with value in (-2^23, q + 2^23) and |xl'| <= 2^23 — the float
    analogue of the integer path's lazy ranges (range-fold decisions
    use the head plane only; a misjudged boundary changes the value by
    a multiple of q, never the residue). Every addition that could
    round passes through a two_sum; fold/renormalize arithmetic stays
    on plane pairs whose granularity proofs are in the comments.
    """
    import jax.numpy as jnp

    m = xh * RS23
    w1_pre = (t.w1h, t.w1h_a, t.w1h_b, t.w1l, t.w1l_a, t.w1l_b)
    w0_pre = (t.w0h, t.w0h_a, t.w0h_b, t.w0l, t.w0l_a, t.w0l_b)
    _, pa = _term_planes(m, t, w1_pre, (t.v1h, t.v1l))
    _, pb = _term_planes(xl, t, w0_pre, (t.v0h, t.v0l))
    # Exact sum of the 10 planes (|total| <= ~3q < 2^47): two_sum
    # cascade with a second-order residual accumulator (first-order
    # residuals are ints <= 2^23 whose running sum can pass 2^24, so
    # their own rounding crumbs go to err2; crumbs are <= 2 each and
    # sum exactly).
    planes = [pa[0], pb[0], pa[1], pb[1], pa[2], pb[2]]
    small = (pa[3] + pb[3]) + (pa[4] + pb[4])  # ints, |.| <= 1.5*2^23
    h = planes[0]
    err = small
    err2 = jnp.zeros_like(h)
    for p in planes[1:]:
        h, e = _two_sum(h, p)
        err, e2 = _two_sum(err, e)
        err2 = err2 + e2
    # One more Barrett step on the head: c3 in [-4, 4] (exact int).
    c3 = _round_int(h * t.invq)
    h, e = _two_sum(h, -(c3 * t.qh))   # c3*qh exact: c3*(qh/2^23)<=2^24
    err, e2 = _two_sum(err, e)
    err2 = err2 + e2
    h, e = _two_sum(h, -(c3 * t.ql))   # c3*ql exact: <= 2^24
    err, e2 = _two_sum(err, e)
    err2 = err2 + e2
    r, e = _two_sum(h, err)
    err2 = err2 + e                     # |err2| <= ~2^23
    # r + err2 == x*w - C*q in (-2q, 2q) exactly. Re-split r, fold err2
    # into the low plane (|r - nh| <= 2^22, so the sum is an exact int).
    # (jnp.round, not the magic-constant trick - see _round_int.)
    nh = jnp.round(r * RS23) * S23
    nl = (r - nh) + err2
    # Plane-wise range folds, decisions on the head only (residue-safe;
    # all plane adds exact: high planes are multiples of 2^23 with
    # magnitude < 2^47, low planes are ints < 2^24).
    nh2 = jnp.where(nh < 0, nh + t.q2h, nh)
    nl = jnp.where(nh < 0, nl + t.q2l, nl)
    nh = nh2
    for _ in range(2):
        ge = nh >= t.qh
        nh2 = jnp.where(ge, nh - t.qh, nh)
        nl = jnp.where(ge, nl - t.ql, nl)
        nh = nh2
    # Rebalance so |nl| <= 2^22 again (exact: carry is a multiple of
    # 2^23 bounded by 2^24).
    carry = jnp.round(nl * RS23) * S23
    return nh + carry, nl - carry


def df_modmul_skeleton(xh, xl, t: Tables):
    """The irreducible core only (see module docstring): products,
    quotients, head cancellation, clamp, re-split. NOT exact — used
    solely as an upper bound on any float-path rate."""
    import jax.numpy as jnp
    m = xh * RS23
    w1_pre = (t.w1h, t.w1h_a, t.w1h_b, t.w1l, t.w1l_a, t.w1l_b)
    w0_pre = (t.w0h, t.w0h_a, t.w0h_b, t.w0l, t.w0l_a, t.w0l_b)
    _, pa = _term_planes(m, t, w1_pre, (t.v1h, t.v1l))
    _, pb = _term_planes(xl, t, w0_pre, (t.v0h, t.v0l))
    r = (((pa[0] + pb[0]) + (pa[1] + pb[1]))
         + ((pa[2] + pb[2]) + (pa[3] + pb[3]))) + (pa[4] + pb[4])
    qf = t.qh + t.ql
    r = jnp.clip(r, F(0.0), qf - F(1.0))
    nh = jnp.round(r * RS23) * S23
    return nh, r - nh


def validate_exact(t: Tables, n=1 << 20, seed=0, iters=1):
    """df_modmul_exact (applied `iters` times, i.e. the chained lazy
    ranges feed back in) vs Python-int ground truth, elementwise."""
    import jax

    rng = np.random.default_rng(seed)
    xs = rng.integers(0, t.q, size=n, dtype=np.uint64)
    hi = np.empty(n, np.float32)
    lo = np.empty(n, np.float32)
    sc = 1 << 23
    vh = (xs.astype(np.int64) + sc // 2) // sc * sc
    hi[:] = vh.astype(np.float32)
    lo[:] = (xs.astype(np.int64) - vh).astype(np.float32)

    def body(a, b):
        for _ in range(iters):
            a, b = df_modmul_exact(a, b, t)
        return a, b

    f = jax.jit(body)
    oh, ol = f(hi.reshape(-1, 128), lo.reshape(-1, 128))
    got = (np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
           ).reshape(-1).astype(np.int64)
    wk = pow(t.w, iters, t.q)
    exp = (xs.astype(object) * wk % t.q).astype(np.int64)
    # Residue-exact with a lazy range (module docstring): value === exp
    # (mod q), value in (-2^23, q + 2^23).
    bad_res = (got - exp) % t.q != 0
    bad_rng = (got <= -(1 << 23)) | (got >= t.q + (1 << 23))
    return int((bad_res | bad_rng).sum()), n


def main():
    import jax
    import jax.numpy as jnp

    from hexl_tpu import nt
    from hexl_tpu.limb import (U64, add64, cond_sub64_half, const64,
                               mulhi64_approx6, mullo64, sub64, to_limbs)

    rng = np.random.default_rng(0)
    rows = []
    print(f"float-path A/B backend={jax.default_backend()} "
          f"(chain-differential, D2H barrier)", flush=True)

    q = int(nt.generate_primes(1, 44, True, ntt_size=1 << 14)[0])
    w = 0x123456789ABCD % q
    t = Tables(q, w)

    # Correctness of the full exact path first (single call + a 16-deep
    # chain so the fed-back lazy ranges are exercised).
    bad, n = validate_exact(t)
    bad16, _ = validate_exact(t, n=1 << 18, seed=7, iters=16)
    print(f"df_modmul_exact vs int ground truth (q={q}): {bad}/{n} "
          f"mismatches single, {bad16}/{1 << 18} chained x16", flush=True)
    rows.append({"name": "df_exact_mismatches", "value": bad + bad16,
                 "of": n + (1 << 18)})

    # --- integer incumbent: lean approx Shoup chain -------------------
    wp_int = (w << 64) // q
    q64, two_q = const64(q), const64(2 * q)
    w64, wp64 = const64(w), const64(wp_int)
    xu = to_limbs(rng.integers(0, q, size=NELEM, dtype=np.uint64))
    xu = U64(xu.hi.reshape(-1, 128), xu.lo.reshape(-1, 128))

    def int_step(x):
        for _ in range(4):
            q_hat = mulhi64_approx6(x, wp64)
            r = sub64(mullo64(x, w64), mullo64(q_hat, q64))
            r = cond_sub64_half(r, add64(two_q, two_q))
            x = cond_sub64_half(r, two_q)
        return x
    r_int = chain_rate(int_step, xu, NELEM * 4)
    print(f"int lean shoup chain     {r_int/1e9:9.2f} Gmodmul/s", flush=True)
    rows.append({"name": "int_shoup", "rate_e9": round(r_int / 1e9, 2)})

    # --- float-path chains --------------------------------------------
    xs = rng.integers(0, q, size=NELEM, dtype=np.uint64)
    sc = 1 << 23
    vh = (xs.astype(np.int64) + sc // 2) // sc * sc
    fh = jnp.asarray(vh.astype(np.float32)).reshape(-1, 128)
    fl = jnp.asarray((xs.astype(np.int64) - vh).astype(np.float32)
                     ).reshape(-1, 128)

    def skel_step(xy):
        a, b = xy
        for _ in range(4):
            a, b = df_modmul_skeleton(a, b, t)
        return (a, b)
    r_skel = chain_rate(skel_step, (fh, fl), NELEM * 4)
    print(f"df skeleton chain        {r_skel/1e9:9.2f} Gmodmul/s "
          f"(UPPER bound on any float path)", flush=True)
    rows.append({"name": "df_skeleton", "rate_e9": round(r_skel / 1e9, 2)})

    def exact_step(xy):
        a, b = xy
        for _ in range(4):
            a, b = df_modmul_exact(a, b, t)
        return (a, b)
    r_ex = chain_rate(exact_step, (fh, fl), NELEM * 4)
    print(f"df exact chain           {r_ex/1e9:9.2f} Gmodmul/s", flush=True)
    rows.append({"name": "df_exact", "rate_e9": round(r_ex / 1e9, 2)})

    verdict = (
        f"int/skeleton = {r_int/r_skel:.2f}x, int/exact = "
        f"{r_int/r_ex:.2f}x. The skeleton (a strict lower bound on the "
        f"work of ANY correct float-path modmul here) "
        f"{'already loses to' if r_skel < r_int else 'beats'} the "
        f"integer incumbent; with no hardware FMA contraction "
        f"(vpu_probe_results.json) the reference's float lane has no "
        f"TPU analogue that can win.")
    print(verdict, flush=True)

    out = {"protocol": "chain-differential, D2H fetch barrier",
           "backend": jax.default_backend(), "q_bits": q.bit_length(),
           "rows": rows, "verdict": verdict}
    (pathlib.Path(__file__).parent / "float_path_results.json"
     ).write_text(json.dumps(out, indent=1))
    print("wrote benchmarks/float_path_results.json")


if __name__ == "__main__":
    main()
